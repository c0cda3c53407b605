"""Pipeline parallelism for the Glow train step: K flow steps over stages.

Greenfield capability (the reference is single-GPU throughout,
/root/reference/normalizing_flow/trainer.py). This completes the
parallelism taxonomy next to DP (batch), TP (coupling width), FSDP
(optimizer state), SP (spatial/image height), and EP (diffusion parts):
the "model" mesh axis becomes a PIPELINE axis — stage s holds steps
[s*K/S, (s+1)*K/S) of every level's K-step stack, so per-device flow
parameter + optimizer memory scales 1/S without any FSDP gather traffic,
and each stage's compute is a dense local scan on full-width couplings
(unlike TP, which narrows every conv to width/S and pads the MXU at small
widths — BENCH.md's CelebA floor analysis).

Schedule: GPipe over M microbatches inside ONE `jax.shard_map` region.
Every tick each stage runs its local K/S-step scan, then the activation
(+ the running logdet) `ppermute`s one stage forward along the ICI ring;
stage 0 ingests microbatch t at tick t, stage S-1 retires microbatch
t-(S-1). The bubble fraction is (S-1)/(M+S-1); raise
`parallel.pipeline_microbatches` to amortize it. Levels are pipeline
flushes: Glow's squeeze/split change activation shapes between levels, so
each level's K steps pipeline independently and the (cheap, elementwise)
squeeze/split boundary runs replicated on all stages.

The math is IDENTICAL to the plain scanned forward — the same
`bijectors.step_forward` sequence per sample, only device placement and
batch slicing change (tests/test_pipeline.py asserts equality). Like
spatial partitioning, this is a train-step lever: eval/sampling paths run
the plain forward (K-axis-sharded params gather under GSPMD).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import glow as glow_m
from ..ops import bijectors as bj

Params = Any


def glow_pp_param_specs(flow_params: Params) -> Params:
    """PartitionSpecs placing every K-step stack's LEADING (step) axis on
    "model" and everything else (splits) replicated. The same tree feeds
    `jax.device_put` (via shard_nf_state) and `shard_map` in_specs."""

    def steps_specs(stacked):
        return jax.tree.map(lambda _: P("model"), stacked)

    return {
        "blocks": tuple(
            {"steps": steps_specs(b["steps"]),
             "split": jax.tree.map(lambda _: P(), b["split"])}
            for b in flow_params["blocks"]
        ),
        "final_steps": steps_specs(flow_params["final_steps"]),
    }


def check_pipeline_config(cfg: glow_m.GlowConfig, n_stages: int,
                          microbatches: int, local_batch: int) -> None:
    """Static divisibility guards, raised at step-build time with actionable
    messages instead of an XLA shape error mid-compile."""
    if cfg.steps % n_stages:
        raise ValueError(
            f"pipeline parallelism needs K ({cfg.steps}) divisible by the "
            f"model-axis size ({n_stages}) — each stage holds K/S steps")
    if microbatches < 1:
        raise ValueError(f"pipeline_microbatches must be >= 1, got {microbatches}")
    if local_batch % microbatches:
        raise ValueError(
            f"per-data-shard batch ({local_batch}) must be divisible by "
            f"pipeline_microbatches ({microbatches})")
    if cfg.use_pallas:
        raise ValueError("use_pallas kernels are not routed inside the "
                         "pipeline region — disable one of the two")


def _pp_level_scan(stacked_local: Params, y: jax.Array, ldj: jax.Array, *,
                   n_stages: int, microbatches: int, axis: str,
                   dtype, remat: bool, unroll: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Pipeline one level's K steps over the stage axis (shard_map-local).

    `stacked_local`: this stage's (K/S, ...) slice of the level's stacked
    step params. `y`/`ldj`: the full per-data-shard activation, identical
    on every stage. Returns the post-level activation + logdet, again
    replicated on every stage (the last stage's retire buffer is
    psum-broadcast — one collective per level, the pipeline flush)."""
    s = jax.lax.axis_index(axis)
    b = y.shape[0]
    mb = b // microbatches
    y_mb = y.reshape(microbatches, mb, *y.shape[1:])
    ldj_mb = ldj.reshape(microbatches, mb)

    def local_steps(act, acc):
        def body(carry, sp):
            h, a = carry
            h, a = bj.step_forward(sp, h, a, dtype, False)
            return (h, a), None

        if remat:
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.dots_saveable)
        (act, acc), _ = jax.lax.scan(body, (act, acc), stacked_local,
                                     unroll=unroll)
        return act, acc

    fwd = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        act, acc, out_y, out_l = carry
        # stage 0 ingests microbatch t (clamped re-reads are masked garbage)
        idx = jnp.clip(t, 0, microbatches - 1)
        act = jnp.where(s == 0,
                        jax.lax.dynamic_index_in_dim(y_mb, idx, keepdims=False),
                        act)
        acc = jnp.where(s == 0,
                        jax.lax.dynamic_index_in_dim(ldj_mb, idx,
                                                     keepdims=False),
                        acc)
        act, acc = local_steps(act, acc)
        # the last stage retires microbatch t-(S-1) into the output buffer
        w = t - (n_stages - 1)
        valid = (s == n_stages - 1) & (w >= 0)
        widx = jnp.clip(w, 0, microbatches - 1)
        out_y = jax.lax.dynamic_update_index_in_dim(
            out_y,
            jnp.where(valid, act,
                      jax.lax.dynamic_index_in_dim(out_y, widx,
                                                   keepdims=False)),
            widx, 0)
        out_l = jax.lax.dynamic_update_index_in_dim(
            out_l,
            jnp.where(valid, acc,
                      jax.lax.dynamic_index_in_dim(out_l, widx,
                                                   keepdims=False)),
            widx, 0)
        if fwd:  # hand to the next stage over the ICI ring
            act = jax.lax.ppermute(act, axis, fwd)
            acc = jax.lax.ppermute(acc, axis, fwd)
        return (act, acc, out_y, out_l), None

    init = (y_mb[0], ldj_mb[0], jnp.zeros_like(y_mb), jnp.zeros_like(ldj_mb))
    ticks = jnp.arange(microbatches + n_stages - 1)
    (_, _, out_y, out_l), _ = jax.lax.scan(tick, init, ticks)

    # pipeline flush: only the last stage's buffers are real; broadcast
    mask = (s == n_stages - 1)
    out_y = jax.lax.psum(jnp.where(mask, out_y, 0), axis)
    out_l = jax.lax.psum(jnp.where(mask, out_l, 0), axis)
    return out_y.reshape(b, *y.shape[1:]), out_l.reshape(b)


def pp_forward(
    flow_params: Params,
    cfg: glow_m.GlowConfig,
    x: jax.Array,
    mesh: Mesh,
    microbatches: int,
    with_logp: bool = True,
) -> Tuple[List[jax.Array], jax.Array, Optional[jax.Array]]:
    """Drop-in replacement for models.glow.forward with the K-step stacks
    pipelined over the mesh's "model" axis (composes with "data" DP: each
    data shard runs its own pipeline instance over the same stages)."""
    n_stages = mesh.shape["model"]
    spec_tree = glow_pp_param_specs(flow_params)
    n_levels = cfg.levels

    def body(flow_local, x_local):
        b = x_local.shape[0]
        ldj = jnp.zeros((b,), jnp.float32)
        logp = jnp.zeros((b,), jnp.float32) if with_logp else None
        dtype = cfg._coupling_jnp_dtype
        level = functools.partial(
            _pp_level_scan, n_stages=n_stages, microbatches=microbatches,
            axis="model", dtype=dtype, remat=cfg.remat,
            unroll=cfg.scan_unroll)

        latents = []
        y = x_local
        for block in flow_local["blocks"]:
            y = bj.squeeze_forward(y)
            y, ldj = level(block["steps"], y, ldj)
            y, ldj, z, logp = bj.split_forward(block["split"], y, ldj, logp)
            latents.append(z)
        y = bj.squeeze_forward(y)
        y, ldj = level(flow_local["final_steps"], y, ldj)
        latents.append(y)
        if logp is None:
            logp = jnp.zeros((b,), jnp.float32)  # uniform out-tree for shard_map
        return tuple(latents), ldj, logp

    out_latents = tuple(P("data") for _ in range(n_levels))
    latents, ldj, logp = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_tree, P("data")),
        out_specs=(out_latents, P("data"), P("data")),
        check_vma=False,  # the manual psum-broadcast at each level flush
        # makes outputs stage-replicated in a way the checker can't prove
    )(flow_params, x)
    return list(latents), ldj, (logp if with_logp else None)


def shard_flow_params_pp(mesh: Mesh, flow_params: Params) -> Params:
    """Place a flow param tree under the pipeline layout (K axis over
    "model")."""
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        flow_params, glow_pp_param_specs(flow_params))
