"""Glow: multi-scale normalizing flow, assembled TPU-first.

Re-design of the reference architecture
(/root/reference/normalizing_flow/glow.py:12-246):

    StepFlow  = ActNorm -> PLU 1x1 conv -> AffineCoupling
    GlowBlock = Squeeze -> K x StepFlow -> Split       (L-1 blocks)
    Glow      = blocks -> final Squeeze -> K x StepFlow

TPU-native choices:
  * The K step-flows of a block share parameter shapes, so their params are
    stacked along a leading axis and the block body is ONE `lax.scan` — the
    whole flow compiles to L scans instead of L*K inlined step graphs
    (fast compile, identical math). Inversion is the same scan with
    `reverse=True`.
  * NHWC layout throughout; channel schedule 2^i*C per block and final
    channels 2^(L+1)*C (glow.py:163-169).
  * Data-dependent actnorm init is an explicit functional pass
    (`ddinit`) over one batch — including the actnorms inside every
    coupling CNN — replacing the reference's lazy in-forward init.
  * `invert` threads an explicit PRNG key; per-level splits that must sample
    their latent fold the key per block (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import bijectors as bj

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class GlowConfig:
    in_channels: int = 3
    levels: int = 3           # L: number of blocks incl. the final stack
    steps: int = 4            # K: step-flows per block
    coupling_width: int = 512
    learn_prior: bool = True  # learned (mean, log_sd) for split priors
    coupling_dtype: str = "float32"  # "bfloat16": 2x MXU throughput for the
    # coupling CNN; invertibility stays exact (both directions evaluate the
    # same function) and logdet math stays fp32 — only the learned coupling
    # function changes slightly. Parity runs use float32.
    scan_unroll: int = 1  # lax.scan unroll factor for the K-step stacks:
    # unrolling lets XLA fuse across steps (~12% fwd speedup at K=4 on v5e)
    # at the cost of compile time; 1 = compile-friendly default.
    use_pallas: bool = False  # route the step's channel mix + coupling tail
    # through the Pallas TPU kernels (ops/pallas/) instead of plain XLA —
    # numerically identical (fp32 accumulate), selectable for benchmarking;
    # see BENCH.md for measured deltas. Forward/likelihood path only.
    invconv_param: str = "plu"  # "plu" (TPU default: logdet = sum(log_s),
    # inverse = triangular solves) or "full" (the reference's exact trainable
    # [C, C] matrix — needed for Adam-trajectory parity with the reference,
    # since Adam is not invariant to the PLU reparameterization).
    remat: bool = False  # jax.checkpoint each step-flow: recompute coupling
    # activations in the backward pass instead of storing K*L of them —
    # trades ~33% more FLOPs for O(K*L) less activation memory (needed for
    # CelebA-128 L5 K16 scale, SURVEY.md §6 workload envelopes).

    @property
    def _coupling_jnp_dtype(self):
        return jnp.bfloat16 if self.coupling_dtype == "bfloat16" else jnp.float32


# ---------------------------------------------------------------------------
# Shapes
# ---------------------------------------------------------------------------

def latent_shapes_nhwc(cfg: GlowConfig, size: int) -> List[Tuple[int, int, int]]:
    """Per-part latent shapes as (H, W, C), NHWC.

    Mirrors `calculate_output_shapes` (/root/reference/normalizing_flow/utils.py:93-117)
    which returns CHW; e.g. L=3, C=3, 32 -> [(16,16,6), (8,8,12), (4,4,48)].
    """
    shapes = []
    c, s = cfg.in_channels, size
    for _ in range(cfg.levels - 1):
        if s % 2 != 0:
            raise ValueError("The input dimension is not divisible by 2!")
        c *= 2
        s //= 2
        shapes.append((s, s, c))
    shapes.append((s // 2, s // 2, c * 4))
    return shapes


def latent_shapes_chw(cfg: GlowConfig, size: int) -> List[Tuple[int, int, int]]:
    """Reference-layout (C, H, W) shapes, for parity tests and formaters."""
    return [(c, h, w) for (h, w, c) in latent_shapes_nhwc(cfg, size)]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _stack_steps(rng, k: int, channels: int, width: int,
                 invconv_param: str = "plu") -> Params:
    """Init K steps and stack their params on the leading axis.  Entirely
    host-side numpy: one bulk device transfer happens on the first jit call
    (per-leaf device init over a tunneled TPU costs seconds per op)."""
    import numpy as np

    steps = [bj.init_step(rng, channels, width, invconv_param) for _ in range(k)]
    return jax.tree.map(lambda *xs: np.stack(xs), *steps)


def init_glow(key: jax.Array, cfg: GlowConfig) -> Params:
    """Parameter PyTree:
       {"blocks": (L-1 dicts {"steps": stacked, "split": split}),
        "final_steps": stacked}
    """
    rng = bj.as_host_rng(key)  # ONE device->host conversion for the whole build
    blocks = []
    for i in range(cfg.levels - 1):
        flow_channels = 4 * (2 ** i) * cfg.in_channels
        blocks.append({
            "steps": _stack_steps(rng, cfg.steps, flow_channels,
                                  cfg.coupling_width, cfg.invconv_param),
            "split": bj.init_split(flow_channels, cfg.learn_prior),
        })
    final_channels = (2 ** (cfg.levels + 1)) * cfg.in_channels
    final_steps = _stack_steps(rng, cfg.steps, final_channels,
                               cfg.coupling_width, cfg.invconv_param)
    return {"blocks": tuple(blocks), "final_steps": final_steps}


# ---------------------------------------------------------------------------
# Scanned step stacks
# ---------------------------------------------------------------------------

def _scan_steps_forward(stacked: Params, x: jax.Array, ldj: jax.Array,
                        dtype=jnp.float32, remat: bool = False,
                        unroll: int = 1, use_pallas: bool = False):
    def body(carry, sp):
        h, acc = carry
        y, acc = bj.step_forward(sp, h, acc, dtype, use_pallas)
        return (y, acc), None

    if remat:
        # dots_saveable: keep matmul/conv outputs, recompute elementwise in
        # the backward pass — ~6% faster than full remat at CelebA scale
        # (measured on v5e) with per-step-bounded activation memory.
        body = jax.checkpoint(body, policy=jax.checkpoint_policies.dots_saveable)
    (y, ldj), _ = jax.lax.scan(body, (x, ldj), stacked, unroll=unroll)
    return y, ldj


def _scan_steps_inverse(stacked: Params, y: jax.Array, dtype=jnp.float32,
                        unroll: int = 1, use_pallas: bool = False) -> jax.Array:
    def body(h, sp):
        return bj.step_inverse(sp, h, dtype, use_pallas), None

    x, _ = jax.lax.scan(body, y, stacked, reverse=True, unroll=unroll)
    return x


def _scan_steps_ddinit(stacked: Params, x: jax.Array):
    def body(h, sp):
        new_sp, y = bj.step_ddinit(sp, h)
        return y, new_sp

    y, new_stacked = jax.lax.scan(body, x, stacked)
    return new_stacked, y


# ---------------------------------------------------------------------------
# Forward / inverse / ddinit
# ---------------------------------------------------------------------------

def forward(
    params: Params,
    cfg: GlowConfig,
    x: jax.Array,
    ldj: Optional[jax.Array] = None,
    logp: Optional[jax.Array] = None,
    with_logp: bool = True,
) -> Tuple[List[jax.Array], jax.Array, Optional[jax.Array]]:
    """Full forward transform (glow.py:172-201).

    Args:
      x: [B, H, W, C] preprocessed (+dequantized) images.
      ldj / logp: optional [B] fp32 accumulators (zeros if None).
      with_logp: False skips split-prior log-probs (NFBackbone semantics,
        /root/reference/normalizing_flow/__init__.py:70-82).

    Returns: (latent parts [z_1..z_{L-1}, y_final], ldj, logp-or-None).
    """
    b = x.shape[0]
    if ldj is None:
        ldj = jnp.zeros((b,), jnp.float32)
    if logp is None and with_logp:
        logp = jnp.zeros((b,), jnp.float32)
    if not with_logp:
        logp = None

    dtype = cfg._coupling_jnp_dtype
    latents: List[jax.Array] = []
    y = x
    for block in params["blocks"]:
        y = bj.squeeze_forward(y)
        y, ldj = _scan_steps_forward(block["steps"], y, ldj, dtype, cfg.remat,
                                     cfg.scan_unroll, cfg.use_pallas)
        y, ldj, z, logp = bj.split_forward(block["split"], y, ldj, logp)
        latents.append(z)

    y = bj.squeeze_forward(y)
    y, ldj = _scan_steps_forward(params["final_steps"], y, ldj, dtype, cfg.remat,
                                 cfg.scan_unroll, cfg.use_pallas)
    latents.append(y)
    return latents, ldj, logp


def inverse(
    params: Params,
    cfg: GlowConfig,
    latents: Sequence[jax.Array],
    key: Optional[jax.Array] = None,
    temperature: float = 1.0,
) -> jax.Array:
    """Exact inverse (glow.py:203-228). `latents` may contain only the final
    part — missing per-level parts are sampled from the learned split priors
    at `temperature`, consuming `key` (required in that case)."""
    dtype = cfg._coupling_jnp_dtype
    y = latents[-1]
    y = _scan_steps_inverse(params["final_steps"], y, dtype, cfg.scan_unroll,
                            cfg.use_pallas)
    y = bj.squeeze_inverse(y)

    for i, block in enumerate(reversed(params["blocks"])):
        idx = -(i + 2)
        z = latents[idx] if len(latents) >= -idx else None
        subkey = None
        if z is None:
            if key is None:
                raise ValueError("PRNG key required to sample missing latent parts")
            subkey = jax.random.fold_in(key, i)
        y = bj.split_inverse(block["split"], y, z, subkey, temperature)
        y = _scan_steps_inverse(block["steps"], y, dtype, cfg.scan_unroll,
                                cfg.use_pallas)
        y = bj.squeeze_inverse(y)
    return y


def ddinit(params: Params, cfg: GlowConfig, x: jax.Array) -> Params:
    """One-batch data-dependent initialization of every actnorm in the flow
    (replaces /root/reference/normalizing_flow/utils.py:275-292)."""
    new_blocks = []
    y = x
    for block in params["blocks"]:
        y = bj.squeeze_forward(y)
        new_steps, y = _scan_steps_ddinit(block["steps"], y)
        new_blocks.append({"steps": new_steps, "split": block["split"]})
        y, _, _, _ = bj.split_forward(block["split"], y, jnp.zeros((x.shape[0],), jnp.float32), None)

    y = bj.squeeze_forward(y)
    new_final, _ = _scan_steps_ddinit(params["final_steps"], y)
    return {"blocks": tuple(new_blocks), "final_steps": new_final}
