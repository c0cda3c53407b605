"""Tensor-parallel sharding rules for model params.

Greenfield capability (the reference is single-device, SURVEY.md §2.9b).
The Glow coupling CNN's hidden width (512 by default) is the natural
tensor-parallel dimension: Megatron-style column-parallel first conv /
row-parallel second conv over the mesh "model" axis, expressed as
NamedShardings on the PARAM tree — XLA GSPMD then derives activation
shardings and inserts the psum/all-gather collectives over ICI (no manual
collectives; scaling-book recipe: annotate params, let the compiler place
comms).

  conv1 w [.., Cin, W]   -> shard W   (column-parallel)
  an1 scale/bias [W]     -> shard W
  conv2 w [.., W, W]     -> shard in-W (row-parallel)
  zconv w [.., W, Cout]  -> shard in-W (row-parallel)
  everything else        -> replicated

Stacked step params (leading K axis from the scan stacking) get the same
spec shifted right by one axis.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# FSDP leaves smaller than this many elements stay replicated: all-gathering
# a few-KB actnorm vector costs more latency than the memory it saves.
FSDP_MIN_SIZE = 2 ** 15


def _add_fsdp(spec: P, shape, n_data: int, min_size: int = FSDP_MIN_SIZE) -> P:
    """Augment a (possibly tensor-parallel) PartitionSpec with a ZeRO-style
    "data"-axis shard on the largest still-unsharded, divisible dimension.

    XLA GSPMD then all-gathers the leaf just-in-time for its op and
    reduce-scatters its gradient — the scaling-book FSDP recipe (annotate
    params over the data axis, let the compiler place the collectives).
    Leaves with no divisible axis, or smaller than `min_size` elements,
    stay as-is (replicated): the memory win is negligible and the gather
    latency is not.
    """
    size = 1
    for d in shape:
        size *= d
    if n_data <= 1 or size < min_size:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best = None
    for i, d in enumerate(shape):
        if entries[i] is not None:
            continue
        if d % n_data == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return spec
    entries[best] = "data"
    while entries and entries[-1] is None:
        entries.pop()
    return P(*entries)


def _spec_for(path) -> P:
    names = [getattr(p, "key", None) or getattr(p, "name", "") for p in path]
    stacked = "steps" in names or "final_steps" in names
    pre = (None,) if stacked else ()

    def spec(*axes):
        return P(*pre, *axes)

    if "conv1" in names and names[-1] == "w":
        return spec(None, None, None, "model")
    if names[-1] in ("scale", "bias") and "an1" in names:
        return spec("model")
    if "conv2" in names and names[-1] == "w":
        return spec(None, None, "model", None)
    if "zconv" in names and names[-1] == "w" and "net" in names:
        return spec(None, None, "model", None)
    return P()


def glow_param_specs(params: Any, *, fsdp_data: int = 1,
                     fsdp_min_size: int = FSDP_MIN_SIZE) -> Any:
    """PyTree of PartitionSpec matching the glow params tree.

    With `fsdp_data` > 1, every spec additionally shards its largest free
    axis over the mesh "data" axis (ZeRO-style parameter + optimizer-state
    partitioning; composes with the "model"-axis tensor parallelism)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef,
        [_add_fsdp(_spec_for(path), leaf.shape, fsdp_data, fsdp_min_size)
         for path, leaf in flat],
    )


def shard_glow_params(mesh: Mesh, params: Any, *, fsdp: bool = False) -> Any:
    """device_put the flow params with tensor-parallel (and, with
    `fsdp=True`, data-axis ZeRO) shardings."""
    specs = glow_param_specs(
        params, fsdp_data=mesh.shape["data"] if fsdp else 1)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


# ---------------------------------------------------------------------------
# UNet tensor parallelism
# ---------------------------------------------------------------------------

def _unet_spec_for(path) -> P:
    """Megatron-style TP for the DDPM UNet's ResnetBlocks and attention:

      Block_0 WSConv kernel [kh,kw,Cin,F] -> shard F (column-parallel); its
        bias / the following GroupNorm scale+bias shard F too (GroupNorm
        group statistics stay shard-local when groups %% n_model == 0).
      Block_1 WSConv kernel -> shard Cin (row-parallel, output replicated).
      attention qkv conv -> shard heads*dh (column); out conv -> shard in.
      everything else (time MLP, skip convs, up/down convs) replicated.
    """
    names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    joined = "/".join(names)

    def inblock(block_name):
        return any(n == block_name for n in names)

    if inblock("Block_0") and names[-1] == "kernel":
        return P(None, None, None, "model")
    if inblock("Block_0") and names[-1] == "bias":
        return P("model")
    if inblock("Block_0") and ("GroupNorm_0" in joined) and names[-1] in ("scale", "bias"):
        return P("model")
    if inblock("Block_1") and names[-1] == "kernel" and "WeightStandardizedConv_0" in joined:
        return P(None, None, "model", None)
    # attention: qkv projection (first biasless conv) column-parallel,
    # output projection row-parallel
    if "LinearAttention_0" in names or "Attention_0" in names:
        if names[-1] == "kernel" and "Conv_0" in names:
            return P(None, None, None, "model")
        if names[-1] == "kernel" and "Conv_1" in names:
            return P(None, None, "model", None)
    return P()


def unet_param_specs(params: Any, *, fsdp_data: int = 1,
                     fsdp_min_size: int = FSDP_MIN_SIZE) -> Any:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef,
        [_add_fsdp(_unet_spec_for(path), leaf.shape, fsdp_data, fsdp_min_size)
         for path, leaf in flat],
    )


def shard_unet_params(mesh: Mesh, params: Any, *, fsdp: bool = False) -> Any:
    specs = unet_param_specs(
        params, fsdp_data=mesh.shape["data"] if fsdp else 1)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def generic_param_specs(params: Any, *, fsdp_data: int = 1,
                        fsdp_min_size: int = FSDP_MIN_SIZE) -> Any:
    """Replicated-by-default specs with optional data-axis FSDP — for param
    trees with no tensor-parallel rules (Gaussian priors etc.)."""
    return jax.tree.map(
        lambda x: _add_fsdp(P(), x.shape, fsdp_data, fsdp_min_size), params)


# ---------------------------------------------------------------------------
# Optimizer-state sharding (FSDP = params + Adam moments partitioned)
# ---------------------------------------------------------------------------

def shard_opt_state(mesh: Mesh, tx, opt_state: Any, param_specs: Any) -> Any:
    """Re-place an optimizer state so every leaf that mirrors a param (Adam
    mu/nu, etc.) gets that param's sharding; scalar bookkeeping leaves
    (step counts) are replicated.

    Works on live states (restored checkpoints included) — unlike re-running
    `tx.init`, which would zero the moments.

    Masked optimizers (the non-trainable PLU sign/perm leaves) leave
    `optax.MaskedNode` placeholders where a param would be; those must be
    treated as leaves (else `flatten_up_to` rejects the shardings tree) and
    passed through unplaced."""
    import optax

    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs)
    replicated = NamedSharding(mesh, P())
    is_masked = lambda x: isinstance(x, optax.MaskedNode)  # noqa: E731
    return optax.tree_map_params(
        tx,
        lambda leaf, sh: leaf if is_masked(leaf) else jax.device_put(leaf, sh),
        opt_state,
        shardings,
        transform_non_params=lambda leaf: jax.device_put(leaf, replicated),
        is_leaf=is_masked,
    )
