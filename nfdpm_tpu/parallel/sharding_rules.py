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


def glow_param_specs(params: Any) -> Any:
    """PyTree of PartitionSpec matching the glow params tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [_spec_for(path) for path, _ in flat]
    )


def shard_glow_params(mesh: Mesh, params: Any) -> Any:
    """device_put the flow params with tensor-parallel shardings."""
    specs = glow_param_specs(params)
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


def unet_param_specs(params: Any) -> Any:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [_unet_spec_for(path) for path, _ in flat]
    )


def shard_unet_params(mesh: Mesh, params: Any) -> Any:
    specs = unet_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
