"""Import PyTorch reference UNet weights into the flax UNet param tree.

Maps the reference's lucidrains-style UNet state dict
(/root/reference/diffusion_prior/gaussian_diffusion.py:363-490) onto
models/unet.py's flax tree, enabling (a) numerical parity tests on identical
weights and (b) migration of reference diffusion checkpoints.

Name correspondence (torch -> flax):
    init_conv                     -> Conv_0
    time_mlp.1 / time_mlp.3       -> Dense_0 / Dense_1
    downs.{i}.0 / .1              -> down_{i}_res1 / down_{i}_res2
    downs.{i}.2 (Residual(PreNorm(LinearAttention)))
        .fn.norm.g                -> PreNormResidual_{i}/ChannelLayerNorm_0/g
        .fn.fn.to_qkv / to_out.0  -> LinearAttention_{i}/Conv_0 / Conv_1
        .fn.fn.to_out.1.g         -> LinearAttention_{i}/ChannelLayerNorm_0/g
    downs.{i}.3 Downsample .1     -> Downsample_{i}/Conv_0  (last level: plain
                                     conv -> top-level Conv_1)
    mid_block1 / mid_block2       -> mid_res1 / mid_res2
    mid_attn                      -> PreNormResidual_{D} + Attention_0
    ups.{i}.*                     -> up_{i}_* (PreNormResidual_{D+1+i},
                                     LinearAttention_{D+i}, Upsample_{i},
                                     last level: plain conv -> Conv_2)
    final_res_block / final_conv  -> final_res / Conv_3

ResnetBlock internals: mlp.1 -> Dense_0; block{1,2}.proj ->
Block_{0,1}/WeightStandardizedConv_0; block{1,2}.norm -> Block_{0,1}/
GroupNorm_0; res_conv -> Conv_0. Conv OIHW -> HWIO; Linear [out,in] ->
kernel [in,out].

The reference's space-to-depth Downsample uses the same (c, p1, p2) channel
order as ours, so no channel permutation is needed.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      np.float32)


def _conv(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _dense(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"])}


def _groupnorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _resblock(sd: Mapping, prefix: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "Dense_0": _dense(sd, f"{prefix}.mlp.1"),
        "Block_0": {
            "WeightStandardizedConv_0": _conv(sd, f"{prefix}.block1.proj"),
            "GroupNorm_0": _groupnorm(sd, f"{prefix}.block1.norm"),
        },
        "Block_1": {
            "WeightStandardizedConv_0": _conv(sd, f"{prefix}.block2.proj"),
            "GroupNorm_0": _groupnorm(sd, f"{prefix}.block2.norm"),
        },
    }
    if f"{prefix}.res_conv.weight" in sd:
        out["Conv_0"] = _conv(sd, f"{prefix}.res_conv")
    return out


def _attention(sd: Mapping, prefix: str, with_out_norm: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "Conv_0": _conv(sd, f"{prefix}.to_qkv", bias=False),
    }
    if with_out_norm:  # LinearAttention: to_out = Sequential(Conv, LayerNorm)
        out["Conv_1"] = _conv(sd, f"{prefix}.to_out.0")
        out["ChannelLayerNorm_0"] = {"g": _t(sd[f"{prefix}.to_out.1.g"]).reshape(-1)}
    else:  # full Attention: to_out is a plain conv
        out["Conv_1"] = _conv(sd, f"{prefix}.to_out")
    return out


def import_unet_state_dict(sd: Mapping, n_levels: int) -> Dict[str, Any]:
    """torch Unet.state_dict() -> flax params tree. `n_levels` =
    len(dim_mults)."""
    p: Dict[str, Any] = {}
    p["Conv_0"] = _conv(sd, "init_conv")
    if "time_mlp.0.weights" in sd:
        # learned/random-Fourier time embedding
        # (RandomOrLearnedSinusoidalPosEmb, gaussian_diffusion.py:240-255);
        # the plain SinusoidalPosEmb variant is parameter-free.
        p["RandomOrLearnedSinusoidalPosEmb_0"] = {
            "weights": _t(sd["time_mlp.0.weights"])
        }
    p["Dense_0"] = _dense(sd, "time_mlp.1")
    p["Dense_1"] = _dense(sd, "time_mlp.3")

    extra_conv_idx = 1  # top-level Conv_N counter after the init conv
    for i in range(n_levels):
        p[f"down_{i}_res1"] = _resblock(sd, f"downs.{i}.0")
        p[f"down_{i}_res2"] = _resblock(sd, f"downs.{i}.1")
        p[f"PreNormResidual_{i}"] = {
            "ChannelLayerNorm_0": {"g": _t(sd[f"downs.{i}.2.fn.norm.g"]).reshape(-1)}
        }
        p[f"LinearAttention_{i}"] = _attention(sd, f"downs.{i}.2.fn.fn", True)
        if f"downs.{i}.3.1.weight" in sd:  # Downsample(space2depth + conv)
            p[f"Downsample_{i}"] = {"Conv_0": _conv(sd, f"downs.{i}.3.1")}
        else:  # last level: plain conv
            p[f"Conv_{extra_conv_idx}"] = _conv(sd, f"downs.{i}.3")
            extra_conv_idx += 1

    p["mid_res1"] = _resblock(sd, "mid_block1")
    p[f"PreNormResidual_{n_levels}"] = {
        "ChannelLayerNorm_0": {"g": _t(sd["mid_attn.fn.norm.g"]).reshape(-1)}
    }
    p["Attention_0"] = _attention(sd, "mid_attn.fn.fn", False)
    p["mid_res2"] = _resblock(sd, "mid_block2")

    for i in range(n_levels):
        p[f"up_{i}_res1"] = _resblock(sd, f"ups.{i}.0")
        p[f"up_{i}_res2"] = _resblock(sd, f"ups.{i}.1")
        p[f"PreNormResidual_{n_levels + 1 + i}"] = {
            "ChannelLayerNorm_0": {"g": _t(sd[f"ups.{i}.2.fn.norm.g"]).reshape(-1)}
        }
        p[f"LinearAttention_{n_levels + i}"] = _attention(sd, f"ups.{i}.2.fn.fn", True)
        if f"ups.{i}.3.1.weight" in sd:  # Upsample(nearest + conv)
            p[f"Upsample_{i}"] = {"Conv_0": _conv(sd, f"ups.{i}.3.1")}
        else:
            p[f"Conv_{extra_conv_idx}"] = _conv(sd, f"ups.{i}.3")
            extra_conv_idx += 1

    p["final_res"] = _resblock(sd, "final_res_block")
    p[f"Conv_{extra_conv_idx}"] = _conv(sd, "final_conv")
    return p
