"""Import PyTorch reference Glow weights into nfdpm_tpu param trees.

The rebuild's PLU 1x1 conv, NHWC layout, and folded GaussianPrior are
parameterized differently from the reference
(/root/reference/normalizing_flow/*); this module maps a reference
`Glow.state_dict()` + `GaussianPrior.state_dict()` into our trees so that

  * reference training checkpoints can be resumed/evaluated here, and
  * numerical parity (bits/dim within 1e-3, SURVEY.md §6) is testable
    layer-by-layer on identical weights.

Key layout conversions:
  torch conv OIHW -> HWIO;  actnorm [C,1,1] -> [C];  ZeroConv2d logs
  [1,C,1,1] -> [C];  InvConv2d full W [C,C,1,1] -> PLU decomposition
  (ops.bijectors.plu_from_weight);  GaussianPrior ZeroConv2d(bias, logs) ->
  folded per-channel (bias, logs) vectors (models/prior.py docstring).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..ops.bijectors import plu_from_weight


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      np.float32)


def _conv_oihw_to_hwio(w) -> np.ndarray:
    return _t(w).transpose(2, 3, 1, 0)


def _actnorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _t(sd[f"{prefix}.scale"]).reshape(-1),
        "bias": _t(sd[f"{prefix}.bias"]).reshape(-1),
    }


def _zeroconv(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "w": _conv_oihw_to_hwio(sd[f"{prefix}.weight"]),
        "b": _t(sd[f"{prefix}.bias"]).reshape(-1),
        "logs": _t(sd[f"{prefix}.logs"]).reshape(-1),
    }


def _coupling_net(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """The reference coupling net is nn.Sequential(Conv2dActNorm, ReLU,
    Conv2dActNorm, ReLU, ZeroConv2d) with name-mangled private attrs
    (normalizing_flow/utils.py:47-90)."""
    def can(idx):
        conv = f"{prefix}.{idx}._Conv2dActNorm__conv"
        an = f"{prefix}.{idx}._Conv2dActNorm__actnorm"
        return (
            {"w": _conv_oihw_to_hwio(sd[f"{conv}.weight"])},
            _actnorm(sd, an),
        )

    conv1, an1 = can(0)
    conv2, an2 = can(2)
    return {
        "conv1": conv1, "an1": an1,
        "conv2": conv2, "an2": an2,
        "zconv": _zeroconv(sd, f"{prefix}.4"),
    }


def _step(sd: Mapping, prefix: str, invconv_param: str = "plu") -> Dict[str, Any]:
    w = _t(sd[f"{prefix}.invconv2d.weight"])[:, :, 0, 0]
    invconv = {"weight": w} if invconv_param == "full" else plu_from_weight(w)
    return {
        "actnorm": _actnorm(sd, f"{prefix}.actnorm"),
        "invconv": invconv,
        "coupling": {"net": _coupling_net(sd, f"{prefix}.affcoupling.net")},
    }


def import_glow_state_dict(sd: Mapping, levels: int, steps: int,
                           invconv_param: str = "plu") -> Dict[str, Any]:
    """reference Glow.state_dict() -> nfdpm_tpu glow params tree.

    `invconv_param="full"` keeps the reference's [C, C] 1x1-conv weight as-is
    (GlowConfig.invconv_param="full") — required when the imported model will
    be TRAINED and the optimizer trajectory must match the reference (Adam is
    not reparameterization-invariant); "plu" (default) decomposes for the
    TPU-fast inference/likelihood path."""
    import jax
    import numpy as np

    blocks = []
    for b in range(levels - 1):
        step_list = [_step(sd, f"blocks.{b}.flows.{k}", invconv_param)
                     for k in range(steps)]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *step_list)
        split_prefix = f"blocks.{b}.split.conv"
        split = {"conv": _zeroconv(sd, split_prefix)} \
            if f"{split_prefix}.weight" in sd else {"conv": None}
        blocks.append({"steps": stacked, "split": split})
    final_list = [_step(sd, f"final_flows.{k}", invconv_param)
                  for k in range(steps)]
    final = jax.tree.map(lambda *xs: np.stack(xs), *final_list)
    return {"blocks": tuple(blocks), "final_steps": final}


def import_gaussian_prior_state_dict(sd: Mapping) -> Dict[str, np.ndarray]:
    """reference GaussianPrior.state_dict() -> folded (bias, logs) params.

    The reference conv runs on an all-zeros input, so only its bias and
    output log-scale matter (prior.py:79-83; see models/prior.py). The conv
    WEIGHT is asserted ~zero to guarantee the fold is exact."""
    conv_key = [k for k in sd if k.endswith("conv.weight")]
    if conv_key:
        w = _t(sd[conv_key[0]])
        assert np.abs(w).max() < 1e-12, (
            "reference GaussianPrior conv weight is nonzero; the folded "
            "parameterization would diverge"
        )
    bias = [k for k in sd if k.endswith("conv.bias")]
    logs = [k for k in sd if k.endswith("conv.logs")]
    return {
        "bias": _t(sd[bias[0]]).reshape(-1),
        "logs": _t(sd[logs[0]]).reshape(-1),
    }
