"""Export nfdpm_tpu Glow weights as a PyTorch reference checkpoint.

The exact inverse of utils/reference_import.py: maps our param trees back
into the reference's `Glow.state_dict()` / `GaussianPrior.state_dict()` key
schema (/root/reference/normalizing_flow/transforms.py,
prior.py:102-115 `save_model`), so models TRAINED HERE can be loaded by the
unmodified reference code (`flow.load_state_dict(..., strict=True)`) —
handoff runs in both directions.

Layout conversions (inverse of reference_import.py):
  HWIO conv -> torch OIHW;  actnorm [C] -> [C,1,1];  ZeroConv2d logs
  [C] -> [1,C,1,1];  PLU factors -> reassembled full [C,C,1,1] 1x1-conv
  weight (ops.bijectors.invconv_weight — exact: P @ L @ U' in fp32);
  folded GaussianPrior (bias, logs) -> ZeroConv2d(weight=0, bias, logs)
  (exact because the reference conv runs on a zeros input,
  prior.py:79-83).

Every ActNorm's `is_initialized` buffer is exported as 1: exported weights
are trained, so the reference must NOT re-run its lazy data-dependent init
(transforms.py:74-78).

Returned dicts hold numpy arrays; callers (tools/export_reference_checkpoint
.py) convert to torch tensors at save time so this module stays
torch-free and unit-testable on CPU.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..ops.bijectors import invconv_weight


def _f32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _conv_hwio_to_oihw(w) -> np.ndarray:
    return _f32(w).transpose(3, 2, 0, 1)


def _actnorm_out(out: Dict[str, np.ndarray], prefix: str, an: Mapping) -> None:
    out[f"{prefix}.scale"] = _f32(an["scale"]).reshape(-1, 1, 1)
    out[f"{prefix}.bias"] = _f32(an["bias"]).reshape(-1, 1, 1)
    out[f"{prefix}.is_initialized"] = np.asarray(1, np.uint8)


def _zeroconv_out(out: Dict[str, np.ndarray], prefix: str, zc: Mapping) -> None:
    out[f"{prefix}.weight"] = _conv_hwio_to_oihw(zc["w"])
    out[f"{prefix}.bias"] = _f32(zc["b"]).reshape(-1)
    out[f"{prefix}.logs"] = _f32(zc["logs"]).reshape(1, -1, 1, 1)


def _step_out(out: Dict[str, np.ndarray], prefix: str, step: Mapping) -> None:
    _actnorm_out(out, f"{prefix}.actnorm", step["actnorm"])
    w = np.asarray(invconv_weight(step["invconv"]), np.float32)
    out[f"{prefix}.invconv2d.weight"] = w[:, :, None, None]
    net = step["coupling"]["net"]
    base = f"{prefix}.affcoupling.net"
    out[f"{base}.0._Conv2dActNorm__conv.weight"] = _conv_hwio_to_oihw(
        net["conv1"]["w"])
    _actnorm_out(out, f"{base}.0._Conv2dActNorm__actnorm", net["an1"])
    out[f"{base}.2._Conv2dActNorm__conv.weight"] = _conv_hwio_to_oihw(
        net["conv2"]["w"])
    _actnorm_out(out, f"{base}.2._Conv2dActNorm__actnorm", net["an2"])
    _zeroconv_out(out, f"{base}.4", net["zconv"])


def _unstack(stacked: Any, idx: int) -> Any:
    """Step `idx` of a K-stacked step tree (glow stacks steps on axis 0
    for the scan; reference_import.py stacks the same way)."""
    import jax

    return jax.tree.map(lambda a: np.asarray(a)[idx], stacked)


def export_glow_state_dict(params: Mapping, levels: int,
                           steps: int) -> Dict[str, np.ndarray]:
    """nfdpm_tpu glow params tree -> reference Glow.state_dict() mapping
    (numpy values; key-exact and shape-exact against the reference modules,
    tests/test_reference_export.py loads it with strict=True)."""
    out: Dict[str, np.ndarray] = {}
    for b, block in enumerate(params["blocks"]):
        for k in range(steps):
            _step_out(out, f"blocks.{b}.flows.{k}",
                      _unstack(block["steps"], k))
        conv = block["split"]["conv"]
        if conv is None:
            raise ValueError(
                f"block {b} has no learned split prior (learn_prior=False); "
                "the reference Split always owns a ZeroConv2d "
                "(transforms.py:254) — cannot export")
        _zeroconv_out(out, f"blocks.{b}.split.conv", conv)
    for k in range(steps):
        _step_out(out, f"final_flows.{k}",
                  _unstack(params["final_steps"], k))
    return out


def export_gaussian_prior_state_dict(prior: Mapping) -> Dict[str, np.ndarray]:
    """Folded (bias, logs) -> reference GaussianPrior ZeroConv2d state dict:
    conv weight all-zeros (the fold's validity condition, asserted on import
    by reference_import.import_gaussian_prior_state_dict)."""
    bias = _f32(prior["bias"]).reshape(-1)
    c2 = bias.shape[0]
    return {
        "_GaussianPrior__conv.weight": np.zeros((c2, c2, 3, 3), np.float32),
        "_GaussianPrior__conv.bias": bias,
        "_GaussianPrior__conv.logs": _f32(prior["logs"]).reshape(1, -1, 1, 1),
    }


def adam_skeleton(flow_sd: Mapping[str, np.ndarray], lr: float) -> Dict:
    """A torch-Adam-compatible optimizer state dict with EMPTY moment state
    over the flow's trainable params (the reference optimizes
    flow.parameters() only, trainer.py:109): fresh moments, param-group
    shape matching, so `optimizer.load_state_dict` at trainer.py:115
    succeeds. Moments do not transfer across frameworks/parameterizations —
    the same policy as the import direction
    (tools/convert_reference_checkpoint.py)."""
    n_trainable = sum(1 for k in flow_sd if not k.endswith("is_initialized"))
    return {
        "state": {},
        "param_groups": [{
            "lr": float(lr), "betas": (0.9, 0.999), "eps": 1e-8,
            "weight_decay": 0, "amsgrad": False, "maximize": False,
            "foreach": None, "capturable": False, "differentiable": False,
            "fused": None, "params": list(range(n_trainable)),
        }],
    }
