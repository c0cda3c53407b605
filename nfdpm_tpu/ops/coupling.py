"""The affine-coupling CNN: Conv3x3+ActNorm -> ReLU -> Conv1x1+ActNorm ->
ReLU -> ZeroConv3x3, hidden width 512.

TPU-native re-design of the reference's `coupling_network` + `Conv2dActNorm`
(/root/reference/normalizing_flow/utils.py:47-90): NHWC, HWIO, pure
functions, and an explicit data-dependent-init pass for the two inner
actnorms (the reference initializes them lazily on first forward).

At apply time the per-channel actnorm affine folds into the convolution
epilogue (conv -> +bias' -> *scale'), which XLA fuses into the conv output —
no separate normalization kernels hit HBM.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .zeroconv import conv2d_nhwc, init_zeroconv, zeroconv_apply

Params = Dict[str, Any]

_EPS = 1e-6


import numpy as np


def _conv_init(rng: np.random.Generator, k: int, cin: int, cout: int) -> np.ndarray:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Conv2d default.
    Host-side numpy draw; model build never touches the device."""
    bound = 1.0 / (cin * k * k) ** 0.5
    return rng.uniform(-bound, bound, (k, k, cin, cout)).astype(np.float32)


def init_coupling_net(
    rng: np.random.Generator, in_channels: int, width: int, out_channels: int
) -> Params:
    k1 = k2 = rng
    return {
        "conv1": {"w": _conv_init(k1, 3, in_channels, width)},  # bias-free (utils.py:65)
        "an1": {"scale": np.zeros((width,), np.float32), "bias": np.zeros((width,), np.float32)},
        "conv2": {"w": _conv_init(k2, 1, width, width)},
        "an2": {"scale": np.zeros((width,), np.float32), "bias": np.zeros((width,), np.float32)},
        "zconv": init_zeroconv(width, out_channels, filter_size=3),
    }


def _conv_actnorm(x: jax.Array, conv: Params, an: Params, padding: int,
                  dtype=jnp.float32) -> jax.Array:
    """Conv with the actnorm affine folded into the epilogue. `dtype`
    selects the MXU precision (bf16 doubles throughput on TPU; the epilogue
    stays fp32, and forward/inverse remain exactly consistent because both
    directions evaluate the identical function)."""
    if dtype == jnp.float32:
        h = conv2d_nhwc(x, jnp.asarray(conv["w"]), padding=padding)
    else:
        # bf16 in -> bf16 out, NO preferred_element_type=fp32: the conv
        # transpose rule cannot mix an fp32 cotangent with a bf16 kernel, so
        # the fp32 upcast must be an explicit jaxpr op (its transpose casts
        # the cotangent back to bf16 before the conv transpose).
        h = jax.lax.conv_general_dilated(
            x.astype(dtype), jnp.asarray(conv["w"]).astype(dtype),
            window_strides=(1, 1),
            padding=[(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
    return jnp.exp(an["scale"]) * (h + an["bias"])


def coupling_net_apply(params: Params, x: jax.Array, dtype=jnp.float32) -> jax.Array:
    h = jax.nn.relu(_conv_actnorm(x, params["conv1"], params["an1"], padding=1,
                                  dtype=dtype))
    h = jax.nn.relu(_conv_actnorm(h, params["conv2"], params["an2"], padding=0,
                                  dtype=dtype))
    return zeroconv_apply(params["zconv"], h)


def coupling_net_ddinit(params: Params, x: jax.Array) -> Tuple[Params, jax.Array]:
    """Initialize the two inner actnorms from the first batch's statistics
    (per-channel zero mean / unit variance post-conv), then apply."""
    def an_init(h: jax.Array) -> Params:
        return {
            "scale": -jnp.log(jnp.std(h, axis=(0, 1, 2), ddof=1) + _EPS),
            "bias": -jnp.mean(h, axis=(0, 1, 2)),
        }

    h1 = conv2d_nhwc(x, params["conv1"]["w"], padding=1)
    an1 = an_init(h1)
    y1 = jax.nn.relu(jnp.exp(an1["scale"]) * (h1 + an1["bias"]))
    h2 = conv2d_nhwc(y1, params["conv2"]["w"], padding=0)
    an2 = an_init(h2)
    y2 = jax.nn.relu(jnp.exp(an2["scale"]) * (h2 + an2["bias"]))
    out = zeroconv_apply(params["zconv"], y2)
    new = dict(params)
    new["an1"], new["an2"] = an1, an2
    return new, out
