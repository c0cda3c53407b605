"""Zero-initialized convolution with learned channel-wise output log-scale.

TPU-native port of the reference's `ZeroConv2d`
(/root/reference/normalizing_flow/utils.py:17-44):
    out = (conv(x) + bias) * exp(logs * logscale_factor),   logscale_factor=3.

NHWC layout, HWIO kernels, SAME-style explicit padding (pad = (k-1)//2 to
match the reference's torch padding argument).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

LOGSCALE_FACTOR = 3.0  # utils.py:25


def conv2d_nhwc(x: jax.Array, w: jax.Array, padding: int = 0) -> jax.Array:
    """Plain NHWC conv with HWIO weights and symmetric integer padding."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def init_zeroconv(in_channels: int, out_channels: int, filter_size: int = 3) -> Params:
    """All-zero weight/bias/logs (utils.py:37-40)."""
    import numpy as np

    return {
        "w": np.zeros((filter_size, filter_size, in_channels, out_channels), np.float32),
        "b": np.zeros((out_channels,), np.float32),
        "logs": np.zeros((out_channels,), np.float32),
    }


def zeroconv_apply(params: Params, x: jax.Array) -> jax.Array:
    pad = (params["w"].shape[0] - 1) // 2
    y = conv2d_nhwc(x, params["w"], padding=pad) + params["b"]
    return y * jnp.exp(params["logs"] * LOGSCALE_FACTOR)
