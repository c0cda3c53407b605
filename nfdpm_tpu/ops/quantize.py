"""n-bit quantization pre/post-processing and uniform dequantization.

TPU-native versions of the reference's pipeline
(/root/reference/normalizing_flow/utils.py:175-210):

    preprocess : x in [0,1] -> floor(255*x / 2^(8-n_bits)) / n_bins - 0.5
    postprocess: clip(floor((y+0.5)*n_bins) * (256/n_bins), 0, 255) -> uint8
    dequantize : y + U(0, 1/n_bins)   (trainer.py:155)

All jit-safe, elementwise (VPU), fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def n_bins_of(n_bits: int) -> float:
    return float(2 ** n_bits)


def preprocess(batch: jax.Array, n_bits: int) -> jax.Array:
    """Map images in [0, 1] to centered n-bit codes in [-0.5, 0.5)."""
    n_bins = 2.0 ** n_bits
    x = batch * 255.0
    if n_bits < 8:
        x = jnp.floor(x / 2.0 ** (8 - n_bits))
    return x / n_bins - 0.5


def postprocess(batch: jax.Array, n_bits: int) -> jax.Array:
    """Map flow outputs back to uint8 pixels."""
    n_bins = 2.0 ** n_bits
    x = jnp.floor((batch + 0.5) * n_bins) * (256.0 / n_bins)
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


def dequantize(key: jax.Array, batch: jax.Array, n_bits: int) -> jax.Array:
    """Add uniform dequantization noise U(0, 1/n_bins)."""
    n_bins = 2.0 ** n_bits
    return batch + jax.random.uniform(key, batch.shape, batch.dtype) / n_bins
