"""SSIM / PSNR on device (pytorch-ignite-compatible defaults).

The reference computes SSIM/PSNR via ignite metrics between generated
batches and the train-data eval loader (/root/reference/metrics/compute.py:297-317,
ignite defaults: gaussian kernel 11x11, sigma 1.5, k1=0.01, k2=0.03,
data_range from config). Implemented here as jitted JAX ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def ssim(pred: jax.Array, target: jax.Array, data_range: float = 255.0,
         pad: str = "reflect") -> jax.Array:
    """Mean SSIM over a batch: [B, H, W, C] fp32 images in [0, data_range].
    Gaussian window 11x11 sigma 1.5, K1=0.01, K2=0.03 (ignite defaults).

    pad='reflect' (default) mirrors ignite exactly: both images are
    reflection-padded by (win-1)/2 before the gaussian filter, so the SSIM
    map covers every pixel (ignite SSIM.update pads with mode='reflect'
    before its VALID conv; reference usage /root/reference/metrics/
    compute.py:297-317). pad='valid' averages the interior map only —
    on smooth images the two agree to ~1e-3 (golden deltas recorded in
    tests/test_metrics.py::test_ssim_golden_value)."""
    k = jnp.asarray(_gaussian_kernel())[:, :, None, None]
    c = pred.shape[-1]
    kernel = jnp.tile(k, (1, 1, 1, c))  # depthwise
    if pad == "reflect":
        half = 5  # (11 - 1) // 2
        widths = ((0, 0), (half, half), (half, half), (0, 0))
        pred = jnp.pad(pred, widths, mode="reflect")
        target = jnp.pad(target, widths, mode="reflect")

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_p = filt(pred * pred) - mu_pp
    sigma_t = filt(target * target) - mu_tt
    sigma_pt = filt(pred * target) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2)
    return jnp.mean(num / den)


@functools.partial(jax.jit, static_argnums=(2,))
def psnr(pred: jax.Array, target: jax.Array, data_range: float = 255.0) -> jax.Array:
    """Mean PSNR over a batch (per-image MSE, ignite semantics)."""
    mse = jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
        axis=(1, 2, 3),
    )
    return jnp.mean(10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12)))
