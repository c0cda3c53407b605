"""Gaussian priors over the final Glow latent, and the bits/dim loss.

Re-design of /root/reference/normalizing_flow/prior.py.

The reference's `GaussianPrior` runs a ZeroConv2d over an all-zeros tensor
(prior.py:79-99); with a zero input the conv weight contributes nothing and
receives no gradient, so the prior's (mean, log_sd) reduce exactly to the
learned per-channel constants `bias * exp(3 * logs)`. We parameterize those
two vectors directly — same math, no dead conv weights (and no crash when
`learn_prior_mean_logs=False`, unlike prior.py:65-68).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bijectors import gaussian_logp, gaussian_sample
from ..ops.zeroconv import LOGSCALE_FACTOR

Params = Dict[str, Any]


def init_gaussian_prior(channels: int, learn: bool = True) -> Params:
    """`channels` is the final-latent channel count (2^(L+1) * C_img).
    With learn=False the params are empty and the prior is standard normal."""
    if not learn:
        return {}
    return {
        "bias": np.zeros((2 * channels,), np.float32),
        "logs": np.zeros((2 * channels,), np.float32),
    }


def _moments(params: Params, channels: int) -> Tuple[jax.Array, jax.Array]:
    if not params:
        z = jnp.zeros((channels,), jnp.float32)
        return z, z
    h = params["bias"] * jnp.exp(params["logs"] * LOGSCALE_FACTOR)
    return h[:channels], h[channels:]


def gaussian_prior_logp(params: Params, x: jax.Array) -> jax.Array:
    """[B] log-prob of the final latent x: [B, H, W, C] (prior.py:70-83)."""
    mean, logsd = _moments(params, x.shape[-1])
    return gaussian_logp(x, mean, logsd)


def gaussian_prior_sample(
    params: Params,
    key: jax.Array,
    shape: Tuple[int, int, int, int],
    temperature: float = 1.0,
) -> jax.Array:
    """Sample [B, H, W, C] from the prior at `temperature` (prior.py:85-99)."""
    mean, logsd = _moments(params, shape[-1])
    mean = jnp.broadcast_to(mean, shape)
    logsd = jnp.broadcast_to(logsd, shape)
    return gaussian_sample(key, mean, logsd, temperature)


# ---------------------------------------------------------------------------
# Bits/dim
# ---------------------------------------------------------------------------

def bits_per_dim(
    log_likelihood: jax.Array, n_bins: float, n_pixel: float
) -> jax.Array:
    """BPD = (log(n_bins)*n_pixel - ll) * log2(e) / n_pixel, batch-mean
    (/root/reference/normalizing_flow/utils.py:244-256)."""
    bpd_const = np.log2(np.e) / n_pixel
    return jnp.mean((np.log(n_bins) * n_pixel - log_likelihood) * bpd_const)


def n_pixels(img_size: int, channels: int = 3, compat_three_channels: bool = True) -> float:
    """The reference hardcodes 3 channels even for MNIST
    (run_baseline_experiment.py:126, trainer.py:134); `compat_three_channels`
    keeps that behavior for parity runs, set False for the corrected count."""
    c = 3.0 if compat_three_channels else float(channels)
    return float(img_size) * float(img_size) * c
