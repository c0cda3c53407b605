#!/usr/bin/env python
"""Secondary benchmark: DDPM denoising-chain throughput (steps/sec).

BASELINE.json's metric list includes "DDPM steps/sec (jitted lax.scan
chain)". bench.py stays the single-line primary harness (Glow fwd+inverse);
this tool reports the diffusion numbers: UNet denoise steps/sec for the
reference workload shape (UNet dim 64, mults [1,2], latent 16x16x6 — the
MNIST L3 first latent part) and full-chain sample latency.

Methodology matches bench.py: the T-step chain IS a lax.scan (data-dependent
by construction), timed by host fetch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models.diffusion import DiffusionConfig, GaussianDiffusion
    from nfdpm_tpu.models.unet import Unet

    h = w = 16
    c = 6
    batch = 64
    T = 250

    unet = Unet(dim=64, dim_mults=(1, 2), channels=c, resnet_block_groups=8)
    x0 = jnp.zeros((batch, h, w, c))
    t0_arr = jnp.zeros((batch,), jnp.int32)
    variables = unet.init(jax.random.PRNGKey(0), x0, t0_arr, None)
    params = jax.device_put(variables["params"])

    def apply_fn(p, x, t, sc):
        return unet.apply({"params": p}, x, t, sc)

    cfg = DiffusionConfig(image_size=h, channels=c, timesteps=T,
                          beta_schedule="cosine", auto_normalize=False)
    diff = GaussianDiffusion(apply_fn, cfg)

    sample = jax.jit(lambda p, k: diff.p_sample_loop(p, k, (batch, h, w, c)))
    out = sample(params, jax.random.PRNGKey(1))
    float(jnp.sum(out))  # compile + complete

    reps = 3
    t_start = time.perf_counter()
    for r in range(reps):
        out = sample(params, jax.random.PRNGKey(2 + r))
        float(jnp.sum(out))
    dt = (time.perf_counter() - t_start) / reps

    print(json.dumps({
        "metric": "ddpm_unet64_denoise_steps_per_sec_batch64_16x16x6",
        "value": round(T / dt, 2),
        "unit": "steps/sec",
        "chain_T": T,
        "full_chain_seconds": round(dt, 4),
        "samples_per_sec": round(batch / dt, 2),
    }))


if __name__ == "__main__":
    main()
