#!/usr/bin/env python
"""Benchmark harness: Glow fwd+inverse images/sec/chip at 32x32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md "to be measured by us"): the PyTorch reference
(Glow L3 K4, batch 64, 32x32, fp32, eval-mode fwd+inverse) measured on this
environment's 1-core CPU at 19.0 images/sec (3363 ms/iter) — see
tools/measure_reference_baseline.py for the exact harness. North-star is
>=5x that per TPU chip (BASELINE.json).
"""

import json
import sys
import time

REFERENCE_CPU_IMAGES_PER_SEC = 19.0


def main():
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models import glow as glow_m

    cfg = glow_m.GlowConfig(in_channels=3, levels=3, steps=4, coupling_width=512)
    params = glow_m.init_glow(0, cfg)  # int seed: host-side build

    batch = 64
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 32, 32, 3), jnp.float32) - 0.5

    @jax.jit
    def fwd_inv(params, x):
        latents, ldj, logp = glow_m.forward(params, cfg, x)
        inv = glow_m.inverse(params, cfg, latents)
        return inv, ldj, logp

    # warmup / compile
    out = fwd_inv(params, x)
    jax.block_until_ready(out)

    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd_inv(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = n_iter * batch / dt
    print(json.dumps({
        "metric": "glow_L3K4_fwd_inverse_images_per_sec_per_chip_32x32",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / REFERENCE_CPU_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
