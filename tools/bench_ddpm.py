#!/usr/bin/env python
"""Secondary benchmark: DDPM denoising-chain throughput (steps/sec).

BASELINE.json's metric list includes "DDPM steps/sec (jitted lax.scan
chain)". bench.py stays the single-line primary harness (Glow fwd+inverse);
this tool reports the diffusion numbers: UNet denoise steps/sec for the
reference workload shape (UNet dim 64, mults [1,2], latent 16x16x6 — the
MNIST L3 first latent part) and full-chain sample latency.

Methodology matches bench.py: the T-step chain IS a lax.scan (data-dependent
by construction), timed by host fetch.

Flags (VERDICT r2 item 2 — FID-scale sampler throughput):
    --batch N           sampler batch (default 64; FID-scale gen uses 256)
    --unroll K          DiffusionConfig.scan_unroll (default 1)
    --T N               chain length (default 250)
    --ddim N            use the DDIM sampler with N strided steps instead of
                        the full-T ancestral chain (reference
                        sampling_timesteps knob, gaussian_diffusion.py:735-777)
    --sweep             run the batch x unroll sweep table used for BENCH.md
Each run also reports `sec_to_50k_samples`, the extrapolated wall-clock to
generate the 50k images a CIFAR-scale FID pass needs.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_once(batch, T, unroll, ddim_steps=None, reps=3):
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models.diffusion import DiffusionConfig, GaussianDiffusion
    from nfdpm_tpu.models.unet import Unet

    h = w = 16
    c = 6

    unet = Unet(dim=64, dim_mults=(1, 2), channels=c, resnet_block_groups=8)
    x0 = jnp.zeros((batch, h, w, c))
    t0_arr = jnp.zeros((batch,), jnp.int32)
    variables = unet.init(jax.random.PRNGKey(0), x0, t0_arr, None)
    params = jax.device_put(variables["params"])

    def apply_fn(p, x, t, sc):
        return unet.apply({"params": p}, x, t, sc)

    cfg = DiffusionConfig(image_size=h, channels=c, timesteps=T,
                          sampling_timesteps=ddim_steps,
                          beta_schedule="cosine", auto_normalize=False,
                          scan_unroll=unroll)
    diff = GaussianDiffusion(apply_fn, cfg)
    n_steps = ddim_steps or T

    sample = jax.jit(lambda p, k: diff.sample(p, k, batch_size=batch))
    out = sample(params, jax.random.PRNGKey(1))
    float(jnp.sum(out))  # compile + complete

    t_start = time.perf_counter()
    for r in range(reps):
        out = sample(params, jax.random.PRNGKey(2 + r))
        float(jnp.sum(out))
    dt = (time.perf_counter() - t_start) / reps
    return {
        "batch": batch, "chain_steps": n_steps, "unroll": unroll,
        "sampler": "ddim" if ddim_steps else "ancestral",
        "steps_per_sec": round(n_steps / dt, 2),
        "full_chain_seconds": round(dt, 4),
        "samples_per_sec": round(batch / dt, 2),
        "sec_to_50k_samples": round(50_000 / (batch / dt), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--T", type=int, default=250)
    ap.add_argument("--ddim", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    if args.sweep:
        for batch in (64, 256, 512, 1024):
            for unroll in (1, 4):
                r = bench_once(batch, args.T, unroll, args.ddim,
                               reps=args.reps)
                print(json.dumps(r))
        return

    r = bench_once(args.batch, args.T, args.unroll, args.ddim, reps=args.reps)
    r["metric"] = (f"ddpm_unet64_denoise_steps_per_sec_batch{args.batch}"
                   f"_16x16x6")
    r["value"] = r["steps_per_sec"]
    r["unit"] = "steps/sec"
    print(json.dumps(r))


if __name__ == "__main__":
    main()
