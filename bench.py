#!/usr/bin/env python
"""Benchmark harness: Glow fwd+inverse images/sec/chip at 32x32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md "to be measured by us"): the PyTorch reference
(Glow L3 K4, batch 64, 32x32, fp32, eval-mode fwd+inverse) measured on this
environment's 1-core CPU at 19.0 images/sec (3363 ms/iter) — see
tools/measure_reference_baseline.py.  North-star is >=5x that per TPU chip
(BASELINE.json).

Methodology notes:
  * Iterations are CHAINED inside one jitted `lax.scan` (each iteration's
    input depends on the previous output) and the result is fetched to host
    — on a tunneled TPU, `block_until_ready` can acknowledge before remote
    execution completes, so free-running dispatch loops overreport wildly.
  * The forward and inverse passes use slightly perturbed inputs per
    iteration so XLA cannot CSE the inverse's coupling-net convolutions
    against the forward's (they are bit-identical subexpressions otherwise).
"""

import json
import os
import sys
import time

REFERENCE_CPU_IMAGES_PER_SEC = 19.0
# tools/measure_reference_ddpm_baseline.py: reference CPU p_sample rate at the
# same shape as the secondary DDPM metric below (UNet-64, batch 64, 16x16x6).
REFERENCE_CPU_DDPM_STEPS_PER_SEC = 0.295
BATCH = int(os.environ.get("NFDPM_BENCH_BATCH", "64"))
CHAIN = int(os.environ.get("NFDPM_BENCH_CHAIN", "50"))
WIDTH = int(os.environ.get("NFDPM_BENCH_WIDTH", "512"))
RUN_DDPM = os.environ.get("NFDPM_BENCH_DDPM", "1") != "0"
# Coupling-CNN storage dtype. Default fp32 = apples-to-apples vs the fp32
# torch-CPU baseline; bfloat16 measures 1.14x on this chain (BENCH.md r3).
DTYPE = os.environ.get("NFDPM_BENCH_DTYPE", "float32")
# N independently-timed trials per metric; the JSON reports the MEDIAN plus
# min/max spread so the driver history can tell regression from the ±3%
# cross-session weather BENCH.md documents (VERDICT r4 weak #1).
TRIALS = int(os.environ.get("NFDPM_BENCH_TRIALS", "5"))


def _dispersion(rates):
    med = sorted(rates)[len(rates) // 2]
    return med, {"trials": len(rates), "min": round(min(rates), 2),
                 "max": round(max(rates), 2),
                 "spread_pct": round(100.0 * (max(rates) - min(rates))
                                     / med, 2)}


def bench_ddpm():
    """DDPM ancestral-chain throughput (BASELINE.json's second north-star
    metric): UNet-64 denoise steps/sec as a jitted lax.scan, same workload
    shape as tools/bench_ddpm.py and the reference CPU anchor."""
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models.diffusion import DiffusionConfig, GaussianDiffusion
    from nfdpm_tpu.models.unet import Unet

    h = w = 16
    c = 6
    batch = int(os.environ.get("NFDPM_BENCH_DDPM_BATCH", "64"))
    T = int(os.environ.get("NFDPM_BENCH_DDPM_T", "250"))

    unet = Unet(dim=64, dim_mults=(1, 2), channels=c, resnet_block_groups=8)
    variables = unet.init(jax.random.PRNGKey(0), jnp.zeros((batch, h, w, c)),
                          jnp.zeros((batch,), jnp.int32), None)
    params = jax.device_put(variables["params"])
    # scan_unroll=4: +6.6% on this exact chain (849.5 -> 905.4 steps/s,
    # same-session A/B via tools/bench_ddpm.py; 8 is flat, stacked-mid-attn
    # regresses when combined — BENCH.md round 4)
    cfg = DiffusionConfig(image_size=h, channels=c, timesteps=T,
                          beta_schedule="cosine", auto_normalize=False,
                          scan_unroll=int(os.environ.get(
                              "NFDPM_BENCH_DDPM_UNROLL", "4")))
    diff = GaussianDiffusion(
        lambda p, x, t, sc: unet.apply({"params": p}, x, t, sc), cfg)

    sample = jax.jit(lambda p, k: diff.p_sample_loop(p, k, (batch, h, w, c)))
    float(jnp.sum(sample(params, jax.random.PRNGKey(1))))  # compile

    rates = []
    for r in range(TRIALS):
        t0 = time.perf_counter()
        float(jnp.sum(sample(params, jax.random.PRNGKey(2 + r))))
        rates.append(T / (time.perf_counter() - t0))
    return rates


def main():
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.utils.env import enable_compilation_cache

    # timing is execution-only (chained in-jit scans), so caching compiles
    # does not touch the measured numbers — it only cuts bench wall time
    enable_compilation_cache()

    cfg = glow_m.GlowConfig(in_channels=3, levels=3, steps=4,
                            coupling_width=WIDTH, scan_unroll=4,
                            coupling_dtype=DTYPE)
    params = jax.device_put(glow_m.init_glow(0, cfg))
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 32, 32, 3), jnp.float32) - 0.5

    @jax.jit
    def chain(params, x):
        def body(carry, _):
            latents, ldj, logp = glow_m.forward(params, cfg, carry)
            # perturb latents so the inverse cannot reuse forward activations
            eps = 1e-7 * jnp.mean(ldj)
            latents = [z * (1.0 + eps) for z in latents]
            inv = glow_m.inverse(params, cfg, latents)
            # feed the inverse output back as the next forward input
            return inv, jnp.mean(ldj)

        out, ldjs = jax.lax.scan(body, x, None, length=CHAIN)
        return jnp.sum(out) + jnp.sum(ldjs)

    # warmup / compile
    float(chain(params, x0))

    rates = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(chain(params, x0))  # host fetch forces real completion
        rates.append(CHAIN * BATCH / (time.perf_counter() - t0))

    ips, disp = _dispersion(rates)
    record = {
        "metric": "glow_L3K4_fwd_inverse_images_per_sec_per_chip_32x32",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / REFERENCE_CPU_IMAGES_PER_SEC, 2),
        "dispersion": disp,
    }
    if RUN_DDPM:
        ddpm_rates = bench_ddpm()
        ddpm_sps, ddpm_disp = _dispersion(ddpm_rates)
        record["secondary"] = {
            "metric": "ddpm_unet64_denoise_steps_per_sec_batch64_16x16x6",
            "value": round(ddpm_sps, 2),
            "unit": "steps/sec",
            "vs_baseline": round(ddpm_sps / REFERENCE_CPU_DDPM_STEPS_PER_SEC, 2),
            "dispersion": ddpm_disp,
        }
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
