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
    --mfu               UNet-forward MFU profile: XLA cost-analysis FLOPs,
                        achieved TFLOPS vs the v5e bf16 peak, and ablation
                        timings (attention off, time-FiLM off, bf16 convs,
                        dim-128 model) showing where the time goes
Each sampler run also reports `sec_to_50k_samples`, the extrapolated
wall-clock to generate the 50k images a CIFAR-scale FID pass needs.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_once(batch, T, unroll, ddim_steps=None, reps=3, stacked=False,
               method="auto", learned_variance=False):
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models.diffusion import DiffusionConfig, GaussianDiffusion
    from nfdpm_tpu.models.unet import Unet

    h = w = 16
    c = 6

    unet = Unet(dim=64, dim_mults=(1, 2), channels=c, resnet_block_groups=8,
                stacked_mid_attn=stacked, learned_variance=learned_variance)
    x0 = jnp.zeros((batch, h, w, c))
    t0_arr = jnp.zeros((batch,), jnp.int32)
    variables = unet.init(jax.random.PRNGKey(0), x0, t0_arr, None)
    params = jax.device_put(variables["params"])

    def apply_fn(p, x, t, sc):
        return unet.apply({"params": p}, x, t, sc)

    cfg = DiffusionConfig(image_size=h, channels=c, timesteps=T,
                          sampling_timesteps=ddim_steps,
                          beta_schedule="cosine", auto_normalize=False,
                          scan_unroll=unroll, sampling_method=method,
                          learned_variance=learned_variance)
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
        "sampler": method if method != "auto"
        else ("ddim" if ddim_steps else "ancestral"),
        "steps_per_sec": round(n_steps / dt, 2),
        "full_chain_seconds": round(dt, 4),
        "samples_per_sec": round(batch / dt, 2),
        "sec_to_50k_samples": round(50_000 / (batch / dt), 1),
    }


V5E_BF16_PEAK_TFLOPS = 197.0  # per-chip systolic peak, the MFU denominator


def _mfu_time_fwd(unet, batch, chain=50, reps=3):
    """Time one UNet forward via a data-dependent jitted chain; return
    (ms_per_fwd, gflop_per_fwd from XLA cost analysis of a single apply)."""
    import jax
    import jax.numpy as jnp

    h = w = 16
    c = 6
    x0 = jnp.zeros((batch, h, w, c))
    t_arr = jnp.zeros((batch,), jnp.int32)
    params = jax.device_put(
        unet.init(jax.random.PRNGKey(0), x0, t_arr, None)["params"])

    def one(p, x):
        return unet.apply({"params": p}, x, t_arr, None)

    cost = jax.jit(one).lower(params, x0).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    gflop = float(cost.get("flops", 0.0)) / 1e9 if cost else 0.0

    @jax.jit
    def fwd_chain(p, x):
        def body(carry, _):
            out = one(p, carry)
            return carry + 1e-6 * out, jnp.mean(out)

        _, means = jax.lax.scan(body, x, None, length=chain)
        return jnp.sum(means)

    float(fwd_chain(params, x0))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fwd_chain(params, x0))
    ms = (time.perf_counter() - t0) / (reps * chain) * 1000
    return ms, gflop


def mfu_profile(reps=3, only=()):
    """Ablation-based answer to 'where do the UNet's cycles go'. Ablations
    monkeypatch the module classes (profiling harness only — product code
    unchanged): attention blocks become identity; time-FiLM is dropped by
    passing time_emb=None into the blocks."""
    import contextlib

    import jax.numpy as jnp

    from nfdpm_tpu.models import unet as unet_mod

    @contextlib.contextmanager
    def patched(cls, fn):
        orig = cls.__call__
        cls.__call__ = fn
        try:
            yield
        finally:
            cls.__call__ = orig

    def identity_call(self, x):
        return x

    orig_res = unet_mod.ResnetBlock.__call__

    def no_film_call(self, x, time_emb=None):
        return orig_res(self, x, None)

    def build(dim=64, dtype=jnp.float32, **kw):
        return unet_mod.Unet(dim=dim, dim_mults=(1, 2), channels=6,
                             resnet_block_groups=8, dtype=dtype, **kw)

    rows = []

    def run(name, batch, ctxs=(), **kw):
        if only and name not in only:
            return
        with contextlib.ExitStack() as stack:
            for c in ctxs:
                stack.enter_context(c)
            ms, gflop = _mfu_time_fwd(build(**kw), batch, reps=reps)
        # gflop is for the whole batched apply, so GFLOP/ms == TFLOPS
        row = {"variant": name, "batch": batch, "ms_per_fwd": round(ms, 3),
               "gflop_per_fwd": round(gflop, 2),
               "achieved_tflops": round(gflop / ms, 1),
               "pct_v5e_bf16_peak": round(gflop / ms / V5E_BF16_PEAK_TFLOPS
                                          * 100, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    for batch in (64, 256):
        run("base_fp32", batch)
        run("fused_attention", batch, fused_attention=True)
        run("bf16_convs", batch, dtype=jnp.bfloat16)
        run("no_attention", batch,
            ctxs=[patched(unet_mod.LinearAttention, identity_call),
                  patched(unet_mod.Attention, identity_call)])
        run("no_linear_attn", batch,
            ctxs=[patched(unet_mod.LinearAttention, identity_call)])
        run("no_mid_attn", batch,
            ctxs=[patched(unet_mod.Attention, identity_call)])
        run("no_time_film", batch,
            ctxs=[patched(unet_mod.ResnetBlock, no_film_call)])
    run("dim128_fp32", 64, dim=128)
    run("dim128_fp32", 256, dim=128)
    return rows


def main():
    # persistent compile cache: chain compiles over the tunneled backend
    # cost 10-25 min per process otherwise (same policy as bench.py)
    from nfdpm_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--T", type=int, default=250)
    ap.add_argument("--ddim", type=int, default=None)
    ap.add_argument("--sampler", default="auto",
                    choices=["auto", "ancestral", "ddim", "dpm++"],
                    help="dpm++ = DPM-Solver++(2M); pair with --ddim 25 "
                         "for the 25-NFE FID-generation recipe")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--mfu", action="store_true")
    ap.add_argument("--mfu-variants", nargs="*", default=[],
                    help="restrict --mfu to these variant names")
    ap.add_argument("--stacked", action="store_true",
                    help="Unet(stacked_mid_attn=True): mid-block attention "
                         "heads folded into the sequence axis (exact math)")
    ap.add_argument("--learned-variance", action="store_true",
                    help="2C-output UNet + learned-sigma sampling (improved-"
                         "DDPM) — the same-session A/B for BENCH.md's "
                         "sampler-cost table (VERDICT r4 weak #4)")
    args = ap.parse_args()

    if args.mfu:
        mfu_profile(reps=args.reps, only=tuple(args.mfu_variants))
        return

    if args.sweep:
        for batch in (64, 256, 512, 1024):
            for unroll in (1, 4):
                r = bench_once(batch, args.T, unroll, args.ddim,
                               reps=args.reps)
                print(json.dumps(r))
        return

    r = bench_once(args.batch, args.T, args.unroll, args.ddim,
                   reps=args.reps, stacked=args.stacked,
                   method=args.sampler,
                   learned_variance=args.learned_variance)
    r["metric"] = (f"ddpm_unet64_denoise_steps_per_sec_batch{args.batch}"
                   f"_16x16x6")
    if args.stacked:
        r["metric"] += "_stackedattn"
    if args.learned_variance:
        r["metric"] += "_learnedvar"
    r["value"] = r["steps_per_sec"]
    r["unit"] = "steps/sec"
    print(json.dumps(r))


if __name__ == "__main__":
    main()
