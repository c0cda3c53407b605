#!/usr/bin/env python
"""Benchmark: GlowConfig.use_pallas (Pallas channel-mix + coupling-tail
kernels) vs the pure-XLA step, on real TPU hardware.

Measures the full jitted NF TRAIN step (fwd + bwd + adam, the product hot
path) and the forward-only likelihood chain, at the MNIST-recipe shape
(L3/K4/width 512, 32x32, batch 64). Chained-scan timing methodology as in
bench.py (host fetch forces completion over the tunneled chip).

Run: python tools/bench_pallas_step.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("NFDPM_BENCH_BATCH", "64"))
CHAIN = int(os.environ.get("NFDPM_BENCH_CHAIN", "20"))
REPS = 3


def bench_config(use_pallas: bool):
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.training import nf_trainer as nft
    from nfdpm_tpu.training.optim import make_optimizer

    cfg = glow_m.GlowConfig(in_channels=3, levels=3, steps=4,
                            coupling_width=512, scan_unroll=4,
                            use_pallas=use_pallas)
    tcfg = nft.NFTrainConfig(lr=1e-3)
    tx = make_optimizer("adam", 1e-3, fixed_prior=True)
    state = nft.init_train_state(0, cfg, tcfg, tx)
    state = jax.device_put(state)
    train_step = nft.make_train_step(cfg, tcfg, tx)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 32, 32, 3))
    key = jax.random.PRNGKey(0)

    # train step timing: chain CHAIN steps by reusing donated state
    state, m = train_step(state, batch, key)  # compile
    float(m["bpd"])
    t0 = time.perf_counter()
    for _ in range(REPS):
        for _ in range(CHAIN):
            state, m = train_step(state, batch, key)
        float(m["bpd"])  # fetch forces completion of the whole chain
    train_ms = (time.perf_counter() - t0) / (REPS * CHAIN) * 1000

    # forward-only likelihood chain
    @jax.jit
    def fwd_chain(params, x):
        def body(carry, _):
            latents, ldj, logp = glow_m.forward(params["flow"], cfg, carry)
            return carry * (1.0 + 1e-7 * jnp.mean(ldj)), jnp.mean(ldj)

        out, ldjs = jax.lax.scan(body, x, None, length=CHAIN)
        return jnp.sum(out) + jnp.sum(ldjs)

    x0 = batch - 0.5
    float(fwd_chain(state["params"], x0))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fwd_chain(state["params"], x0))
    fwd_ms = (time.perf_counter() - t0) / (REPS * CHAIN) * 1000

    # inverse (sampling-path) chain — VERDICT r2 item 7: does the Pallas
    # inverse route (step_inverse_pallas) beat XLA where it matters?
    lat0, _, _ = jax.jit(lambda p, x: glow_m.forward(p["flow"], cfg, x))(
        state["params"], x0)
    lat0 = tuple(lat0)

    @jax.jit
    def inv_chain(params, lats):
        def body(carry, _):
            x = glow_m.inverse(params["flow"], cfg, list(carry))
            bump = 1e-7 * jnp.mean(x)
            return tuple(z * (1.0 + bump) for z in carry), jnp.mean(x)

        out, means = jax.lax.scan(body, lats, None, length=CHAIN)
        return sum(jnp.sum(z) for z in out) + jnp.sum(means)

    float(inv_chain(state["params"], lat0))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(inv_chain(state["params"], lat0))
    inv_ms = (time.perf_counter() - t0) / (REPS * CHAIN) * 1000

    return {"train_step_ms": round(train_ms, 3), "fwd_ms": round(fwd_ms, 3),
            "inv_ms": round(inv_ms, 3),
            "train_img_per_s": round(BATCH / train_ms * 1000, 1)}


def main():
    results = {}
    for use_pallas in (False, True):
        name = "pallas" if use_pallas else "xla"
        results[name] = bench_config(use_pallas)
        print(f"{name}: {results[name]}", file=sys.stderr)
    results["speedup_train"] = round(
        results["xla"]["train_step_ms"] / results["pallas"]["train_step_ms"], 4)
    results["speedup_fwd"] = round(
        results["xla"]["fwd_ms"] / results["pallas"]["fwd_ms"], 4)
    results["speedup_inv"] = round(
        results["xla"]["inv_ms"] / results["pallas"]["inv_ms"], 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
