#!/usr/bin/env python
"""CelebA-128-scale Glow train-step sweep (VERDICT r2 item 8).

Shape envelope from the reference recipe (/root/reference/README.md:132-158):
L5 / K16, 128x128x3, batch 8, coupling width 512. Round-2 best was
coupling_dtype=bfloat16 + remat(dots_saveable) = 38.1 ms/step; this sweep
adds the grad_accum axis (microbatching trades remat's recompute for
bounded activation memory WITHOUT redoing the forward).

Run: python tools/bench_celeba_step.py [--configs name1 name2 ...]
Chained-step timing as in bench.py (host fetch forces completion).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
CHAIN = 10
REPS = 3

CONFIGS = {
    "bf16_remat": dict(coupling_dtype="bfloat16", remat=True, grad_accum=1),
    "bf16_noremat": dict(coupling_dtype="bfloat16", remat=False, grad_accum=1),
    "bf16_noremat_accum2": dict(coupling_dtype="bfloat16", remat=False,
                                grad_accum=2),
    "bf16_noremat_accum4": dict(coupling_dtype="bfloat16", remat=False,
                                grad_accum=4),
    "bf16_remat_accum2": dict(coupling_dtype="bfloat16", remat=True,
                              grad_accum=2),
}


def bench(name, spec):
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.training import nf_trainer as nft
    from nfdpm_tpu.training.optim import make_optimizer

    cfg = glow_m.GlowConfig(
        in_channels=3, levels=5, steps=16, coupling_width=512, scan_unroll=1,
        coupling_dtype=spec["coupling_dtype"], remat=spec["remat"],
    )
    tcfg = nft.NFTrainConfig(lr=1e-3, grad_accum=spec["grad_accum"])
    tx = make_optimizer("adam", 1e-3, fixed_prior=True)
    state = jax.device_put(nft.init_train_state(0, cfg, tcfg, tx))
    train_step = nft.make_train_step(cfg, tcfg, tx)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 128, 128, 3))
    key = jax.random.PRNGKey(0)

    state, m = train_step(state, batch, key)  # compile
    float(m["bpd"])
    t0 = time.perf_counter()
    for _ in range(REPS):
        for _ in range(CHAIN):
            state, m = train_step(state, batch, key)
        float(m["bpd"])
    ms = (time.perf_counter() - t0) / (REPS * CHAIN) * 1000
    return {"config": name, "step_ms": round(ms, 2),
            "img_per_s": round(BATCH / ms * 1000, 1), **spec}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS))
    args = ap.parse_args()
    for name in args.configs:
        try:
            print(json.dumps(bench(name, CONFIGS[name])), flush=True)
        except Exception as e:  # OOM etc. — record, keep sweeping
            print(json.dumps({"config": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
