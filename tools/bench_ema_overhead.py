#!/usr/bin/env python
"""Measure the per-step cost of the EMA shadow update in the diffusion
train step on the target device (A/B at the MNIST-recipe stage-2 shape:
frozen L3/K4/w512 flow @ 32x32, UNet dim 64 mults [1,2] per latent part).

Chained-step timing: each iteration reuses the donated state, and the final
loss fetch forces completion of the whole chain (same methodology as
bench.py — free-running dispatch overreports on the tunneled backend).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def run(ema_decay, chain, batch, reps, update_every=1):
    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.models.diffusion_prior import DiffusionPrior
    from nfdpm_tpu.models.formaters import IdentityFormater
    from nfdpm_tpu.models.nf_backbone import NFBackbone
    from nfdpm_tpu.training import diffusion_trainer as dt

    cfg = glow_m.GlowConfig(in_channels=3, levels=3, steps=4,
                            coupling_width=512)
    backbone = NFBackbone(cfg=cfg, img_size=32, frozen=True)
    formater = IdentityFormater(L=cfg.levels, in_channels=cfg.in_channels,
                                size=32)
    dp = DiffusionPrior(
        formater=formater,
        unet_kwargs={"dim": 64, "dim_mults": (1, 2),
                     "resnet_block_groups": 8},
        diffusion_kwargs={"timesteps": 1000, "beta_schedule": "cosine",
                          "loss_type": "l2"},
    )
    tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-3,
                                   ema_decay=ema_decay,
                                   ema_update_every=update_every)
    tx = dt.make_two_group_optimizer(tcfg, frozen=True)
    state = dt.init_train_state(0, backbone, glow_m.init_glow(0, cfg), dp,
                                tx, ema=ema_decay is not None)
    step = dt.make_train_step(backbone, dp, tcfg, tx)
    batch_x = jax.device_put(np.random.default_rng(0).random(
        (batch, 32, 32, 3), np.float32))
    key = jax.random.PRNGKey(0)

    ema_fn = (dt.make_ema_update(backbone, tcfg)
              if ema_decay is not None and update_every > 1 else None)
    state, m = step(state, batch_x, key)  # compile
    if ema_fn is not None:
        state = ema_fn(state)
    float(m["loss"])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(1, chain + 1):
            state, m = step(state, batch_x, key)
            if ema_fn is not None and i % update_every == 0:
                state = ema_fn(state)
        float(m["loss"])
        times.append((time.perf_counter() - t0) / chain * 1e3)
    return min(times)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--decay", type=float, default=0.9995)
    args = ap.parse_args(argv)

    from nfdpm_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    base = run(None, args.chain, args.batch, args.reps)
    ema = run(args.decay, args.chain, args.batch, args.reps)
    ema10 = run(args.decay, args.chain, args.batch, args.reps,
                update_every=10)
    print(f"diffusion train step, batch {args.batch}: "
          f"no-EMA {base:.3f} ms | in-step EMA {ema:.3f} ms "
          f"({(ema / base - 1) * 100:+.1f}%) | "
          f"update_every=10 {ema10:.3f} ms "
          f"({(ema10 / base - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
