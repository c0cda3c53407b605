"""Decompose the stage-2 (diffusion-prior) train step: where does the
time go, and does a bf16 frozen-flow forward help?

At the MNIST recipe (frozen L3/K4/w512 flow, dim-64 UNet x3 parts,
batch 64, T=1000) the step is: 5-bit preprocess + dequant -> frozen flow
forward (inference only — no backward, the latents are constants w.r.t.
the diffusion params) -> formater -> per-part UNet loss fwd+bwd -> Adam.
This tool times (a) the full step, (b) the flow forward alone, (c) the
diffusion losses fwd+bwd alone on fixed latents, and (d) the full step
with the frozen flow's couplings in bf16 (`coupling_dtype=bfloat16` —
legitimate for a frozen flow: it changes the latent values only at bf16
rounding scale, and the latents are training DATA for the prior, not a
parity surface).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_stage2_step.py
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(coupling_dtype="float32", dim=64, unet_dtype="float32"):
    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.models.diffusion_prior import DiffusionPrior
    from nfdpm_tpu.models.formaters import IdentityFormater
    from nfdpm_tpu.models.nf_backbone import NFBackbone
    from nfdpm_tpu.training import diffusion_trainer as dt

    cfg = glow_m.GlowConfig(in_channels=3, levels=3, steps=4,
                            coupling_width=512, scan_unroll=4,
                            coupling_dtype=coupling_dtype)
    backbone = NFBackbone(cfg=cfg, img_size=32, frozen=True)
    dp = DiffusionPrior(
        formater=IdentityFormater(L=3, in_channels=3, size=32),
        unet_kwargs={"dim": dim, "dim_mults": (1, 2),
                     "resnet_block_groups": 8, "dtype": unet_dtype},
        diffusion_kwargs={"timesteps": 1000, "beta_schedule": "cosine",
                          "loss_type": "l2"},
    )
    tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-3)
    tx = dt.make_two_group_optimizer(tcfg, frozen=True)
    state = dt.init_train_state(0, backbone, glow_m.init_glow(0, cfg), dp,
                                tx, ema=False)
    step = dt.make_train_step(backbone, dp, tcfg, tx)
    return backbone, dp, tcfg, tx, state, step


def timed(fn, *args, chain=50, reps=3, fetch=lambda out: None):
    out = fn(*args)
    fetch(out)  # compile + sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        fetch(out)
        times.append((time.perf_counter() - t0) / chain * 1e3)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--parity-steps", type=int, default=30)
    args = ap.parse_args()

    from nfdpm_tpu.ops import quantize as q
    from nfdpm_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    batch = jnp.asarray(np.random.default_rng(0).random(
        (args.batch, 32, 32, 3), np.float32))

    backbone, dp, tcfg, tx, state, step = build("float32", args.dim)

    # (a) full train step (stateful chain: state is donated and threaded)
    st = jax.tree.map(jnp.copy, state)

    def full_step():
        nonlocal st
        st, m = step(st, batch, key)
        return m["loss"]

    t_full = timed(lambda: full_step(), chain=args.chain,
                   fetch=lambda o: float(o))

    # (b) frozen flow forward alone (preprocess + dequant + transform)
    @jax.jit
    def flow_fwd(fp, b, k):
        x = q.preprocess(b, tcfg.n_bits)
        x = q.dequantize(k, x, tcfg.n_bits)
        latents, _ = backbone.transform(fp, x)
        return sum(jnp.sum(z) for z in latents)

    # device_put once — numpy leaves would re-ship ~44 MB of flow params
    # over the tunnel on EVERY dispatch and swamp the measurement
    fp = jax.device_put(state["params"]["flow"])
    t_flow = timed(lambda: flow_fwd(fp, batch, key), chain=args.chain,
                   fetch=lambda o: float(o))

    # (c) diffusion losses fwd+bwd + Adam on FIXED latents
    x = q.dequantize(key, q.preprocess(batch, tcfg.n_bits), tcfg.n_bits)
    latents, _ = backbone.transform(fp, x)
    latents = [jax.device_put(np.asarray(z)) for z in latents]

    def diff_loss(params, k):
        zs = dp.formater.process_latents(latents)
        losses = [p.loss(pp, jax.random.fold_in(k, i), z)
                  for i, (p, pp, z) in enumerate(
                      zip(dp.parts, params, zs))]
        return sum(losses)

    import optax
    dtx = optax.adam(1e-3)
    dparams = list(state["params"]["diffusion"]["parts"])
    dopt = dtx.init(dparams)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def diff_step(params, opt, k):
        loss, grads = jax.value_and_grad(diff_loss)(params, k)
        updates, opt = dtx.update(grads, opt, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt, loss

    dst = (dparams, dopt)

    def diff_chain():
        nonlocal dst
        p, o, loss = diff_step(dst[0], dst[1], key)
        dst = (p, o)
        return loss

    t_diff = timed(lambda: diff_chain(), chain=args.chain,
                   fetch=lambda o: float(o))

    # (d) full step, bf16 frozen-flow couplings
    *_, state_bf, step_bf = build("bfloat16", args.dim)
    st_bf = jax.tree.map(jnp.copy, state_bf)

    def full_bf():
        nonlocal st_bf
        st_bf, m = step_bf(st_bf, batch, key)
        return m["loss"]

    t_full_bf = timed(lambda: full_bf(), chain=args.chain,
                      fetch=lambda o: float(o))

    # (e) full step, bf16 UNet compute (fp32 master weights + fp32 flow) —
    # the model.diffusion.unet_dtype=bfloat16 training knob
    *_, state_ubf, step_ubf = build("float32", args.dim, "bfloat16")
    st_ubf = jax.tree.map(jnp.copy, state_ubf)

    def full_ubf():
        nonlocal st_ubf
        st_ubf, m = step_ubf(st_ubf, batch, key)
        return m["loss"]

    t_full_ubf = timed(lambda: full_ubf(), chain=args.chain,
                       fetch=lambda o: float(o))

    # loss-trajectory parity: N fresh steps from identical init/keys, fp32
    # UNet vs bf16 UNet (rel deviation per step; bf16 rounding scale ~1e-2)
    *_, pst32, pstep32 = build("float32", args.dim, "float32")
    *_, pst16, pstep16 = build("float32", args.dim, "bfloat16")
    devs = []
    for i in range(args.parity_steps):
        k = jax.random.fold_in(key, i)
        pst32, m32 = pstep32(pst32, batch, k)
        pst16, m16 = pstep16(pst16, batch, k)
        l32, l16 = float(m32["loss"]), float(m16["loss"])
        devs.append(abs(l16 - l32) / max(abs(l32), 1e-9))
    max_dev = max(devs) if devs else float("nan")

    print(f"stage-2 train step, batch {args.batch}, UNet dim {args.dim}, "
          f"frozen L3/K4/w512 flow:")
    print(f"  full step (fp32 flow)        : {t_full:8.3f} ms")
    print(f"  flow forward alone           : {t_flow:8.3f} ms "
          f"({t_flow / t_full * 100:.0f}% of full)")
    print(f"  diffusion fwd+bwd+adam alone : {t_diff:8.3f} ms "
          f"({t_diff / t_full * 100:.0f}% of full)")
    print(f"  full step (bf16 flow)        : {t_full_bf:8.3f} ms "
          f"({t_full / t_full_bf:.2f}x)")
    print(f"  full step (bf16 UNet)        : {t_full_ubf:8.3f} ms "
          f"({t_full / t_full_ubf:.2f}x)")
    print(f"  bf16-UNet loss-trajectory max rel dev over "
          f"{args.parity_steps} steps: {max_dev:.3e}")


if __name__ == "__main__":
    main()
