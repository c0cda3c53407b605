#!/usr/bin/env python
"""Co-train the same tiny Glow in the PyTorch reference and nfdpm_tpu and
return both BPD trajectories.

Shared harness for tests/test_parity_training.py (CI assertion) and the
docs/training_parity_bpd.png curve plot (run this file directly).

Both sides get identical initial weights (the torch post-ddinit state is
imported with invconv_param="full" — Adam is not invariant to the PLU
reparameterization), identical deterministic batches, identical injected
dequantization noise, Adam lr, and the reference's
clip-value(1)-then-clip-norm(1) order
(/root/reference/normalizing_flow/trainer.py:147-167).
"""

import os
import sys

import numpy as np

REF = "/root/reference"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cotrain(n_steps: int = 120, L: int = 2, K: int = 2, C: int = 3,
            size: int = 16, batch: int = 8, n_bits: int = 5, lr: float = 1e-3,
            seed: int = 7):
    """Returns (bpd_ref, bpd_jax) numpy arrays of length n_steps."""
    import torch

    from measure_reference_baseline import _load_reference_glow, _stub_external_modules

    _stub_external_modules()
    glow_ref = _load_reference_glow(REF)
    prior_ref = sys.modules["nf_ref.prior"]
    utils_ref = sys.modules["nf_ref.utils"]

    n_bins = 2.0 ** n_bits
    n_pixel = size * size * 3.0  # reference n_pixel bug kept (trainer.py:134)

    rng = np.random.default_rng(seed)
    batches = (rng.integers(0, 256, (n_steps, batch, C, size, size)) / 255.0
               ).astype(np.float32)
    noise = rng.random((n_steps, batch, C, size, size), dtype=np.float32)
    init_batch = (rng.integers(0, 256, (batch, C, size, size)) / 255.0
                  ).astype(np.float32)
    init_noise = rng.random((batch, C, size, size), dtype=np.float32)

    # ---- reference: build + ddinit (lazy actnorm init on one batch) ----
    torch.manual_seed(0)
    model = glow_ref.Glow(in_channel=C, L=L, K=K)
    gp = prior_ref.GaussianPrior(2 ** (L + 1) * C)
    with torch.no_grad():
        x0 = utils_ref.preprocess_batch(torch.from_numpy(init_batch), n_bits, n_bins)
        model.transform(
            x0 + torch.from_numpy(init_noise) / n_bins,
            torch.zeros(batch, dtype=torch.float64),
            torch.zeros(batch, dtype=torch.float64),
        )
    sd_flow = {k: v.clone() for k, v in model.state_dict().items()}
    sd_prior = {k: v.clone() for k, v in gp.state_dict().items()}

    # ---- reference training loop (trainer.py:147-167 semantics) ----
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    model.train()
    bpd_ref = []
    for t in range(n_steps):
        b = torch.from_numpy(batches[t])
        x = utils_ref.preprocess_batch(b, n_bits, n_bins) + (
            torch.from_numpy(noise[t]) / n_bins
        )
        ll = torch.zeros(batch, dtype=torch.float64)
        logp = torch.zeros(batch, dtype=torch.float64)
        latents, ll, logp = model.transform(x, ll, logp)
        logp = logp + gp.compute_log_prob(latents[-1])
        loss = utils_ref.calculate_loss(ll + logp, n_bins, n_pixel)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_value_(model.parameters(), 1)
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1)
        opt.step()
        bpd_ref.append(float(loss.detach()))

    # ---- nfdpm_tpu: import the post-ddinit state, train with the REAL step --
    import jax.numpy as jnp

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.training.nf_trainer import NFTrainConfig, make_train_step
    from nfdpm_tpu.training.optim import make_optimizer
    from nfdpm_tpu.utils.reference_import import (
        import_gaussian_prior_state_dict,
        import_glow_state_dict,
    )

    cfg = glow_m.GlowConfig(in_channels=C, levels=L, steps=K, invconv_param="full")
    tcfg = NFTrainConfig(lr=lr, n_bits=n_bits, compat_three_channel_bpd=True,
                         compat_fixed_prior=True)
    tx = make_optimizer("adam", lr, clip_value=1.0, clip_norm=1.0, fixed_prior=True)
    params = {
        "flow": import_glow_state_dict(sd_flow, L, K, invconv_param="full"),
        "prior": import_gaussian_prior_state_dict(sd_prior),
    }
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32)}
    step = make_train_step(cfg, tcfg, tx, inject_noise=True)

    batches_nhwc = batches.transpose(0, 1, 3, 4, 2)
    noise_nhwc = noise.transpose(0, 1, 3, 4, 2)
    bpd_jax = []
    for t in range(n_steps):
        state, metrics = step(state, jnp.asarray(batches_nhwc[t]),
                              jnp.asarray(noise_nhwc[t]))
        bpd_jax.append(float(metrics["bpd"]))

    return np.asarray(bpd_ref), np.asarray(bpd_jax)


def main():
    import json

    # Parity is an fp32 exercise: run JAX on CPU (same arithmetic as the
    # torch reference). On TPU the default-precision coupling convs round
    # through bf16 and the per-step error grows to ~4e-3 (still tiny).
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    bpd_ref, bpd_jax = cotrain(n_steps=200)
    err = np.abs(bpd_ref - bpd_jax)
    print(f"steps: {len(bpd_ref)}")
    print(f"bpd[0]   ref {bpd_ref[0]:.5f}  jax {bpd_jax[0]:.5f}")
    print(f"bpd[-1]  ref {bpd_ref[-1]:.5f}  jax {bpd_jax[-1]:.5f}")
    print(f"|err| max {err.max():.2e}  median {np.median(err):.2e}  "
          f"first20 max {err[:20].max():.2e}")

    docs = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs")
    os.makedirs(docs, exist_ok=True)
    with open(os.path.join(docs, "training_parity_bpd.json"), "w") as f:
        json.dump({"bpd_ref": bpd_ref.tolist(), "bpd_jax": bpd_jax.tolist()}, f)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
        steps = np.arange(len(bpd_ref))
        ax1.plot(steps, bpd_ref, label="PyTorch reference", lw=1.8)
        ax1.plot(steps, bpd_jax, label="nfdpm_tpu (JAX)", lw=1.2, ls="--")
        ax1.set_xlabel("optimizer step")
        ax1.set_ylabel("bits/dim")
        ax1.set_title("Co-trained BPD (identical weights+noise)")
        ax1.legend()
        ax2.semilogy(steps, np.maximum(err, 1e-12), lw=1.0, color="#444")
        ax2.axhline(1e-3, color="r", ls=":", label="1e-3 target")
        ax2.set_xlabel("optimizer step")
        ax2.set_ylabel("|bpd_ref - bpd_jax|")
        ax2.set_title("Per-step trajectory error")
        ax2.legend()
        fig.tight_layout()
        out = os.path.join(docs, "training_parity_bpd.png")
        fig.savefig(out, dpi=130)
        print(f"saved {out}")
    except ImportError:
        print("matplotlib unavailable; JSON only")


if __name__ == "__main__":
    main()
