#!/usr/bin/env python
"""Oracle accounting for the multimodal-texture workload (VERDICT r4 item 1).

Two layers of evidence that the workload's non-Gaussian structure is real,
measurable, and irreducible by the stage-1 flow:

1. **Analytic** (no model): from the generative construction
   (tools/make_synthetic_multimodal.py — iid two-point mixture per pixel
   channel, 5-bit quantized), numerically compute
   * `floor_bpd`   — entropy of the 5-bit bin distribution = the minimum
     achievable BPD for ANY model under the reference BPD definition
     (trainer.py:244-256 semantics: a perfect model scores exactly H(bins)).
   * `linear_bpd`  — the best bpd achievable by ANY affine map + diagonal
     Gaussian prior = log2(n_bins) + 0.5*log2(2*pi*e*var(z)) per dim.
     Because pixels are iid, couplings condition on independent dims and
     provably converge to constants (docstring of the maker), so the whole
     Glow collapses to an affine map — `linear_bpd` is therefore the exact
     floor for the stage-1 exact-Gaussian bpd, however large the flow.
   * `margin = linear_bpd - floor_bpd` — the non-Gaussian structure (bits/dim)
     available to a diffusion prior but unreachable by the Gaussian prior.

2. **Measured** (--run-dir): push the test split through the trained flow,
   fit a diagonal Gaussian to train-split latents and score test latents
   (best-diag-fit bpd, cross-checks the trained exact-Gaussian bpd), and
   estimate the best FACTORIZED prior via per-dim histograms (a lower bound
   on what a perfect per-dim density model could reach in the latent basis).
   Dumps per-dim latent histograms to <run_dir>/results/latent_hist.png
   (the bimodality should be visible) when matplotlib is available.

Usage:
  python tools/oracle_multimodal.py                       # analytic only
  python tools/oracle_multimodal.py --run-dir outputs/... # + measured
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG2E = 1.0 / math.log(2.0)


def _norm_cdf(x):
    return 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))


def pixel_pmf(lo: float, hi: float, jitter: float) -> np.ndarray:
    """P(uint8 pixel = k), k=0..255, for the clipped mixture construction.
    uint8 cast truncates, so P(k) = P(k <= v < k+1) with edge clip masses."""
    edges = np.arange(257, dtype=np.float64)
    cdf = 0.5 * (_norm_cdf((edges - lo) / jitter) + _norm_cdf((edges - hi) / jitter))
    pmf = np.diff(cdf)
    pmf[0] += cdf[0]                      # clip mass below 0
    pmf[-1] += 1.0 - cdf[-1]              # clip mass at/above 255
    return pmf / pmf.sum()


def analytic(lo: float, hi: float, jitter: float, n_bits: int = 5):
    pmf = pixel_pmf(lo, hi, jitter)
    width = 1 << (8 - n_bits)
    n_bins = 1 << n_bits
    bins = pmf.reshape(n_bins, width).sum(axis=1)
    nz = bins[bins > 0]
    floor_bpd = float(-(nz * np.log2(nz)).sum())

    # dequantized scaled variable z = bin/n_bins - 0.5 + U(0, 1/n_bins)
    centers = (np.arange(n_bins) + 0.5) / n_bins - 0.5
    mean = float((bins * centers).sum())
    var = float((bins * centers**2).sum() - mean**2 + (1.0 / n_bins) ** 2 / 12.0)
    linear_bpd = n_bits + 0.5 * math.log2(2.0 * math.pi * math.e * var)
    return {"floor_bpd": floor_bpd, "linear_bpd": linear_bpd,
            "margin_bpd": linear_bpd - floor_bpd, "z_mean": mean, "z_var": var}


def measured(run_dir: str, batches: int, out_png: bool):
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.data.pipeline import read_dataset
    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.ops import quantize as q
    from nfdpm_tpu.training.runload import load_glow_run
    from nfdpm_tpu.utils.config import Config
    import yaml

    run = load_glow_run(run_dir)
    cfg = Config(yaml.safe_load(open(os.path.join(run_dir, "config.yaml"))))
    loaders = read_dataset(
        cfg.data.name, cfg.data.root, batch_size=int(cfg.data.batch_size),
        img_size=run.img_size, seed=int(cfg.seed))
    n_bits = run.tcfg.n_bits
    n_pix = run.img_size * run.img_size * run.gcfg.in_channels

    @jax.jit
    def latents_ldj(params, batch, key):
        x = q.preprocess(batch, n_bits)
        x = q.dequantize(key, x, n_bits)
        parts, ldj, _ = glow_m.forward(params["flow"], run.gcfg, x,
                                       with_logp=False)
        flat = jnp.concatenate([p.reshape(p.shape[0], -1) for p in parts], -1)
        return flat, ldj

    def collect(loader, max_batches, salt):
        zs, ldjs = [], []
        key = jax.random.PRNGKey(int(cfg.seed) + salt)
        for i, (xb, _) in enumerate(loader):
            if i >= max_batches:
                break
            z, ldj = latents_ldj(run.params, jnp.asarray(xb),
                                 jax.random.fold_in(key, i))
            zs.append(np.asarray(z))
            ldjs.append(np.asarray(ldj))
        return np.concatenate(zs), np.concatenate(ldjs)

    z_tr, _ = collect(loaders.eval, batches, salt=1)
    z_te, ldj_te = collect(loaders.test, batches, salt=2)

    mu, sd = z_tr.mean(0), z_tr.std(0) + 1e-12
    # diag-Gaussian fit logp on test
    logp_diag = (-0.5 * (((z_te - mu) / sd) ** 2
                         + np.log(2 * np.pi) + 2 * np.log(sd))).sum(1)
    diag_bpd = float(np.mean(
        (math.log(1 << n_bits) * n_pix - (logp_diag + ldj_te)) * LOG2E / n_pix))

    # best factorized prior: per-dim histogram density fit on train, score test
    nb = 64
    logp_hist = np.zeros(len(z_te))
    per_dim_gap = np.zeros(z_tr.shape[1])
    for d in range(z_tr.shape[1]):
        lo_, hi_ = z_tr[:, d].min(), z_tr[:, d].max()
        span = (hi_ - lo_) + 1e-9
        lo_, hi_ = lo_ - 0.05 * span, hi_ + 0.05 * span
        h, edges = np.histogram(z_tr[:, d], bins=nb, range=(lo_, hi_))
        dens = (h + 0.5) / ((h + 0.5).sum() * (edges[1] - edges[0]))
        idx = np.clip(np.searchsorted(edges, z_te[:, d]) - 1, 0, nb - 1)
        lp = np.log(dens[idx])
        logp_hist += lp
        g = (-0.5 * (((z_te[:, d] - mu[d]) / sd[d]) ** 2
                     + np.log(2 * np.pi) + 2 * np.log(sd[d])))
        per_dim_gap[d] = float((lp - g).mean()) * LOG2E
    hist_bpd = float(np.mean(
        (math.log(1 << n_bits) * n_pix - (logp_hist + ldj_te)) * LOG2E / n_pix))

    out = {"diag_fit_bpd": diag_bpd, "factorized_hist_bpd": hist_bpd,
           "measured_margin_bpd": diag_bpd - hist_bpd,
           "n_test": int(len(z_te)), "latent_dims": int(z_tr.shape[1]),
           "mean_per_dim_gap_bits": float(per_dim_gap.mean())}

    if out_png:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            worst = np.argsort(-per_dim_gap)[:8]
            fig, axes = plt.subplots(2, 4, figsize=(14, 6))
            for ax, d in zip(axes.ravel(), worst):
                ax.hist(z_te[:, d], bins=80, density=True, alpha=0.8)
                ax.set_title(f"dim {d}: gap {per_dim_gap[d]:.2f} bits")
            path = os.path.join(run_dir, "results", "latent_hist.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            fig.tight_layout()
            fig.savefig(path, dpi=110)
            out["hist_png"] = path
        except Exception as e:  # matplotlib optional
            out["hist_png_error"] = str(e)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=float, default=68.0)
    ap.add_argument("--hi", type=float, default=196.0)
    ap.add_argument("--jitter", type=float, default=8.0)
    ap.add_argument("--n-bits", type=int, default=5)
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--no-png", action="store_true")
    args = ap.parse_args()

    res = analytic(args.lo, args.hi, args.jitter, args.n_bits)
    if args.run_dir:
        res.update(measured(args.run_dir, args.batches, not args.no_png))
    import json
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
