#!/usr/bin/env python
"""Pixel-value histogram comparison for the multimodal workload
(docs/MULTIMODAL_WIN.md qualitative check).

Takes any number of `label=path` pairs where path is a samples.npz written
by tools/generate_samples.py (uint8 NHWC under key 'samples') or a
directory in CIFAR pickle layout (the dataset itself); overlays the pixel
histograms and reports each source's two-mode mass (fraction of pixels
within +-32 of the construction's 68/196 modes) as JSON.

Usage:
  python tools/pixel_hist.py data=/tmp/multimodal_synth \
      gaussian=/tmp/g.npz diffusion=/tmp/d.npz --out /tmp/pixel_hist.png
"""

import argparse
import json
import os
import pickle

import numpy as np


def load_pixels(path: str, limit: int = 64) -> np.ndarray:
    if os.path.isdir(path):
        p = os.path.join(path, "cifar10", "cifar-10-batches-py", "test_batch")
        with open(p, "rb") as f:
            d = pickle.load(f)
        return np.asarray(d[b"data"][:limit], np.uint8).ravel()
    arr = np.load(path)["samples"][:limit]
    return np.asarray(arr, np.uint8).ravel()


def two_mode_mass(px: np.ndarray, lo=68, hi=196, tol=32) -> float:
    near = ((np.abs(px.astype(np.int32) - lo) <= tol)
            | (np.abs(px.astype(np.int32) - hi) <= tol))
    return float(near.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sources", nargs="+", help="label=path pairs")
    ap.add_argument("--out", default="/tmp/pixel_hist.png")
    ap.add_argument("--limit", type=int, default=64)
    args = ap.parse_args()

    res = {}
    series = []
    for spec in args.sources:
        label, path = spec.split("=", 1)
        px = load_pixels(path, args.limit)
        res[label] = {"n_pixels": int(px.size),
                      "two_mode_mass": round(two_mode_mass(px), 4),
                      "mean": round(float(px.mean()), 1),
                      "std": round(float(px.std()), 1)}
        series.append((label, px))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 4))
        for label, px in series:
            ax.hist(px, bins=128, range=(0, 256), density=True, alpha=0.5,
                    label=label)
        ax.axvline(68, ls="--", c="k", lw=0.8)
        ax.axvline(196, ls="--", c="k", lw=0.8)
        ax.legend()
        ax.set_xlabel("pixel value")
        fig.tight_layout()
        fig.savefig(args.out, dpi=110)
        res["png"] = args.out
    except Exception as e:
        res["png_error"] = str(e)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
