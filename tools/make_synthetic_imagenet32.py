#!/usr/bin/env python
"""Construct an ImageNet32/64-format dataset offline (zero-egress environment).

Writes the REAL downsampled-ImageNet pickle layout the reader expects
(/root/reference/data/utils.py:96-122): at res 32,
`root/imagenet32/train/train_data_batch_{1..10}` + `root/imagenet32/val/
val_data`; at res 64 the train split is the single `train/train_data` file
(the reference's own 10-batch branch is res-32-only). Each pickle is a dict
with "data" [N, 3*res*res] uint8 in channel-PLANAR order (res*res R pixels,
then G, then B — row-major within each plane) and 1-indexed "labels", so
the CLI path (`data.name=imagenet32|imagenet64 data.root=...`) runs
end-to-end exactly as on the real download (data/get_datasets.sh:1-20).

Content is class-consistent colored glyphs over textured noise (same
renderer as the CIFAR maker) — structured enough to train on, honest about
its ~2.5-bpd noise floor.

Usage: python tools/make_synthetic_imagenet32.py --root /tmp/in32_synth \
           [--per-batch 256] [--n-val 512] [--seed 0]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_synthetic_cifar10 import render_sample  # noqa: E402


def make_batch(n: int, rng: np.random.Generator, res: int = 32):
    labels = rng.integers(0, 10, n).astype(np.int64)
    imgs = np.stack([render_sample(int(c), rng) for c in labels])  # NHWC u8
    if res != 32:  # nearest-neighbor upscale of the 32x32 glyph renderer
        k = res // 32
        imgs = imgs.repeat(k, axis=1).repeat(k, axis=2)
    # channel-planar rows: [N, 3, res, res] -> [N, 3*res*res]
    data = imgs.transpose(0, 3, 1, 2).reshape(n, 3 * res * res)
    return data, (labels + 1).tolist()  # real ImageNet labels are 1-indexed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--res", type=int, default=32, choices=(32, 64))
    ap.add_argument("--per-batch", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    base = os.path.join(args.root, f"imagenet{args.res}")
    os.makedirs(os.path.join(base, "train"), exist_ok=True)
    os.makedirs(os.path.join(base, "val"), exist_ok=True)
    if args.res == 32:  # 10 train batch files, reference-exact
        for i in range(1, 11):
            data, labels = make_batch(args.per_batch, rng, args.res)
            with open(os.path.join(base, "train",
                                   f"train_data_batch_{i}"), "wb") as f:
                pickle.dump({"data": data, "labels": labels}, f)
        train_desc = f"10x{args.per_batch}"
    else:  # res 64: single train_data file (utils.py:105-111 else-branch)
        data, labels = make_batch(args.per_batch, rng, args.res)
        with open(os.path.join(base, "train", "train_data"), "wb") as f:
            pickle.dump({"data": data, "labels": labels}, f)
        train_desc = str(args.per_batch)
    data, labels = make_batch(args.n_val, rng, args.res)
    with open(os.path.join(base, "val", "val_data"), "wb") as f:
        pickle.dump({"data": data, "labels": labels}, f)
    print(f"wrote {train_desc} train + {args.n_val} val "
          f"ImageNet{args.res}-format samples to {base}")


if __name__ == "__main__":
    main()
