#!/usr/bin/env python
"""Construct a CIFAR-10-format dataset offline (zero-egress environment).

Renders class-consistent colored structured images (per-class hue + 7-segment
glyph from tools/make_synthetic_mnist.py, over a textured background) into
the REAL cifar-10-batches-py pickle layout (5 train batches + test_batch,
b"data" [N, 3072] uint8 row-major CHW, b"labels"), so the CLI path
(`data.name=cifar10 data.root=...`) runs end-to-end exactly as on the real
dataset (/root/reference/data/dataset.py:39).

Usage: python tools/make_synthetic_cifar10.py --root /tmp/cifar_synth \
           [--per-batch 256] [--n-test 256] [--seed 0]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_synthetic_mnist import render_digit  # noqa: E402

# one hue per class, applied multiplicatively per channel
_CLASS_RGB = np.array([
    [1.0, 0.3, 0.3], [0.3, 1.0, 0.3], [0.3, 0.3, 1.0], [1.0, 1.0, 0.3],
    [1.0, 0.3, 1.0], [0.3, 1.0, 1.0], [1.0, 0.7, 0.3], [0.7, 0.3, 1.0],
    [0.6, 1.0, 0.6], [1.0, 0.6, 0.8],
], np.float32)


def render_sample(cls: int, rng: np.random.Generator) -> np.ndarray:
    glyph = render_digit(cls, rng).astype(np.float32)  # [28, 28]
    canvas = np.zeros((32, 32), np.float32)
    r0, c0 = rng.integers(0, 5, 2)
    canvas[r0:r0 + 28, c0:c0 + 28] = glyph
    bg = rng.normal(40.0, 15.0, (32, 32, 3)).astype(np.float32)
    img = bg + canvas[..., None] * _CLASS_RGB[cls] * rng.uniform(0.7, 1.0)
    return np.clip(img, 0, 255).astype(np.uint8)  # [32, 32, 3] HWC


def make_batch(n: int, rng: np.random.Generator):
    labels = rng.integers(0, 10, n).astype(np.int64)
    imgs = np.stack([render_sample(int(c), rng) for c in labels])  # NHWC
    data = imgs.transpose(0, 3, 1, 2).reshape(n, 3072)  # CHW row-major
    return data, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--per-batch", type=int, default=256)
    ap.add_argument("--n-test", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    base = os.path.join(args.root, "cifar10", "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    for i in range(1, 6):
        data, labels = make_batch(args.per_batch, rng)
        with open(os.path.join(base, f"data_batch_{i}"), "wb") as f:
            pickle.dump({b"data": data, b"labels": labels.tolist()}, f)
    data, labels = make_batch(args.n_test, rng)
    with open(os.path.join(base, "test_batch"), "wb") as f:
        pickle.dump({b"data": data, b"labels": labels.tolist()}, f)
    print(f"wrote 5x{args.per_batch} train + {args.n_test} test CIFAR-format "
          f"samples to {base}")


if __name__ == "__main__":
    main()
