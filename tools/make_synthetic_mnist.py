#!/usr/bin/env python
"""Construct an MNIST-format dataset offline (zero-egress environment).

Renders 7-segment-style digits (class-consistent, spatially structured, and
genuinely learnable — unlike uniform noise, a flow can compress these) into
REAL MNIST idx files (gzip, magic 0x803/0x801, 28x28 uint8), so the full CLI
path (`data.name=mnist data.root=...`) runs end-to-end exactly as it would on
the real dataset (/root/reference/data/get_datasets.sh analogue).

Usage: python tools/make_synthetic_mnist.py --root /tmp/mnist_synth \
           --n-train 2048 --n-test 512 [--seed 0]
"""

import argparse
import gzip
import os
import struct

import numpy as np

# 7-segment layout on a 28x28 canvas:  segments a-g
#      aaaa
#     f    b
#     f    b
#      gggg
#     e    c
#     e    c
#      dddd
_SEGS = {
    "a": (3, 6, 8, 20), "b": (5, 14, 18, 21), "c": (14, 23, 18, 21),
    "d": (22, 25, 8, 20), "e": (14, 23, 6, 9), "f": (5, 14, 6, 9),
    "g": (13, 16, 8, 20),
}
_DIGIT_SEGS = {
    0: "abcdef", 1: "bc", 2: "abged", 3: "abgcd", 4: "fgbc",
    5: "afgcd", 6: "afgedc", 7: "abc", 8: "abcdefg", 9: "abcdfg",
}


def render_digit(digit: int, rng: np.random.Generator) -> np.ndarray:
    img = np.zeros((28, 28), np.float32)
    on = rng.uniform(170.0, 255.0)
    for s in _DIGIT_SEGS[digit]:
        r0, r1, c0, c1 = _SEGS[s]
        img[r0:r1, c0:c1] = on * rng.uniform(0.85, 1.0)
    # random shift +-3 px
    dr, dc = rng.integers(-3, 4, 2)
    img = np.roll(np.roll(img, dr, axis=0), dc, axis=1)
    # 3x3 box blur for soft strokes (MNIST-ish anti-aliasing)
    p = np.pad(img, 1)
    img = sum(p[i:i + 28, j:j + 28] for i in range(3) for j in range(3)) / 9.0
    # stroke-masked sensor noise: the background stays EXACTLY black, like
    # real MNIST — important because the reference trains on Pad(2)ed digits
    # but evaluates on Resize(32)d ones (utils.py:155-164); a noisy
    # background would make that train/eval distribution gap catastrophic
    # instead of the mild one the real dataset has.
    img = img + rng.normal(0.0, 4.0, (28, 28)) * (img > 1.0)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_split(n: int, rng: np.random.Generator):
    labels = rng.integers(0, 10, n).astype(np.uint8)
    images = np.stack([render_digit(int(d), rng) for d in labels])
    return images, labels


def write_idx(root: str, prefix: str, images: np.ndarray, labels: np.ndarray):
    raw = os.path.join(root, "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    n = images.shape[0]
    with gzip.open(os.path.join(raw, f"{prefix}-images-idx3-ubyte.gz"), "wb") as f:
        f.write(struct.pack(">IIII", 0x803, n, 28, 28) + images.tobytes())
    with gzip.open(os.path.join(raw, f"{prefix}-labels-idx1-ubyte.gz"), "wb") as f:
        f.write(struct.pack(">II", 0x801, n) + labels.tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=2048)
    ap.add_argument("--n-test", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    tr_imgs, tr_lbls = make_split(args.n_train, rng)
    te_imgs, te_lbls = make_split(args.n_test, rng)
    write_idx(args.root, "train", tr_imgs, tr_lbls)
    write_idx(args.root, "t10k", te_imgs, te_lbls)
    print(f"wrote {args.n_train} train / {args.n_test} test digits to "
          f"{args.root}/MNIST/raw")


if __name__ == "__main__":
    main()
