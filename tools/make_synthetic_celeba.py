#!/usr/bin/env python
"""Construct a CelebA-format dataset offline (zero-egress environment).

Writes the REAL aligned-CelebA on-disk layout the reader expects
(/root/reference/data/utils.py:15-30, dataset.py:118-131):
`root/celeba/img_align_celeba/img_align_celeba/NNNNNN.jpg` 178x218 JPEGs
plus `root/celeba/list_eval_partition.csv` (image_id,partition with
0=train / 1=val / 2=test), so the CLI path (`data.name=celeba
data.root=... data.img_size=...`) exercises the JPEG-decode + partition-CSV
+ resize reader end-to-end exactly as on the real download.

Content is procedural "portraits": a skin-toned face oval with eyes/mouth
over a colored gradient background, varied per sample — structured enough
for a short training run; no claim of visual realism.

Usage: python tools/make_synthetic_celeba.py --root /tmp/celeba_synth \
           [--n-train 512] [--n-val 64] [--n-test 128] [--seed 0]
"""

import argparse
import csv
import os

import numpy as np
from PIL import Image

W, H = 178, 218  # real aligned-CelebA dimensions


def render_face(rng: np.random.Generator) -> np.ndarray:
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    # gradient background with a random hue
    bg = rng.uniform(60, 180, 3).astype(np.float32)
    grad = (yy / H)[..., None] * rng.uniform(-50, 50, 3).astype(np.float32)
    img = bg + grad + rng.normal(0, 6, (H, W, 3)).astype(np.float32)
    # face oval (aligned faces are centered; jitter a little)
    cx = W / 2 + rng.uniform(-8, 8)
    cy = H * 0.45 + rng.uniform(-10, 10)
    rx, ry = rng.uniform(45, 60), rng.uniform(62, 80)
    face = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
    skin = np.array([200, 160, 130], np.float32) * rng.uniform(0.75, 1.15)
    img[face] = skin + rng.normal(0, 4, (int(face.sum()), 3))
    # eyes: dark discs at fixed face-relative offsets
    for sx in (-0.42, 0.42):
        ex, ey = cx + sx * rx, cy - 0.25 * ry
        eye = ((xx - ex) ** 2 + (yy - ey) ** 2) <= rng.uniform(4, 6) ** 2
        img[eye] = rng.uniform(20, 60)
    # mouth: dark horizontal bar
    mx, my = cx, cy + 0.5 * ry
    mouth = (np.abs(xx - mx) <= rng.uniform(12, 20)) & (np.abs(yy - my) <= 3)
    img[mouth] = np.array([150, 60, 60], np.float32) * rng.uniform(0.6, 1.1)
    # hair: darken above the oval top
    hair = (yy < cy - 0.55 * ry) & (((xx - cx) / (rx * 1.25)) ** 2
                                    + ((yy - (cy - 0.2 * ry)) / (ry * 1.1)) ** 2 <= 1.0)
    img[hair] = rng.uniform(30, 90, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=512)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--n-test", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    img_dir = os.path.join(args.root, "celeba", "img_align_celeba", "img_align_celeba")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    idx = 0
    for part, n in ((0, args.n_train), (1, args.n_val), (2, args.n_test)):
        for _ in range(n):
            idx += 1
            name = f"{idx:06d}.jpg"
            Image.fromarray(render_face(rng)).save(
                os.path.join(img_dir, name), quality=95)
            rows.append((name, part))
    with open(os.path.join(args.root, "celeba", "list_eval_partition.csv"),
              "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_id", "partition"])
        w.writerows(rows)
    print(f"wrote {args.n_train}/{args.n_val}/{args.n_test} "
          f"train/val/test CelebA-format JPEGs to {img_dir}")


if __name__ == "__main__":
    main()
