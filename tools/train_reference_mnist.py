#!/usr/bin/env python
"""Train the PyTorch reference Glow on the same MNIST-format dataset the
nfdpm_tpu CLI trains on, with the reference's exact recipe — the end-to-end
comparison anchor for VERDICT round-1 item #4.

Replicates /root/reference/normalizing_flow/trainer.py:147-250 at reduced
scale on CPU: 5-bit preprocess + uniform dequant, Glow L3/K4 + GaussianPrior,
Adam, clip-value(1)-then-clip-norm(1), ddinit on the first batch, final
train/test BPD with single-sample dequantization (calculate_bpd,
trainer.py:21-55). Data: the idx files from tools/make_synthetic_mnist.py,
padded 28->32 (the train-path Pad transform, utils.py:155-156).

Usage:
    python tools/make_synthetic_mnist.py --root /tmp/mnist_synth
    python tools/train_reference_mnist.py --root /tmp/mnist_synth \
        --epochs 10 --batch-size 64 --lr 1e-3
"""

import argparse
import gzip
import json
import os
import struct
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def read_idx_split(root, prefix):
    raw = os.path.join(root, "MNIST", "raw")
    with gzip.open(os.path.join(raw, f"{prefix}-images-idx3-ubyte.gz"), "rb") as f:
        magic, n, h, w = struct.unpack(">IIII", f.read(16))
        assert magic == 0x803
        imgs = np.frombuffer(f.read(), np.uint8).reshape(n, h, w)
    with gzip.open(os.path.join(raw, f"{prefix}-labels-idx1-ubyte.gz"), "rb") as f:
        magic, n = struct.unpack(">II", f.read(8))
        labels = np.frombuffer(f.read(), np.uint8)
    return imgs, labels


def pad32(imgs):
    return np.pad(imgs, ((0, 0), (2, 2), (2, 2)))


def resize32(imgs):
    """torchvision Resize(32) semantics (PIL bilinear on uint8) — the
    reference's TEST transform for MNIST (utils.py:164), used by its test
    AND eval loaders (dataset.py:85-88) while training uses Pad(2)."""
    from PIL import Image

    out = np.empty((len(imgs), 32, 32), np.uint8)
    for i, im in enumerate(imgs):
        out[i] = np.asarray(Image.fromarray(im).resize((32, 32), Image.BILINEAR))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-bits", type=int, default=5)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import torch

    from measure_reference_baseline import _load_reference_glow, _stub_external_modules

    torch.set_num_threads(os.cpu_count() or 1)
    _stub_external_modules()
    glow_ref = _load_reference_glow("/root/reference")
    prior_ref = sys.modules["nf_ref.prior"]
    utils_ref = sys.modules["nf_ref.utils"]

    n_bins = 2.0 ** args.n_bits
    n_pixel = 32 * 32 * 3.0  # reference n_pixel bug (trainer.py:134)

    tr_imgs, _ = read_idx_split(args.root, "train")
    te_imgs, _ = read_idx_split(args.root, "t10k")
    # [N, 1, 32, 32] in [0,1] (ToTensor); train = Pad(2), eval = Resize(32)
    # exactly like the reference's transforms
    x_train = pad32(tr_imgs)[:, None].astype(np.float32) / 255.0
    x_train_eval = resize32(tr_imgs)[:, None].astype(np.float32) / 255.0
    x_test = resize32(te_imgs)[:, None].astype(np.float32) / 255.0

    torch.manual_seed(args.seed)
    model = glow_ref.Glow(in_channel=1, L=3, K=4)
    gp = prior_ref.GaussianPrior(2 ** 4 * 1)
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)

    bs = args.batch_size
    rng = np.random.default_rng(args.seed)

    # ddinit (trainer.py:138; utils.py:275-292)
    first = torch.from_numpy(x_train[:bs])
    with torch.no_grad():
        xb = utils_ref.preprocess_batch(first, args.n_bits, n_bins)
        model.transform(xb + torch.rand_like(xb) / n_bins,
                        torch.zeros(bs, dtype=torch.float64),
                        torch.zeros(bs, dtype=torch.float64))

    model.train()
    n = len(x_train)
    steps_per_epoch = n // bs
    t_start = time.time()
    for epoch in range(1, args.epochs + 1):
        perm = rng.permutation(n)
        running = []
        for b in range(steps_per_epoch):
            batch = torch.from_numpy(x_train[perm[b * bs:(b + 1) * bs]])
            x = utils_ref.preprocess_batch(batch, args.n_bits, n_bins)
            x = x + torch.rand_like(x) / n_bins
            ll = torch.zeros(bs, dtype=torch.float64)
            logp = torch.zeros(bs, dtype=torch.float64)
            latents, ll, logp = model.transform(x, ll, logp)
            logp = logp + gp.compute_log_prob(latents[-1])
            loss = utils_ref.calculate_loss(ll + logp, n_bins, n_pixel)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_value_(model.parameters(), 1)
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1)
            opt.step()
            running.append(float(loss.detach()))
        print(f"epoch {epoch}: train bpd {np.mean(running):.4f} "
              f"({time.time() - t_start:.0f}s elapsed)", flush=True)

    # final eval: single-dequant-sample BPD (calculate_bpd, trainer.py:21-55)
    model.eval()

    def eval_bpd(x_all):
        total, count = 0.0, 0
        with torch.no_grad():
            for b in range(0, len(x_all), bs):
                batch = torch.from_numpy(x_all[b:b + bs])
                m = len(batch)
                x = utils_ref.preprocess_batch(batch, args.n_bits, n_bins)
                x = x + torch.rand_like(x) / n_bins
                ll = torch.zeros(m, dtype=torch.float64)
                logp = torch.zeros(m, dtype=torch.float64)
                latents, ll, logp = model.transform(x, ll, logp)
                logp = logp + gp.compute_log_prob(latents[-1])
                bpd = (np.log(n_bins) * n_pixel - (ll + logp)) * (
                    np.log2(np.e) / n_pixel)
                total += float(bpd.sum())
                count += m
        return total / count

    result = {
        "framework": "pytorch_reference_cpu",
        "recipe": {"L": 3, "K": 4, "epochs": args.epochs, "batch_size": bs,
                   "lr": args.lr, "n_bits": args.n_bits, "seed": args.seed,
                   "n_train": int(n), "n_test": int(len(x_test))},
        "bpd_train": round(eval_bpd(x_train_eval), 4),
        "bpd_test": round(eval_bpd(x_test), 4),
        "wallclock_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
