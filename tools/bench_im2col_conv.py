"""Microbench: native conv vs im2col-matmul lowering for the coupling CNN's
first 3x3 conv at Glow's real shapes.

Motivation (BENCH.md CelebA floor analysis): the coupling convs' INPUT
channel counts are tiny (x_a has 6..96 channels across levels) and the TPU
MXU contracts over 128 lanes — a direct conv pads Cin up to 128, wasting
up to 95% of the contraction lanes on the first conv of every coupling.
im2col folds the 3x3 window into the contraction dim (9*Cin instead of
Cin), recovering up to 9x of those lanes, at the cost of materializing the
patch tensor (9x the activation bytes of x_a — small, since x_a is the
narrow tensor).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_im2col_conv.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def conv_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_im2col(x, w):
    """3x3 'same' conv as patch-extraction + one matmul: contraction dim is
    9*Cin (vs Cin padded to 128 by the native lowering)."""
    kh, kw, cin, cout = w.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches feature order is (cin, kh, kw) — match it
    wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin * kh * kw, cout)
    return patches @ wmat


def conv_im2col_concat(x, w):
    """Same math, patches via 9 padded shifts (no gather): XLA folds the
    pads/slices into the matmul's operand layout."""
    kh, kw, cin, cout = w.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, wd = x.shape[1], x.shape[2]
    shifts = [xp[:, i:i + h, j:j + wd, :] for i in range(kh) for j in range(kw)]
    patches = jnp.concatenate(shifts, axis=-1)  # (kh,kw,cin) order
    wmat = w.reshape(kh * kw * cin, cout)
    return patches @ wmat


def bench(fn, x, w, reps=5, chain=2000):
    """Chained timing: each step's input depends on the previous output
    (slice back to Cin, zero, re-add x) so steps serialize on-device."""
    cin = x.shape[-1]

    @jax.jit
    def chained(z):
        def body(z, _):
            # *1e-30 (not *0: XLA would fold the conv away) keeps a real
            # data dependency between steps at negligible cost
            z = fn(z, w)[..., :cin] * 1e-30 + x
            return z, ()
        return jax.lax.scan(body, z, (), length=chain)[0]

    chained(x).block_until_ready()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        chained(x).block_until_ready()
        times.append((time.perf_counter() - t0) / chain * 1e3)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    # (H, Cin) per Glow level — CelebA-128 L5 (left) and MNIST-32 L3 shapes
    shapes = [(64, 6), (32, 12), (16, 24), (8, 48), (4, 96),
              (16, 6), (8, 12), (4, 24)]
    width = 512
    rng = np.random.default_rng(0)
    print(f"batch={args.batch} dtype={args.dtype} width={width}")
    print(f"{'HxW':>6} {'Cin':>4} | {'native':>8} {'im2col':>8} "
          f"{'shifts':>8} (ms)  max|d|")
    for h, cin in shapes:
        x = jnp.asarray(rng.normal(size=(args.batch, h, h, cin)), dt)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, width)) * 0.05, dt)
        yn = jax.jit(conv_native)(x, w)
        yi = jax.jit(conv_im2col)(x, w)
        ys = jax.jit(conv_im2col_concat)(x, w)
        d = max(float(jnp.max(jnp.abs(yn - yi))),
                float(jnp.max(jnp.abs(yn - ys))))
        tn = bench(conv_native, x, w)
        ti = bench(conv_im2col, x, w)
        ts = bench(conv_im2col_concat, x, w)
        print(f"{h:>4}^2 {cin:>4} | {tn:8.3f} {ti:8.3f} {ts:8.3f}"
              f"       {d:.2e}  (im2col {tn/ti:.2f}x, shifts {tn/ts:.2f}x)")


if __name__ == "__main__":
    main()
