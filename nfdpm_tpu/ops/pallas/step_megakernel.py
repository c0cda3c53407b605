"""Pallas TPU megakernel: one ENTIRE Glow step (actnorm+invconv channel mix
-> coupling CNN -> affine tail + logdet) fused per batch tile.

Motivation (STATUS round-1 profiler note): the block-0 K-step scan dominates
device time, and XLA's per-op schedule writes/reads the 512-wide coupling
hidden activations to HBM twice per step (~130 MB per step-flow at MNIST
block-0 shape). This kernel keeps BOTH hidden layers resident in VMEM:
HBM traffic collapses to one read of x and one write of (y, ldj-partials).

Layout: everything is 2D [N, C] with N = TB*H*W flattened pixels (Mosaic
rejects unaligned 4D<->2D shape casts in-kernel, so the flatten happens
outside). A 3x3 conv tap (dh, dw) is a ROW shift by dh*W + dw of the 2D
block plus an iota mask built from row = (n // W) % H and col = n % W —
zeroing both the same-padding border and any cross-image bleed:

    y    = x @ Wf^T + bf                       # folded actnorm+invconv (MXU)
    y_a, x_b = split(y)
    h1   = relu(e^{s1} (conv3x3(y_a, w1) + b1))    # 9 shifted matmuls
    h2   = relu(e^{s2} (h1 @ w2 + b2))             # 1x1 conv = one matmul
    net  = (conv3x3(h2, wz) + bz) * e^{3*logs}     # zeroconv
    ls, t = split(net); scale = sigmoid(ls + 2)
    y_b  = (x_b + t) * scale
    row_ldj[n] = sum_c log(scale + 1e-6)       # per-pixel partial; the [B]
                                               # reduction happens outside

EXPERIMENTAL, NOT WIRED — measured verdict (BENCH.md "Megakernel
experiment"): 5x SLOWER than XLA at the block-0 MNIST shape on v5e (VMEM
forces tile_b=2 once both 512-wide hiddens are resident, and the 9-tap
matmul formulation wastes MXU lanes at Cin=6/Cout=12, while XLA's conv
layouts already avoid most inter-op HBM traffic). Kept as a tested,
numerically-exact experiment (tests/test_pallas_kernels.py::
TestStepMegakernel); the production Pallas path is the 2-kernel
GlowConfig.use_pallas route (bijectors.step_forward_pallas).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

_EPS = 1e-6


def _conv3x3_2d(x2d, w_taps, h: int, w: int):
    """x2d: [N, Cin] flattened (TB, H, W) pixels; w_taps: [9, Cin, Cout]
    (tap order (dh+1)*3+(dw+1)). Returns [N, Cout]: same-padded 3x3 conv as
    9 row-shifted MXU matmuls with border/cross-image masking."""
    n, cin = x2d.shape
    cout = w_taps.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    row = (idx // w) % h
    col = idx % w
    acc = jnp.zeros((n, cout), jnp.float32)
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            tap = (dh + 1) * 3 + (dw + 1)
            shift = dh * w + dw
            xs = pltpu.roll(x2d, (-shift) % n, 0) if shift else x2d
            valid = jnp.ones((n, 1), jnp.bool_)
            if dh:
                valid = valid & (row + dh >= 0) & (row + dh < h)
            if dw:
                valid = valid & (col + dw >= 0) & (col + dw < w)
            if dh or dw:
                xs = jnp.where(valid, xs, 0.0)
            acc = acc + jnp.dot(xs, w_taps[tap],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    return acc


def _make_kernel(h: int, w: int, half: int):
    def _kernel(x_ref, wf_ref, bf_ref, w1_ref, a1s_ref, a1b_ref, w2_ref,
                a2s_ref, a2b_ref, wz_ref, bz_ref, zl_ref, y_ref, ldj_ref):
        x = x_ref[:]                              # [N, C]
        # 1. folded actnorm + 1x1 conv
        y = jnp.dot(x, wf_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + bf_ref[:]
        y_a, x_b = y[:, :half], y[:, half:]

        # 2. coupling CNN, hidden resident in VMEM
        h1 = _conv3x3_2d(y_a, w1_ref[:], h, w)
        h1 = jnp.maximum(jnp.exp(a1s_ref[:]) * (h1 + a1b_ref[:]), 0.0)
        h2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        h2 = jnp.maximum(jnp.exp(a2s_ref[:]) * (h2 + a2b_ref[:]), 0.0)
        net = _conv3x3_2d(h2, wz_ref[:], h, w)
        net = (net + bz_ref[:]) * jnp.exp(zl_ref[:] * 3.0)

        # 3. affine tail + per-pixel logdet partials
        ls, t = net[:, :half], net[:, half:]
        scale = jax.nn.sigmoid(ls + 2.0)
        y_b = (x_b + t) * scale
        y_ref[:] = jnp.concatenate([y_a, y_b], axis=1)
        ldj_ref[:] = jnp.sum(jnp.log(scale + _EPS), axis=1, keepdims=True)

    return _kernel


def _taps(w):
    """HWIO [3, 3, Cin, Cout] -> [9, Cin, Cout] tap-major."""
    return jnp.asarray(w, jnp.float32).reshape(9, w.shape[2], w.shape[3])


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def step_megakernel_forward(x, w_fold, b_fold, net: Params,
                            tile_b: int = 8, interpret: bool = False):
    """x: [B, H, W, C] -> (y [B, H, W, C], ldj_part [B]).

    `net` is the coupling-CNN param tree (ops/coupling.init_coupling_net).
    The per-pixel channel-mix logdet term (H*W*(sum s + log|det W|)) is NOT
    included — the caller adds it like fused_actnorm_invconv_forward does.
    """
    b, h, w, c = x.shape
    pad_b = (-b) % tile_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
    bb = b + pad_b
    tile_n = tile_b * h * w

    w1 = _taps(net["conv1"]["w"])
    w2 = jnp.asarray(net["conv2"]["w"], jnp.float32)[0, 0]
    wz = _taps(net["zconv"]["w"])
    width = w1.shape[-1]

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    y2d, ldj_rows = pl.pallas_call(
        _make_kernel(h, w, c // 2),
        grid=(bb // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const(c, c), const(c),
            const(9, c // 2, width), const(width), const(width),
            const(width, width), const(width), const(width),
            const(9, width, c), const(c), const(c),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bb * h * w, c), jnp.float32),
            jax.ShapeDtypeStruct((bb * h * w, 1), jnp.float32),
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32).reshape(bb * h * w, c),
        jnp.asarray(w_fold, jnp.float32).T,  # [C(in), C(out)] for x @ W^T
        jnp.asarray(b_fold, jnp.float32),
        w1,
        jnp.asarray(net["an1"]["scale"], jnp.float32),
        jnp.asarray(net["an1"]["bias"], jnp.float32),
        w2,
        jnp.asarray(net["an2"]["scale"], jnp.float32),
        jnp.asarray(net["an2"]["bias"], jnp.float32),
        wz,
        jnp.asarray(net["zconv"]["b"], jnp.float32),
        jnp.asarray(net["zconv"]["logs"], jnp.float32),
    )
    y = y2d.reshape(bb, h, w, c)[:b]
    ldj = jnp.sum(ldj_rows.reshape(bb, h * w), axis=1)[:b]
    return y, ldj
