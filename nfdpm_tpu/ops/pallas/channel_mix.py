"""Pallas TPU kernel: fused actnorm + PLU 1x1-conv channel mix.

The Glow step's pre-coupling portion is one channel-mixing matmul with an
affine epilogue (see bijectors.fused_actnorm_invconv_forward):

    y[n, o] = sum_c x[n, c] * Wf[o, c] + bf[o],      n over B*H*W pixels

This kernel tiles the pixel axis into VMEM-resident blocks and performs the
[TILE_N, C] x [C, O] matmul on the MXU with the bias add fused in the same
kernel — one HBM read of x, one HBM write of y, weights resident in VMEM
across the whole grid.

The channel counts in Glow are small (<= 2^(L+1)*C_img, e.g. 48..192), so C
and O are zero-padded to the 128-lane boundary once on the host side of the
call; the pad is sliced off on return. Selected by `GlowConfig.use_pallas`
(models/glow.py -> ops/bijectors.py:step_forward); numerically identical to
the XLA path (fp32 accumulate) — see tests/test_pallas_kernels.py.

Trainable via custom VJP: the op is linear, so dx is the same kernel with
W^T (no bias), and dW/db are one einsum/reduction each (XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_N = 512


def _kernel(x_ref, w_ref, b_ref, o_ref):
    # x: [TILE_N, C], w: [C, O], b: [1, O]  -> o: [TILE_N, O]
    # HIGHEST: full-fp32 MXU passes, matching the XLA reference path (the
    # default runs single-pass bf16 and drifts ~5e-2 on unit-scale data)
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    o_ref[:] = acc + b_ref[:]


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def channel_mix(x: jax.Array, w_fold: jax.Array, b_fold: jax.Array,
                interpret: bool = False) -> jax.Array:
    """x: [B, H, W, C]; w_fold: [O, C]; b_fold: [O] -> [B, H, W, O]."""
    return _channel_mix_impl(x, w_fold, b_fold, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _channel_mix_impl(x: jax.Array, w_fold: jax.Array, b_fold: jax.Array,
                      interpret: bool = False) -> jax.Array:
    bsz, hh, ww, c = x.shape
    o = w_fold.shape[0]
    n = bsz * hh * ww
    c_pad, o_pad = _round_up(c, LANE), _round_up(o, LANE)
    n_pad = _round_up(n, TILE_N)

    xf = x.reshape(n, c).astype(jnp.float32)
    xf = jnp.pad(xf, ((0, n_pad - n), (0, c_pad - c)))
    wt = jnp.pad(w_fold.T.astype(jnp.float32), ((0, c_pad - c), (0, o_pad - o)))
    bf = jnp.pad(b_fold.astype(jnp.float32), (0, o_pad - o)).reshape(1, o_pad)

    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, o_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, o_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, o_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * c_pad * o_pad,
            bytes_accessed=4 * (n_pad * c_pad + c_pad * o_pad + n_pad * o_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, wt, bf)
    return out[:n, :o].reshape(bsz, hh, ww, o)


def _channel_mix_fwd(x, w_fold, b_fold, interpret):
    return _channel_mix_impl(x, w_fold, b_fold, interpret), (x, w_fold)


def _channel_mix_bwd(interpret, res, g):
    x, w_fold = res
    # dx = g @ W: the same channel-mix kernel with W^T and zero bias
    o = w_fold.shape[0]
    dx = _channel_mix_impl(g, w_fold.T, jnp.zeros((w_fold.shape[1],), jnp.float32),
                           interpret)
    # dW[o, c] = sum_n g[n, o] x[n, c]; db[o] = sum_n g[n, o]  (XLA)
    gf = g.reshape(-1, o).astype(jnp.float32)
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    dw = jnp.einsum("no,nc->oc", gf, xf, precision=jax.lax.Precision.HIGHEST)
    db = jnp.sum(gf, axis=0)
    return dx, dw, db


channel_mix.defvjp(_channel_mix_fwd, _channel_mix_bwd)
