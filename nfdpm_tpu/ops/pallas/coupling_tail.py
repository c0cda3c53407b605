"""Pallas TPU kernel: fused affine-coupling tail with logdet reduction.

The coupling's post-CNN tail (transforms.py:179-184 semantics):

    scale = sigmoid(log_scale + 2)
    y_b   = (x_b + bias) * scale
    ldj  += sum over (H, W, C/2) of log(scale + 1e-6)   per batch element

XLA emits this as fused elementwise + a separate reduction; this kernel does
ONE pass per (batch-row, feature-tile): reads log_scale/bias/x_b once,
writes y_b and accumulates the per-example logdet partial in VMEM scratch —
the reduction costs no extra HBM traffic.

A custom VJP makes the kernel trainable:
    dy_b/dx_b = scale;  dy_b/dls = (x_b + bias) * s'(ls+2);
    dy_b/db = scale;    dldj/dls = s'(ls+2) / (scale + eps)
(where s' = sigmoid'). The backward pass is plain XLA (one fused elementwise
pass) — only the memory-bound forward needs the hand-fused kernel.

Optional path; correctness is tested in interpreter mode on CPU
(tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6
ROW_TILE = 8  # batch rows per grid step


def _kernel(ls_ref, b_ref, xb_ref, yb_ref, ldj_ref):
    # blocks: [ROW_TILE, D] for ls/b/xb/yb; ldj: [ROW_TILE, 1]
    scale = jax.nn.sigmoid(ls_ref[:] + 2.0)
    yb_ref[:] = (xb_ref[:] + b_ref[:]) * scale
    ldj_ref[:] = jnp.sum(jnp.log(scale + EPS), axis=1, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def coupling_tail(log_scale, bias, x_b, interpret: bool = False):
    """log_scale/bias/x_b: [B, H, W, C/2] -> (y_b [B,H,W,C/2], ldj [B])."""
    return _forward(log_scale, bias, x_b, interpret)


def _forward(log_scale, bias, x_b, interpret):
    b = x_b.shape[0]
    d = int(x_b.size // b)
    shape2 = (b, d)
    ls = log_scale.reshape(shape2)
    bi = bias.reshape(shape2)
    xb = x_b.reshape(shape2)

    pad_rows = (-b) % ROW_TILE
    if pad_rows:
        ls = jnp.pad(ls, ((0, pad_rows), (0, 0)))
        bi = jnp.pad(bi, ((0, pad_rows), (0, 0)))
        xb = jnp.pad(xb, ((0, pad_rows), (0, 0)))
    rows = b + pad_rows

    pad_d = (-d) % 128
    if pad_d:
        # pad log_scale with large NEGATIVE values so sigmoid ~ 0 and
        # log(0 + eps) would pollute the sum — instead pad with 0 and
        # subtract the analytic pad contribution afterwards.
        ls = jnp.pad(ls, ((0, 0), (0, pad_d)))
        bi = jnp.pad(bi, ((0, 0), (0, pad_d)))
        xb = jnp.pad(xb, ((0, 0), (0, pad_d)))
    dd = d + pad_d

    y, ldj = pl.pallas_call(
        _kernel,
        grid=(rows // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, dd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, dd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, dd), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, dd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, dd), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ),
        interpret=interpret,
    )(ls, bi, xb)

    # remove the pad columns' contribution: ls=0 -> log(sigmoid(2)+eps)
    if pad_d:
        pad_term = pad_d * jnp.log(jax.nn.sigmoid(2.0) + EPS)
        ldj = ldj - pad_term
    return y[:b, :d].reshape(x_b.shape), ldj[:b, 0]


def _inv_kernel(ls_ref, b_ref, yb_ref, xb_ref):
    # blocks: [ROW_TILE, D]; x_b = y_b / (scale + eps) - bias
    scale = jax.nn.sigmoid(ls_ref[:] + 2.0)
    xb_ref[:] = yb_ref[:] / (scale + EPS) - b_ref[:]


def coupling_tail_inverse(log_scale, bias, y_b, interpret: bool = False):
    """Inverse of the coupling tail (sampling path, no logdet):
    x_b = y_b / (sigmoid(log_scale + 2) + eps) - bias, one fused HBM pass
    (transforms.py:196-200 semantics). Not differentiated — sampling only."""
    b = y_b.shape[0]
    d = int(y_b.size // b)
    shape2 = (b, d)
    ls = log_scale.reshape(shape2)
    bi = bias.reshape(shape2)
    yb = y_b.reshape(shape2)

    pad_rows = (-b) % ROW_TILE
    pad_d = (-d) % 128
    if pad_rows or pad_d:
        widths = ((0, pad_rows), (0, pad_d))
        ls = jnp.pad(ls, widths)
        bi = jnp.pad(bi, widths)
        yb = jnp.pad(yb, widths)
    rows, dd = b + pad_rows, d + pad_d

    x = pl.pallas_call(
        _inv_kernel,
        grid=(rows // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, dd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, dd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, dd), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, dd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, dd), jnp.float32),
        interpret=interpret,
    )(ls, bi, yb)
    return x[:b, :d].reshape(y_b.shape)


def _fwd(log_scale, bias, x_b, interpret):
    out = _forward(log_scale, bias, x_b, interpret)
    return out, (log_scale, bias, x_b)


def _bwd(interpret, res, cts):
    log_scale, bias, x_b = res
    g_y, g_ldj = cts
    s = jax.nn.sigmoid(log_scale + 2.0)
    ds = s * (1.0 - s)
    g_ldj_b = g_ldj.reshape((-1,) + (1,) * (x_b.ndim - 1))
    d_ls = g_y * (x_b + bias) * ds + g_ldj_b * ds / (s + EPS)
    d_bias = g_y * s
    d_xb = g_y * s
    return d_ls, d_bias, d_xb


coupling_tail.defvjp(_fwd, _bwd)
