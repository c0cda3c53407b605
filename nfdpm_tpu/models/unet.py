"""DDPM UNet, NHWC flax.linen re-design.

Capability parity with the reference's lucidrains-derived UNet
(/root/reference/diffusion_prior/gaussian_diffusion.py:363-490): 7x7 init
conv, sinusoidal or random/learned-Fourier time embedding, down path of
[ResnetBlock x2 + LinearAttention + Downsample], full-softmax mid attention,
mirrored up path with skip concats, final res-block + 1x1 conv. Blocks use
weight-standardized convs + GroupNorm + SiLU with FiLM time conditioning.

TPU-native choices:
  * NHWC layout, HWIO kernels (reference is NCHW).
  * Downsample is the same channel-ordered space-to-depth as the flow's
    squeeze (gaussian_diffusion.py:176-179) — implemented as reshapes that
    XLA folds into the following 1x1 conv.
  * Attention shapes are [B, heads, HW, dim_head] so QK^T / AV both hit the
    MXU as batched matmuls.
  * Weight standardization is computed over the HWIO kernel at apply time
    (fp32), fused by XLA into the conv.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class WeightStandardizedConv(nn.Module):
    """Conv whose kernel is standardized per output channel
    (gaussian_diffusion.py:183-197; eps 1e-5 in fp32).

    `dtype=bfloat16` runs the conv itself in bf16 (standardization stays
    fp32; the output is upcast via an explicit cast so the conv transpose
    sees matching dtypes in grad mode — cf. ops/coupling.py)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        eps = 1e-5
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) * jax.lax.rsqrt(var + eps)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            [(self.padding, self.padding), (self.padding, self.padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        return y + bias


class ChannelLayerNorm(nn.Module):
    """Biasless channel LayerNorm with learned gain (gaussian_diffusion.py:200-209,
    biased variance)."""

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],))
        eps = 1e-5
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * g


class SinusoidalPosEmb(nn.Module):
    """(gaussian_diffusion.py:225-237)"""

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        emb = math.log(10000.0) / (half - 1)
        emb = jnp.exp(jnp.arange(half) * -emb)
        emb = t[:, None].astype(jnp.float32) * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Fourier features, learned unless `random` (gaussian_diffusion.py:240-255).
    Output dim: `dim + 1` (raw t is concatenated)."""

    dim: int
    random: bool = False

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,))
        if self.random:
            w = jax.lax.stop_gradient(w)
        t = t[:, None].astype(jnp.float32)
        freqs = t * w[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class Block(nn.Module):
    """WSConv -> GroupNorm -> (FiLM) -> SiLU (gaussian_diffusion.py:260-276)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = WeightStandardizedConv(self.dim_out, (3, 3), padding=1,
                                   dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """(gaussian_diffusion.py:279-302)"""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if time_emb is not None:
            h_t = nn.Dense(self.dim_out * 2)(nn.silu(time_emb))
            h_t = h_t[:, None, None, :]
            scale_shift = jnp.split(h_t, 2, axis=-1)
        h = Block(self.dim_out, self.groups, self.dtype)(x, scale_shift)
        h = Block(self.dim_out, self.groups, self.dtype)(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(x).astype(
                jnp.float32)
        return h + x


def _to_heads(t, heads):
    """[B, H, W, heads*dh] -> [B, heads, H*W, dh]"""
    b, h, w, c = t.shape
    t = t.reshape(b, h * w, heads, c // heads)
    return t.transpose(0, 2, 1, 3)


class _ConvParams(nn.Module):
    """Param holder with nn.Conv's exact names/shapes/inits, used when a
    fused kernel consumes the raw weights instead of calling the conv."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, in_features, self.features))
        if not self.use_bias:
            return kernel
        return kernel, self.param("bias", nn.initializers.zeros,
                                  (self.features,))


class _GainParam(nn.Module):
    """ChannelLayerNorm's gain, for the fused path."""

    @nn.compact
    def __call__(self, dim):
        return self.param("g", nn.initializers.ones, (dim,))


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention (gaussian_diffusion.py:305-333):
    q softmax over channel dim, k softmax over sequence dim; O(N d^2).

    `fused=True` routes through the Pallas VMEM-resident block kernel
    (ops/pallas/fused_linear_attention.py) — same params, same math; the
    module path below is the XLA reference.

    MXU mapping: instead of per-head [N,dh]x[N,dh]->[dh,dh] einsums (32x32
    outputs use ~6% of a 128x128 MXU tile and measured as ~46% of UNet wall
    time at batch 256), both contractions run at the full hidden width with
    a block-diagonal head mask on the [hidden,hidden] context. Cross-head
    blocks are exactly zero in the masked product, so the math is identical
    to per-head attention while every matmul is 128-lane aligned."""

    heads: int = 4
    dim_head: int = 32
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head
        if self.fused:
            from ..ops.pallas.fused_linear_attention import (
                fused_linear_attention,
            )

            w_qkv = _ConvParams(hidden * 3, use_bias=False, name="Conv_0")(c)
            w_out, b_out = _ConvParams(c, name="Conv_1")(hidden)
            g = _GainParam(name="ChannelLayerNorm_0")(c)
            interp = jax.default_backend() not in ("tpu", "axon")
            # positional: jax.custom_vjp functions reject keyword args
            return fused_linear_attention(x, w_qkv, w_out, b_out, g,
                                          self.heads, self.dim_head, interp)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False)(x)
        q, k, v = jnp.split(qkv.reshape(b, n, hidden * 3), 3, axis=-1)

        # per-head softmaxes on the flat [B, N, hidden] layout
        q = jax.nn.softmax(q.reshape(b, n, self.heads, self.dim_head), axis=-1)
        q = q.reshape(b, n, hidden) * (self.dim_head ** -0.5)
        k = jax.nn.softmax(k, axis=1)  # over N, independent per column
        v = v / n

        # context[d, e] = sum_n k[n, d] v[n, e], masked to head-diagonal
        # blocks (head_mask[d, e] = 1 iff d, e belong to the same head)
        head = jnp.arange(hidden) // self.dim_head
        head_mask = (head[:, None] == head[None, :]).astype(x.dtype)
        context = jnp.einsum("bnd,bne->bde", k, v) * head_mask
        out = jnp.einsum("bde,bnd->bne", context, q)
        out = out.reshape(b, h, w, hidden)
        out = nn.Conv(c, (1, 1))(out)
        return ChannelLayerNorm()(out)


class Attention(nn.Module):
    """Full softmax attention (gaussian_diffusion.py:336-358).

    `stacked=True` folds the 4 heads into the sequence axis: QK^T / AV run
    as single [heads*N, heads*N] matmuls (128-lane aligned at mid-block
    N=16..64) instead of 4 tiny per-head [N, dh] einsums, with cross-head
    sim entries masked to -inf before the softmax — exact same math, same
    params (the masked rows renormalize over their own head's block only).
    Same MXU-mapping trick as LinearAttention's masked-block context."""

    heads: int = 4
    dim_head: int = 32
    stacked: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _to_heads(q, self.heads) * (self.dim_head ** -0.5)
        k = _to_heads(k, self.heads)
        v = _to_heads(v, self.heads)
        if self.stacked:
            hn = self.heads * n
            q = q.reshape(b, hn, self.dim_head)
            k = k.reshape(b, hn, self.dim_head)
            v = v.reshape(b, hn, self.dim_head)
            blk = jnp.arange(hn) // n
            same_head = blk[:, None] == blk[None, :]
            sim = jnp.einsum("bid,bjd->bij", q, k)
            sim = jnp.where(same_head, sim, -jnp.inf)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bij,bjd->bid", attn, v)
            out = out.reshape(b, self.heads, n, self.dim_head)
        else:
            sim = jnp.einsum("bhid,bhjd->bhij", q, k)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1))(out)


class PreNormResidual(nn.Module):
    """x + fn(LN(x)) (gaussian_diffusion.py:212-220, 238)."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x):
        return x + self.fn(ChannelLayerNorm()(x))


class Downsample(nn.Module):
    """space-to-depth + 1x1 conv (gaussian_diffusion.py:176-179). The
    space-to-depth uses the flow's squeeze (identical channel order)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.bijectors import squeeze_forward

        return nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(
            squeeze_forward(x)).astype(jnp.float32)


class Upsample(nn.Module):
    """nearest 2x + 3x3 conv (gaussian_diffusion.py:169-173)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.dim_out, (3, 3), padding=1,
                       dtype=self.dtype)(x).astype(jnp.float32)


class Unet(nn.Module):
    """Full UNet (gaussian_diffusion.py:363-490). Input/output [B, H, W, C]."""

    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    fused_attention: bool = False  # Pallas VMEM-resident linear-attention
    # blocks (ops/pallas/fused_linear_attention.py); same params/math as
    # the XLA path — A/B on the target chip (BENCH.md round 3)
    stacked_mid_attn: bool = False  # fold mid-block attention heads into
    # the sequence axis (block-diag -inf mask; exact math, MXU-aligned
    # matmuls) — A/B knob, see Attention.stacked
    remat: bool = False  # rematerialize ResnetBlocks in the backward pass
    # (activation memory ~ O(depth) -> O(1) per block; for CelebA-128-scale
    # UNets, cf. jax.checkpoint on the flow scan)
    dtype: jnp.dtype = jnp.float32  # bfloat16: conv compute in bf16 (norms,
    # time embeddings, attention softmax, and residual adds stay fp32).
    # Forward-only is perf-neutral on v5e (XLA already runs fp32 convs as
    # bf16 MXU passes), but the full train step (fwd+bwd+Adam) measures
    # 1.13x at the MNIST stage-2 recipe with loss-trajectory parity at
    # bf16 rounding scale (max rel dev 3.9e-3 / 30 steps) — BENCH.md r4.
    # Surfaced as model.diffusion.unet_dtype.

    @property
    def effective_out_dim(self) -> int:
        default = self.channels * (2 if self.learned_variance else 1)
        return self.out_dim or default

    @nn.compact
    def __call__(self, x, time, x_self_cond=None):
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        init_dim = self.init_dim or self.dim
        x = nn.Conv(init_dim, (7, 7), padding=3,
                    dtype=self.dtype)(x).astype(jnp.float32)
        r = x

        # time embedding
        time_dim = self.dim * 4
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features
            )(time)
        else:
            emb = SinusoidalPosEmb(self.dim)(time)
        t = nn.Dense(time_dim)(emb)
        t = nn.Dense(time_dim)(nn.gelu(t))

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        groups = self.resnet_block_groups
        Res = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        dt = self.dtype

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            x = Res(dim_in, groups, dt, name=f"down_{ind}_res1")(x, t)
            hs.append(x)
            x = Res(dim_in, groups, dt, name=f"down_{ind}_res2")(x, t)
            x = PreNormResidual(LinearAttention(fused=self.fused_attention))(x)
            hs.append(x)
            x = (nn.Conv(dim_out, (3, 3), padding=1,
                         dtype=dt)(x).astype(jnp.float32) if is_last
                 else Downsample(dim_out, dt)(x))

        mid_dim = dims[-1]
        x = Res(mid_dim, groups, dt, name="mid_res1")(x, t)
        x = PreNormResidual(Attention(stacked=self.stacked_mid_attn))(x)
        x = Res(mid_dim, groups, dt, name="mid_res2")(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = Res(dim_out, groups, dt, name=f"up_{ind}_res1")(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = Res(dim_out, groups, dt, name=f"up_{ind}_res2")(x, t)
            x = PreNormResidual(LinearAttention(fused=self.fused_attention))(x)
            x = (nn.Conv(dim_in, (3, 3), padding=1,
                         dtype=dt)(x).astype(jnp.float32) if is_last
                 else Upsample(dim_in, dt)(x))

        x = jnp.concatenate([x, r], axis=-1)
        x = Res(self.dim, groups, dt, name="final_res")(x, t)
        return nn.Conv(self.effective_out_dim, (1, 1))(x)
