"""Functional bijector primitives for the Glow flow, NHWC layout.

Every bijector is a triple of pure functions over a parameter PyTree:

    init_<name>(key, ...)            -> params
    <name>_forward(params, x, ldj)   -> (y, ldj)       # ldj: [B] fp32 accum
    <name>_inverse(params, y)        -> x

plus, where the reference uses data-dependent initialization, an explicit

    <name>_ddinit(params, x)         -> (new_params, y)

pass (JAX has no in-forward mutation, so the reference's lazy ActNorm init —
/root/reference/normalizing_flow/transforms.py:74-78 — becomes a separate
one-batch functional pass, see SURVEY.md §7).

Design notes (TPU-first, not a port):
  * Layout is NHWC (TPU-native); the reference is NCHW. Channel-chunk /
    squeeze orderings are chosen so latents are permutation-identical to the
    reference's, enabling checkpoint import and parity tests.
  * The invertible 1x1 convolution is PLU-parameterized (fixed permutation,
    unit-lower L, upper U with fixed sign / learned log|diag|), so the
    log-determinant is `H*W*sum(log_s)` (no slogdet) and the inverse is two
    triangular solves — unlike the reference's full-matrix weight with fp64
    `torch.slogdet` + explicit `inverse()`
    (/root/reference/normalizing_flow/transforms.py:112-144) which does not
    map well onto TPU. `plu_from_weight` imports reference full-W weights.
  * All log-det accumulation is fp32 (the reference accumulates in fp64 on
    CUDA; fp64 is unavailable/slow on TPU — parity tests bound the error).
  * The 1x1 conv is executed as a single [B*H*W, C] x [C, C] matmul on the
    MXU; actnorm folds into it algebraically at apply time
    (fused_actnorm_invconv_forward below).

Reference formula citations are inline below.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coupling import coupling_net_apply, coupling_net_ddinit, init_coupling_net
from .zeroconv import init_zeroconv, zeroconv_apply

Params = Dict[str, Any]

_EPS_ACTNORM_INIT = 1e-6  # matches transforms.py:76
_EPS_COUPLING = 1e-6      # matches transforms.py:184,199


def as_host_rng(key_or_rng) -> np.random.Generator:
    """Normalize a jax PRNG key (or a numpy Generator) to a host Generator.

    All parameter init is host-side numpy: over a tunneled TPU every device
    op at build time is a multi-second round trip, so init touches the
    device exactly zero times. Determinism: the generator is seeded from the
    key's raw data.
    """
    if isinstance(key_or_rng, np.random.Generator):
        return key_or_rng
    if isinstance(key_or_rng, (int, np.integer)):
        # Preferred on TPU: an int seed never touches the device (over a
        # tunneled chip even an 8-byte device->host read is a slow RPC).
        return np.random.default_rng(np.random.SeedSequence(int(key_or_rng)))
    try:  # old-style uint32 key arrays: plain transfer, no device compute
        data = np.asarray(key_or_rng).ravel()
    except TypeError:  # new-style typed keys need the unwrap op
        data = np.asarray(jax.random.key_data(key_or_rng)).ravel()
    return np.random.default_rng(np.random.SeedSequence(entropy=[int(x) for x in data]))


# ---------------------------------------------------------------------------
# Identity (transforms.py:14-25)
# ---------------------------------------------------------------------------

def identity_forward(x: jax.Array, ldj: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return x, ldj


def identity_inverse(y: jax.Array) -> jax.Array:
    return y


# ---------------------------------------------------------------------------
# ActNorm
# ---------------------------------------------------------------------------

def init_actnorm(channels: int) -> Params:
    """Zero (pseudo-)init; real init is `actnorm_ddinit` on the first batch.

    Mirrors `ActNorm.__init__` (/root/reference/normalizing_flow/transforms.py:42-54).
    """
    return {
        "scale": np.zeros((channels,), np.float32),  # log-scale (host-side init)
        "bias": np.zeros((channels,), np.float32),
    }


def actnorm_forward(params: Params, x: jax.Array, ldj: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """y = exp(scale) * (x + bias); ldj += H*W*sum(scale).

    Reference: transforms.py:80-81.  x: [B, H, W, C].
    """
    h, w = x.shape[1], x.shape[2]
    y = jnp.exp(params["scale"]) * (x + params["bias"])
    ldj = ldj + (h * w) * jnp.sum(params["scale"]).astype(ldj.dtype)
    return y, ldj


def actnorm_inverse(params: Params, y: jax.Array) -> jax.Array:
    """x = y * exp(-scale) - bias.  Reference: transforms.py:94-95."""
    return y * jnp.exp(-params["scale"]) - params["bias"]


def actnorm_ddinit(params: Params, x: jax.Array) -> Tuple[Params, jax.Array]:
    """Data-dependent init: per-channel zero mean / unit variance after forward.

    scale = -log(std_c(x) + 1e-6) (Bessel-corrected std, matching torch's
    default `unbiased=True`), bias = -mean_c(x).  Reference: transforms.py:74-78.
    Returns the initialized params and the forward-transformed batch.
    """
    del params
    mean = jnp.mean(x, axis=(0, 1, 2))
    std = jnp.std(x, axis=(0, 1, 2), ddof=1)
    new = {
        "scale": -jnp.log(std + _EPS_ACTNORM_INIT),
        "bias": -mean,
    }
    y, _ = actnorm_forward(new, x, jnp.zeros((x.shape[0],), jnp.float32))
    return new, y


# ---------------------------------------------------------------------------
# Invertible 1x1 convolution, PLU-parameterized
# ---------------------------------------------------------------------------

def init_invconv(key, channels: int) -> Params:
    """Random-orthogonal init (QR of a Gaussian, matching transforms.py:112-114)
    followed by a PLU decomposition.

    Trainable leaves: `lower` (strictly-lower part used), `upper`
    (strictly-upper part used), `log_s` (log|diag U|).  Non-trainable leaves
    (stop-gradiented here and frozen via the optimizer mask in
    training/optim.py): `p_mat` (the permutation matrix) and `sign`
    (diag-sign of U).
    """
    rng = as_host_rng(key)
    w = np.linalg.qr(rng.normal(size=(channels, channels)))[0]
    return plu_from_weight(w)


def plu_from_weight(w: jax.Array) -> Params:
    """Decompose a full invertible 1x1-conv weight [C, C] (torch [out, in]
    layout, transforms.py:115) into the PLU parameterization.  Used both at
    init and to import reference checkpoints (SURVEY.md §7)."""
    import scipy.linalg  # host-side decomposition only

    w_np = np.asarray(jax.device_get(w), np.float64)
    p, l, u = scipy.linalg.lu(w_np)
    s = np.diag(u).copy()
    # The permutation is stored as a float32 matrix (stop-gradiented in the
    # forward and frozen by the optimizer mask, training/optim.py) so the
    # whole params tree stays float-differentiable for jax.grad.
    return {
        "p_mat": np.asarray(p, np.float32),
        "lower": np.asarray(np.tril(l, -1), np.float32),
        "upper": np.asarray(np.triu(u, 1), np.float32),
        "log_s": np.asarray(np.log(np.abs(s)), np.float32),
        "sign": np.asarray(np.sign(s), np.float32),
    }


def init_invconv_full(key, channels: int) -> Params:
    """Full-matrix parameterization — the reference's exact one
    (/root/reference/normalizing_flow/transforms.py:104-115): one trainable
    [C, C] weight, logdet via slogdet, inverse via general matrix inverse.

    TPU note: this is NOT the default (PLU is, see module docstring) — slogdet
    has no fp64 on TPU and a general inverse is slower than two triangular
    solves. It exists for (a) exact Adam-trajectory parity with the reference
    (Adam is not reparameterization-invariant, so PLU-vs-full-W training paths
    diverge even from identical initial weights) and (b) loss-free import of
    reference checkpoints for continued training.
    """
    rng = as_host_rng(key)
    w = np.linalg.qr(rng.normal(size=(channels, channels)))[0]
    return {"weight": np.asarray(w, np.float32)}


def invconv_logdet(params: Params) -> jax.Array:
    """Per-pixel log|det W|: sum(log_s) for PLU; slogdet for full-W."""
    if "weight" in params:
        return jnp.linalg.slogdet(params["weight"])[1]
    return jnp.sum(params["log_s"])


def invconv_weight(params: Params) -> jax.Array:
    """Reassemble the full weight W (fp32, [C, C] = [out, in]): the stored
    matrix in full-W mode, or P @ L @ U' from the PLU factors."""
    if "weight" in params:
        return params["weight"]
    c = params["log_s"].shape[0]
    eye = jnp.eye(c, dtype=jnp.float32)
    l = eye + jnp.tril(params["lower"], -1)
    u = jnp.triu(params["upper"], 1) + jnp.diag(
        jax.lax.stop_gradient(params["sign"]) * jnp.exp(params["log_s"])
    )
    lu = jnp.matmul(l, u, precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(jax.lax.stop_gradient(params["p_mat"]), lu,
                      precision=jax.lax.Precision.HIGHEST)


def invconv_forward(params: Params, x: jax.Array, ldj: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """y[..., o] = sum_c W[o, c] x[..., c];  ldj += H*W*sum(log_s).

    The logdet is exact by construction (|det W| = prod|diag U'|), replacing
    the reference's fp64 slogdet (transforms.py:131).
    """
    h, w = x.shape[1], x.shape[2]
    wmat = invconv_weight(params)
    y = jnp.einsum("bhwc,oc->bhwo", x, wmat, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    ldj = ldj + (h * w) * invconv_logdet(params).astype(ldj.dtype)
    return y, ldj


def invconv_inverse_weight(params: Params) -> jax.Array:
    """W^{-1} = U^{-1} L^{-1} P^T via two C x C triangular solves against the
    identity — O(C^3) once, then the pixel application is a single MXU
    matmul (a [N, C] x [C, C] triangular solve is latency-bound on TPU).
    Full-W mode falls back to a general inverse (transforms.py:144)."""
    if "weight" in params:
        return jnp.linalg.inv(params["weight"])
    c = params["log_s"].shape[0]
    eye = jnp.eye(c, dtype=jnp.float32)
    l = eye + jnp.tril(params["lower"], -1)
    u = jnp.triu(params["upper"], 1) + jnp.diag(params["sign"] * jnp.exp(params["log_s"]))
    l_inv = jax.scipy.linalg.solve_triangular(l, eye, lower=True, unit_diagonal=True)
    u_inv = jax.scipy.linalg.solve_triangular(u, eye, lower=False)
    # W = P L U  =>  W^{-1} = U^{-1} L^{-1} P^T
    ul = jnp.matmul(u_inv, l_inv, precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(ul, params["p_mat"].T, precision=jax.lax.Precision.HIGHEST)


def invconv_inverse(params: Params, y: jax.Array) -> jax.Array:
    """x[..., c] = sum_o Winv[c, o] y[..., o] — one channel-mixing matmul.

    Reference computes an explicit `weight.inverse()` per call
    (transforms.py:144); here the inverse weight is assembled from the PLU
    factors with triangular solves (exact, no general matrix inverse)."""
    w_inv = invconv_inverse_weight(params)
    return jnp.einsum("bhwo,co->bhwc", y, w_inv, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Affine coupling
# ---------------------------------------------------------------------------

def init_coupling(key, channels: int, width: int = 512) -> Params:
    """Coupling layer over `channels` (must be even): the net maps C/2 -> C.

    Mirrors `AffineCoupling.__init__` (transforms.py:162-164) with the
    3x3->1x1->3x3 coupling CNN of width 512 (utils.py:72-90).
    """
    return {"net": init_coupling_net(as_host_rng(key), channels // 2, width, channels)}


def coupling_forward(params: Params, x: jax.Array, ldj: jax.Array,
                     dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Channel-split affine coupling (transforms.py:179-185):
    scale = sigmoid(log_scale + 2);  y_b = (x_b + bias) * scale;
    ldj += sum log(scale + 1e-6).
    """
    c = x.shape[-1]
    x_a, x_b = x[..., : c // 2], x[..., c // 2:]
    h = coupling_net_apply(params["net"], x_a, dtype)
    log_scale, bias = h[..., : c // 2], h[..., c // 2:]
    scale = jax.nn.sigmoid(log_scale + 2.0)
    y_b = (x_b + bias) * scale
    ldj = ldj + jnp.sum(
        jnp.log(scale + _EPS_COUPLING).reshape(x.shape[0], -1), axis=1
    ).astype(ldj.dtype)
    return jnp.concatenate([x_a, y_b], axis=-1), ldj


def coupling_inverse(params: Params, y: jax.Array, dtype=jnp.float32) -> jax.Array:
    """x_b = y_b / (scale + 1e-6) - bias (transforms.py:196-200)."""
    c = y.shape[-1]
    y_a, y_b = y[..., : c // 2], y[..., c // 2:]
    h = coupling_net_apply(params["net"], y_a, dtype)
    log_scale, bias = h[..., : c // 2], h[..., c // 2:]
    scale = jax.nn.sigmoid(log_scale + 2.0)
    x_b = y_b / (scale + _EPS_COUPLING) - bias
    return jnp.concatenate([y_a, x_b], axis=-1)


def coupling_ddinit(params: Params, x: jax.Array) -> Tuple[Params, jax.Array]:
    """Data-dependent init of the actnorms inside the coupling CNN, then a
    normal forward (the coupling output itself needs no init)."""
    c = x.shape[-1]
    x_a = x[..., : c // 2]
    new_net, _ = coupling_net_ddinit(params["net"], x_a)
    new_params = {"net": new_net}
    y, _ = coupling_forward(new_params, x, jnp.zeros((x.shape[0],), jnp.float32))
    return new_params, y


# ---------------------------------------------------------------------------
# Squeeze (space-to-depth, factor 2)
# ---------------------------------------------------------------------------

def squeeze_forward(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel order (c, h2, w2) to match
    the reference's `b c (h h1) (w w1) -> b (c h1 w1) h w` (transforms.py:226).
    Volume-preserving: log-det contribution is zero.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h/2, w/2, c, h2, w2
    return x.reshape(b, h // 2, w // 2, c * 4)


def squeeze_inverse(y: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, 2H, 2W, C/4] (transforms.py:238)."""
    b, h, w, c = y.shape
    y = y.reshape(b, h, w, c // 4, 2, 2)
    y = y.transpose(0, 1, 4, 2, 5, 3)  # b, h, h2, w, w2, c/4
    return y.reshape(b, h * 2, w * 2, c // 4)


# ---------------------------------------------------------------------------
# Split (multi-scale factor-out with learned per-split prior)
# ---------------------------------------------------------------------------

def init_split(channels: int, learn_prior: bool = True) -> Params:
    """ZeroConv(C/2 -> C) producing (mean, log_sd) for the factored-out half.

    Mirrors `Split.__init__` (transforms.py:254).  When `learn_prior` is
    False the prior is standard normal (the reference crashes in the
    analogous GaussianPrior path, prior.py:65-68 — a bug we do not replicate).
    """
    if not learn_prior:
        return {"conv": None}
    return {"conv": init_zeroconv(channels // 2, channels, filter_size=3)}


def _split_prior_moments(params: Params, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    if params["conv"] is None:
        zeros = jnp.zeros(y.shape[:-1] + (y.shape[-1],), y.dtype)
        return zeros, zeros
    h = zeroconv_apply(params["conv"], y)
    c = h.shape[-1] // 2
    return h[..., :c], h[..., c:]


def split_forward(
    params: Params, x: jax.Array, ldj: jax.Array, logp: jax.Array | None
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array | None]:
    """Channel-halve; accumulate prior logp of the factored half when logp is
    given (transforms.py:270-290; logp=None skips the prior, used by
    NFBackbone — __init__.py:70-82)."""
    c = x.shape[-1]
    y, z = x[..., : c // 2], x[..., c // 2:]
    if logp is not None:
        mean, logsd = _split_prior_moments(params, y)
        logp = logp + gaussian_logp(z, mean, logsd)
    return y, ldj, z, logp


def split_inverse(
    params: Params,
    y: jax.Array,
    z: jax.Array | None,
    key: jax.Array | None = None,
    temperature: float = 1.0,
) -> jax.Array:
    """Concatenate the factored half back; when z is None, sample it from the
    learned prior at `temperature` (transforms.py:305-307)."""
    if z is None:
        mean, logsd = _split_prior_moments(params, y)
        z = gaussian_sample(key, mean, logsd, temperature)
    return jnp.concatenate([y, z], axis=-1)


# ---------------------------------------------------------------------------
# Isotropic Gaussian density / sampling (prior.py:12-51)
# ---------------------------------------------------------------------------

_LOG_2PI = float(np.log(2.0 * np.pi))


def gaussian_logp(x: jax.Array, mean: jax.Array, logsd: jax.Array) -> jax.Array:
    """Per-sample log N(x; mean, e^{2 logsd}) summed over non-batch dims
    (prior.py:36-37)."""
    ll = -0.5 * (_LOG_2PI + 2.0 * logsd + (x - mean) ** 2 * jnp.exp(-2.0 * logsd))
    return jnp.sum(ll.reshape(x.shape[0], -1), axis=1)


def gaussian_sample(
    key: jax.Array, mean: jax.Array, logsd: jax.Array, temperature: float = 1.0
) -> jax.Array:
    """mean + (e^{logsd} * temperature) * eps (prior.py:49-50)."""
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + (jnp.exp(logsd) * temperature) * eps


# ---------------------------------------------------------------------------
# One Glow step: actnorm -> 1x1 conv -> coupling (glow.py:12-63)
# ---------------------------------------------------------------------------

def init_step(key, channels: int, width: int = 512,
              invconv_param: str = "plu") -> Params:
    rng = as_host_rng(key)
    init_ic = init_invconv_full if invconv_param == "full" else init_invconv
    return {
        "actnorm": init_actnorm(channels),
        "invconv": init_ic(rng, channels),
        "coupling": init_coupling(rng, channels, width),
    }


def fold_actnorm_invconv(an: Params, ic: Params) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fold actnorm into the 1x1-conv weight:

        W (e^s * (x + b)) = x @ (W diag(e^s))^T + W (e^s * b)

    Returns (w_fold [O, C], b_fold [O], per-pixel logdet scalar)."""
    wmat = invconv_weight(ic)                       # [O, C]
    es = jnp.exp(an["scale"])                        # [C]
    w_fold = wmat * es[None, :]                      # W diag(e^s), [O, C]
    b_fold = jnp.matmul(wmat, es * an["bias"],
                        precision=jax.lax.Precision.HIGHEST)  # [O]
    return w_fold, b_fold, jnp.sum(an["scale"]) + invconv_logdet(ic)


def fused_actnorm_invconv_forward(
    an: Params, ic: Params, x: jax.Array, ldj: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """actnorm + PLU 1x1 conv folded into ONE matmul + bias.

    Exact same math as the two ops, one fewer full-tensor HBM pass (the
    actnorm elementwise disappears into the MXU epilogue);
    ldj += H*W*(sum(s) + sum(log_s))."""
    h, w = x.shape[1], x.shape[2]
    w_fold, b_fold, ld = fold_actnorm_invconv(an, ic)
    y = jnp.einsum("bhwc,oc->bhwo", x, w_fold, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) + b_fold
    ldj = ldj + (h * w) * ld.astype(ldj.dtype)
    return y, ldj


def fused_invconv_actnorm_inverse(an: Params, ic: Params, y: jax.Array) -> jax.Array:
    """Inverse of the fused pair: x = y @ (diag(e^-s) W^{-1})^T - b."""
    w_inv = invconv_inverse_weight(ic)               # [C, O]
    es_inv = jnp.exp(-an["scale"])                   # [C]
    w_fold = es_inv[:, None] * w_inv                 # diag(e^-s) W^{-1}
    x = jnp.einsum("bhwo,co->bhwc", y, w_fold, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return x - an["bias"]


def step_forward(params: Params, x: jax.Array, ldj: jax.Array,
                 dtype=jnp.float32, use_pallas: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
    if use_pallas:
        return step_forward_pallas(params, x, ldj, dtype)
    y, ldj = fused_actnorm_invconv_forward(
        params["actnorm"], params["invconv"], x, ldj
    )
    y, ldj = coupling_forward(params["coupling"], y, ldj, dtype)
    return y, ldj


def step_forward_pallas(params: Params, x: jax.Array, ldj: jax.Array,
                        dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Glow step with the Pallas TPU kernels on the memory-bound portions
    (GlowConfig.use_pallas): the folded actnorm+invconv channel mix runs as
    ops/pallas/channel_mix (one HBM pass, weights VMEM-resident) and the
    coupling's post-CNN tail as ops/pallas/coupling_tail (elementwise +
    logdet reduction in one pass, custom VJP). The coupling CNN's convs stay
    on XLA (its conv layouts beat an im2col kernel at these shapes).
    Numerically identical to the XLA path: fp32 accumulation throughout."""
    from .pallas.channel_mix import channel_mix
    from .pallas.coupling_tail import coupling_tail

    # Mosaic kernels need real TPU hardware; on CPU (tests, virtual meshes)
    # fall back to the pallas interpreter — same math, trace-time decision.
    interpret = jax.default_backend() not in ("tpu", "axon")

    h, w = x.shape[1], x.shape[2]
    w_fold, b_fold, ld = fold_actnorm_invconv(params["actnorm"], params["invconv"])
    y = channel_mix(x, w_fold, b_fold, interpret)
    ldj = ldj + (h * w) * ld.astype(ldj.dtype)

    c = y.shape[-1]
    y_a, x_b = y[..., : c // 2], y[..., c // 2:]
    net_out = coupling_net_apply(params["coupling"]["net"], y_a, dtype)
    log_scale, bias = net_out[..., : c // 2], net_out[..., c // 2:]
    y_b, ldj_part = coupling_tail(log_scale, bias, x_b, interpret)
    return jnp.concatenate([y_a, y_b], axis=-1), ldj + ldj_part.astype(ldj.dtype)


def step_inverse(params: Params, y: jax.Array, dtype=jnp.float32,
                 use_pallas: bool = False) -> jax.Array:
    if use_pallas:
        return step_inverse_pallas(params, y, dtype)
    x = coupling_inverse(params["coupling"], y, dtype)
    x = fused_invconv_actnorm_inverse(params["actnorm"], params["invconv"], x)
    return x


def step_inverse_pallas(params: Params, y: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Sampling-path mirror of step_forward_pallas (VERDICT r2 item 7):
    the coupling tail inverse runs as one fused Pallas pass, and the
    invconv+actnorm inverse reuses the channel_mix kernel with the inverted
    folded weights — x = y @ (diag(e^-s) W^{-1})^T - b maps onto the
    kernel's `matmul + bias` form with W_kernel = diag(e^-s) W^{-1} and
    bias_kernel = -b. The coupling CNN stays on XLA."""
    from .pallas.channel_mix import channel_mix
    from .pallas.coupling_tail import coupling_tail_inverse

    interpret = jax.default_backend() not in ("tpu", "axon")

    c = y.shape[-1]
    y_a, y_b = y[..., : c // 2], y[..., c // 2:]
    h = coupling_net_apply(params["coupling"]["net"], y_a, dtype)
    log_scale, bias = h[..., : c // 2], h[..., c // 2:]
    x_b = coupling_tail_inverse(log_scale, bias, y_b, interpret)
    x = jnp.concatenate([y_a, x_b], axis=-1)

    # x = y' @ w_fold^T + b_kernel with w_fold = diag(e^-s) W^{-1} [C, O]
    # and b_kernel = -an_bias (kernel epilogue adds after the matmul, which
    # is exactly the fused inverse's "- b" term).
    an, ic = params["actnorm"], params["invconv"]
    w_inv = invconv_inverse_weight(ic)               # [C, O]
    w_fold = jnp.exp(-an["scale"])[:, None] * w_inv  # [C, O]
    return channel_mix(x, w_fold, -an["bias"], interpret)


def step_ddinit(params: Params, x: jax.Array) -> Tuple[Params, jax.Array]:
    """Data-dependent init through one step: init the step's actnorm on its
    input, then run invconv, then init the coupling CNN's actnorms."""
    an, y = actnorm_ddinit(params["actnorm"], x)
    y, _ = invconv_forward(params["invconv"], y, jnp.zeros((x.shape[0],), jnp.float32))
    cp, y = coupling_ddinit(params["coupling"], y)
    return {"actnorm": an, "invconv": params["invconv"], "coupling": cp}, y
