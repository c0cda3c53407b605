"""Gaussian diffusion (DDPM): schedules, losses, scan-based samplers, VLB.

TPU-native re-design of the reference's modified lucidrains GaussianDiffusion
(/root/reference/diffusion_prior/gaussian_diffusion.py:500-958):

  * Schedule constants are computed in fp64 numpy at build time and stored
    as fp32 device constants (mirroring the register_buffer pattern,
    gaussian_diffusion.py:601-634).
  * The T-step ancestral chain and the strided DDIM chain are single
    `lax.scan`s inside jit — one compiled program per shape instead of T
    Python-loop dispatches (the reference's tqdm loops,
    gaussian_diffusion.py:706-777). The t==0 no-noise case and the DDIM
    time_next<0 terminal case are `jnp.where` selects, keeping control flow
    compiler-friendly.
  * The full-T VLB/NLL evaluation (added by the reference author,
    gaussian_diffusion.py:869-958) is likewise one scan.
  * Objectives pred_noise / pred_x0 / pred_v, beta schedules
    linear/cosine/sigmoid, p2 reweighting, l1/l2 losses, self-conditioning,
    interpolation — all supported with matching formulas.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Beta schedules (gaussian_diffusion.py:501-537), fp64 numpy
# ---------------------------------------------------------------------------

def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000.0 / timesteps
    betas = np.linspace(scale * 1e-4, scale * 0.02, timesteps, dtype=np.float64)
    # Cap at 0.999 (improved-DDPM's max-beta rule, same cap the cosine
    # schedule applies): the 1000/T scaling drives beta to 1.0 for T<=20,
    # where alphas_cumprod hits exactly 0 and the x0-from-noise projection
    # (sqrt_recip_alphas_cumprod) becomes inf. No production T is affected
    # (T=1000 -> beta_end=0.02; even T=50 -> 0.4).
    return np.clip(betas, 0.0, 0.999)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    ac = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1
) -> np.ndarray:
    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    sigmoid = lambda v: 1 / (1 + np.exp(-v))
    v_start, v_end = sigmoid(start / tau), sigmoid(end / tau)
    ac = (-sigmoid((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


class Schedule(NamedTuple):
    """ᾱ-derived constants, fp32 (gaussian_diffusion.py:601-634)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    p2_loss_weight: np.ndarray
    log_betas: np.ndarray
    # Improved-DDPM's learned-variance interpolation frontier (Nichol &
    # Dhariwal 2021, eq. 15): the model's variance output interpolates in
    # log space between beta_t (upper) and beta-tilde_t (lower). The lower
    # endpoint substitutes posterior_variance[1] at t=0 (their
    # posterior_log_variance_clipped convention) — the t=0 posterior
    # variance is exactly 0, so its log is degenerate.
    posterior_log_variance_ipd: np.ndarray


def make_schedule(
    beta_schedule: str, timesteps: int, p2_gamma: float = 0.0, p2_k: float = 1.0
) -> Schedule:
    betas = _SCHEDULES[beta_schedule](timesteps)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    f32 = lambda a: np.asarray(a, np.float32)
    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(ac),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1 - ac)),
        log_one_minus_alphas_cumprod=f32(np.log(1 - ac)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1 / ac)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1 / ac - 1)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(np.log(np.maximum(post_var, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1 - ac)),
        posterior_mean_coef2=f32((1 - ac_prev) * np.sqrt(alphas) / (1 - ac)),
        p2_loss_weight=f32((p2_k + ac / (1 - ac)) ** -p2_gamma),
        log_betas=f32(np.log(betas)),
        posterior_log_variance_ipd=f32(
            np.log(np.append(post_var[1] if len(post_var) > 1 else betas[0],
                             post_var[1:]))),
    )


def _extract(a, t, ndim: int):
    """a[t] broadcast to an ndim tensor (gaussian_diffusion.py:493-496)."""
    out = jnp.take(jnp.asarray(a), t)
    return out.reshape(t.shape[0], *((1,) * (ndim - 1)))


# ---------------------------------------------------------------------------
# KL / discretized likelihood helpers (gaussian_diffusion.py:36-74)
# ---------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + (mean1 - mean2) ** 2 * jnp.exp(-logvar2)
    )


def gaussian_log_likelihood(x, means, log_scales, bin_eps: float = 1e-1):
    """Discretized Gaussian log-likelihood via the tanh CDF approximation
    (gaussian_diffusion.py:46-74; the reference uses +-0.1 bins)."""

    def approx_cdf(v):
        return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (v + 0.044715 * v ** 3)))

    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_delta = approx_cdf(inv_stdv * (centered + bin_eps)) - approx_cdf(
        inv_stdv * (centered - bin_eps)
    )
    return jnp.log(jnp.maximum(cdf_delta, 1e-12))


def _mean_flat(t):
    return jnp.mean(t.reshape(t.shape[0], -1), axis=1)


# ---------------------------------------------------------------------------
# GaussianDiffusion
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    image_size: int
    channels: int = 3
    timesteps: int = 1000
    sampling_timesteps: Optional[int] = None
    loss_type: str = "l1"           # 'l1' | 'l2'
    objective: str = "pred_noise"   # 'pred_noise' | 'pred_x0' | 'pred_v'
    beta_schedule: str = "sigmoid"  # 'linear' | 'cosine' | 'sigmoid'
    p2_loss_weight_gamma: float = 0.0
    p2_loss_weight_k: float = 1.0
    ddim_sampling_eta: float = 0.0
    auto_normalize: bool = True
    self_condition: bool = False
    learned_variance: bool = False  # improved-DDPM (Nichol & Dhariwal
    # 2021) learned reverse variances: the model outputs 2C channels —
    # [prediction, v] — and the reverse log-variance interpolates
    # v-fractionally between log(beta_t) and log(beta-tilde_t). Training
    # adds the hybrid loss's VLB term (gradients reach ONLY the variance
    # half, the mean half is stop-gradded — paper §3.1), samplers draw
    # with the learned variance, and the full-T VLB scores it. GREENFIELD:
    # the reference's vendored lucidrains code declares a learned_variance
    # flag but never implements the variance path; the thesis's
    # fixed-variance VLB carries an irreducible ~0.64 nats/dim overhead at
    # T=1000 (docs/CIFAR_E2E.md oracle) that this removes.
    vlb_loss_weight: float = 1.0  # multiplier on the hybrid loss's
    # canonical lambda*L_vlb term (the T/1000 scaling of the per-t VLB
    # estimate == the paper's lambda=0.001 on the full L_vlb). Only used
    # when learned_variance=True.
    vlb_clip_denoised: bool = True  # VLB/NLL eval only: clamp x0
    # predictions to [-1,1] inside the scored reverse chain (reference-
    # exact, gaussian_diffusion.py:869+:clip_denoised=True). Set false for
    # latent-space priors — latents beyond [-1,1] make the clamped chain's
    # KL terms explode. 'density' decoder always scores unclamped.
    vlb_decoder: str = "discretized"  # t=0 decoder term of the VLB/NLL:
    # 'discretized' = reference-exact ±0.1-bin tanh-CDF likelihood
    # (gaussian_diffusion.py:46-74); 'density' = continuous Gaussian
    # log-density (no [-1,1] x0 clamp) — the calibrated choice for
    # LATENT-space VLBs composed with a flow logdet (see _vb_terms_bpd).
    sampling_method: str = "auto"   # 'auto' | 'ancestral' | 'ddim' | 'dpm++'
    # 'auto' reproduces the reference dispatch (DDIM iff
    # sampling_timesteps < timesteps, gaussian_diffusion.py:779-783).
    # 'dpm++' is greenfield: DPM-Solver++(2M) (Lu et al. 2022), a
    # 2nd-order multistep ODE solver over the same strided time grid —
    # comparable sample quality at ~4x fewer UNet calls than DDIM-100,
    # so FID-scale generation wall-clock drops proportionally.
    vlb_time_chunk: int = 1
    # Full-T VLB (neg_log_likelihood): evaluate `vlb_time_chunk` timesteps
    # per UNet call by folding them into the batch dim. The VLB's T terms
    # are independent given x_start, and each term's noise is
    # fold_in(key, t) regardless of grouping, so every term is IDENTICAL
    # to the sequential evaluation — only the fp32 summation order
    # changes. At batch 64 / UNet-64 the chain is dispatch-bound; chunk 4
    # reaches the measured batch-256 throughput sweet spot (BENCH.md).
    scan_unroll: int = 1  # lax.scan unroll factor for the sampler chains;
    # at 16^2-latent/dim-64 UNet scale each step is dispatch-overhead-bound
    # on TPU, and unrolling lets XLA fuse/overlap across steps (BENCH.md)


class GaussianDiffusion:
    """Pure-functional diffusion process around a `model_apply(params, x, t,
    self_cond) -> out` callable (typically `Unet.apply` bound to variables).

    All methods are jit-safe pure functions of (params, arrays, keys).

    Contract note: sampler chains call `model_apply` with a LENGTH-1 time
    vector (t is uniform across the batch mid-chain), relying on numpy
    broadcasting over the batch dim — true of the UNet here and of any
    elementwise/gather-based model. Training losses pass per-sample [B] t.

    `batch_sharding` (optional `jax.sharding.Sharding`): when set, every
    sampler chain constrains its initial noise to it via
    `with_sharding_constraint`, so under a device mesh the whole denoise
    scan runs batch-sharded (data-parallel FID-scale generation over ICI —
    greenfield vs the reference's single-GPU tqdm loops,
    gaussian_diffusion.py:695-777)."""

    def __init__(self, model_apply: Callable, cfg: DiffusionConfig,
                 batch_sharding=None):
        self.model_apply = model_apply
        self.cfg = cfg
        self.batch_sharding = batch_sharding
        self.sched = make_schedule(
            cfg.beta_schedule, cfg.timesteps, cfg.p2_loss_weight_gamma, cfg.p2_loss_weight_k
        )
        self.num_timesteps = cfg.timesteps
        self.sampling_timesteps = cfg.sampling_timesteps or cfg.timesteps
        assert self.sampling_timesteps <= cfg.timesteps
        self.is_ddim_sampling = self.sampling_timesteps < cfg.timesteps

    def _constrain(self, x):
        """Batch-shard a sampler-chain tensor if a sharding was given."""
        if self.batch_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, self.batch_sharding)

    # -- normalization (gaussian_diffusion.py:150-155, 637) ---------------
    def normalize(self, x):
        return x * 2.0 - 1.0 if self.cfg.auto_normalize else x

    def unnormalize(self, x):
        return (x + 1.0) * 0.5 if self.cfg.auto_normalize else x

    # -- q process --------------------------------------------------------
    def q_sample(self, x_start, t, noise):
        s = self.sched
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_mean_variance(self, x_start, t):
        s = self.sched
        mean = _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        var = _extract(1.0 - s.alphas_cumprod, t, x_start.ndim)
        logvar = _extract(s.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, var, logvar

    def q_posterior(self, x_start, x_t, t):
        s = self.sched
        mean = (
            _extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        var = _extract(s.posterior_variance, t, x_t.ndim)
        logvar = _extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, logvar

    # -- objective conversions (gaussian_diffusion.py:640-676) ------------
    def predict_start_from_noise(self, x_t, t, noise):
        s = self.sched
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.sched
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def predict_v(self, x_start, t, noise):
        s = self.sched
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * noise
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        s = self.sched
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
        )

    def _split_model_out(self, out):
        """[prediction, raw variance interpolant] when learned_variance;
        (out, None) otherwise. The split is along channels, matching the
        UNet's effective_out_dim = 2*channels layout."""
        if not self.cfg.learned_variance:
            return out, None
        return jnp.split(out, 2, axis=-1)

    def _learned_logvar(self, var_raw, t, ndim: int):
        """Interpolated log-variance (improved-DDPM eq. 15): the raw model
        output is mapped to a fraction f = (v+1)/2 and
        logvar = f*log(beta_t) + (1-f)*log(beta-tilde_t)."""
        s = self.sched
        frac = (var_raw + 1.0) * 0.5
        min_log = _extract(s.posterior_log_variance_ipd, t, ndim)
        max_log = _extract(s.log_betas, t, ndim)
        return frac * max_log + (1.0 - frac) * min_log

    def model_predictions(self, params, x, t, x_self_cond=None,
                          clip_x_start=False, model_out=None,
                          return_var=False):
        """`model_out` short-circuits the model call (used by the hybrid
        loss to score the VLB term on the SAME forward pass);
        `return_var=True` appends the raw variance interpolant (None unless
        learned_variance)."""
        out = (self.model_apply(params, x, t, x_self_cond)
               if model_out is None else model_out)
        out, var_raw = self._split_model_out(out)
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)
        if self.cfg.objective == "pred_noise":
            pred_noise = out
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
        elif self.cfg.objective == "pred_x0":
            x_start = clip(out)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        elif self.cfg.objective == "pred_v":
            x_start = clip(self.predict_start_from_v(x, t, out))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:
            raise ValueError(self.cfg.objective)
        if return_var:
            return pred_noise, x_start, var_raw
        return pred_noise, x_start

    def p_mean_variance(self, params, x, t, x_self_cond=None,
                        clip_denoised=True, model_out=None):
        _, x_start, var_raw = self.model_predictions(
            params, x, t, x_self_cond, model_out=model_out, return_var=True)
        if clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        mean, var, logvar = self.q_posterior(x_start, x, t)
        if self.cfg.learned_variance:
            logvar = self._learned_logvar(var_raw, t, x.ndim)
            var = jnp.exp(logvar)
        return mean, var, logvar, x_start

    # -- training loss (gaussian_diffusion.py:823-867) --------------------
    def p_losses(self, params, key, x_start, t, noise=None):
        k_noise, k_sc, k_scdrop = jax.random.split(key, 3)
        if noise is None:
            noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x = self.q_sample(x_start, t, noise)

        x_self_cond = None
        if self.cfg.self_condition:
            def with_sc(_):
                _, x0 = self.model_predictions(params, x, t)
                return jax.lax.stop_gradient(x0)

            x_self_cond = jax.lax.cond(
                jax.random.bernoulli(k_scdrop),
                with_sc,
                lambda _: jnp.zeros_like(x),
                operand=None,
            )

        out_full = self.model_apply(params, x, t, x_self_cond)
        out, var_raw = self._split_model_out(out_full)
        if self.cfg.objective == "pred_noise":
            target = noise
        elif self.cfg.objective == "pred_x0":
            target = x_start
        elif self.cfg.objective == "pred_v":
            target = self.predict_v(x_start, t, noise)
        else:
            raise ValueError(self.cfg.objective)

        if self.cfg.loss_type == "l1":
            loss = jnp.abs(out - target)
        elif self.cfg.loss_type == "l2":
            loss = (out - target) ** 2
        else:
            raise ValueError(self.cfg.loss_type)
        loss = _mean_flat(loss)
        loss = loss * jnp.take(jnp.asarray(self.sched.p2_loss_weight), t)
        loss = jnp.mean(loss)

        if self.cfg.learned_variance:
            # Hybrid loss (improved-DDPM §3.1): L_simple + lambda*L_vlb on
            # the SAME forward pass, with the prediction half stop-gradded
            # so the VLB trains only the variance output. The per-t VLB
            # term times T/1000 is the paper's lambda=0.001 * L_vlb
            # estimate (uniform-t sampling: E_t[L_t] = L_vlb / T).
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(out), var_raw], axis=-1)
            vb = self._vb_terms_bpd(
                params, x_start, x, t, x_self_cond, clip_denoised=False,
                model_out=frozen)
            loss = loss + (
                self.cfg.vlb_loss_weight
                * (self.num_timesteps / 1000.0)
                * jnp.mean(vb))
        return loss

    def loss(self, params, key, img):
        """forward() semantics: t ~ U[0, T), normalize, p_losses
        (gaussian_diffusion.py:861-867)."""
        k_t, k_p = jax.random.split(key)
        t = jax.random.randint(k_t, (img.shape[0],), 0, self.num_timesteps)
        return self.p_losses(params, k_p, self.normalize(img), t)

    # -- ancestral sampling as ONE scan (gaussian_diffusion.py:695-733) ---
    def p_sample_loop(self, params, key, shape, return_all_timesteps: bool = False):
        """`return_all_timesteps=True` stacks the trajectory [B, T+1, ...]
        (x_T first), matching gaussian_diffusion.py:720-731."""
        k_init, k_loop = jax.random.split(key)
        img0 = self._constrain(jax.random.normal(k_init, shape))

        def body(carry, t):
            img, x_sc = carry
            sc = x_sc if self.cfg.self_condition else None
            # t is uniform across the batch inside a sampler chain: a
            # length-1 time vector broadcasts bit-identically through the
            # time-MLP/FiLM/_extract gathers and skips B-1 redundant
            # embedding computations per step.
            tb = jnp.full((1,), t, jnp.int32)
            mean, _, logvar, x_start = self.p_mean_variance(
                params, img, tb, sc, clip_denoised=True
            )
            noise = jax.random.normal(jax.random.fold_in(k_loop, t), shape)
            img = mean + jnp.where(t > 0, jnp.exp(0.5 * logvar), 0.0) * noise
            return (img, x_start), (img if return_all_timesteps else None)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (img, _), traj = jax.lax.scan(body, (img0, jnp.zeros(shape)), ts,
                                      unroll=self.cfg.scan_unroll)
        if return_all_timesteps:
            all_imgs = jnp.concatenate([img0[None], traj], axis=0)
            return self.unnormalize(jnp.swapaxes(all_imgs, 0, 1))
        return self.unnormalize(img)

    # -- DDIM sampling as ONE scan (gaussian_diffusion.py:735-777) --------
    def ddim_sample(self, params, key, shape, return_all_timesteps: bool = False):
        eta = self.cfg.ddim_sampling_eta
        times = np.linspace(-1, self.num_timesteps - 1, self.sampling_timesteps + 1)
        times = list(reversed(times.astype(int).tolist()))
        pairs = np.asarray(list(zip(times[:-1], times[1:])), np.int32)  # [(T-1,...), ..., (0,-1)]

        k_init, k_loop = jax.random.split(key)
        img0 = self._constrain(jax.random.normal(k_init, shape))
        ac = jnp.asarray(self.sched.alphas_cumprod)

        def body(carry, pair):
            img, x_sc, i = carry
            t, t_next = pair[0], pair[1]
            sc = x_sc if self.cfg.self_condition else None
            tb = jnp.full((1,), t, jnp.int32)  # batch-uniform t (see above)
            pred_noise, x_start = self.model_predictions(
                params, img, tb, sc, clip_x_start=True
            )
            alpha = ac[t]
            # t_next < 0 => alpha_next=1 => sigma=0, c=0 => img = x_start,
            # exactly the reference's terminal branch.
            alpha_next = jnp.where(t_next < 0, 1.0, ac[jnp.maximum(t_next, 0)])
            sigma = eta * jnp.sqrt(
                jnp.maximum((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
            )
            c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma ** 2, 0.0))
            noise = jax.random.normal(jax.random.fold_in(k_loop, i), shape)
            img = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            return (img, x_start, i + 1), (img if return_all_timesteps else None)

        (img, _, _), traj = jax.lax.scan(
            body, (img0, jnp.zeros(shape), jnp.int32(0)), jnp.asarray(pairs),
            unroll=self.cfg.scan_unroll,
        )
        if return_all_timesteps:
            all_imgs = jnp.concatenate([img0[None], traj], axis=0)
            return self.unnormalize(jnp.swapaxes(all_imgs, 0, 1))
        return self.unnormalize(img)

    # -- DPM-Solver++(2M) as ONE scan (greenfield; no reference equiv.) ----
    def dpmpp_sample(self, params, key, shape, return_all_timesteps: bool = False):
        """DPM-Solver++(2M): 2nd-order multistep solver of the probability-
        flow ODE in data-prediction form (Lu et al., arXiv:2211.01095,
        Algorithm 2), over the SAME strided grid as `ddim_sample`
        (linspace(-1, T-1, S+1) — the reference's tau_i grid,
        gaussian_diffusion.py:740).

        Update (log-SNR lambda_t = log(alpha_t / sigma_t), h_i = lambda_{t_i}
        - lambda_{t_{i-1}}, r_i = h_{i-1} / h_i):

            D_i     = (1 + 1/(2 r_i)) * x0_i - 1/(2 r_i) * x0_{i-1}
            x_{t_i} = alpha_{t_i} * D_i + sigma_{t_i} * (x - alpha * D_i) / sigma

        which is algebraically the paper's exponential-integrator step
        (sigma_next/sigma * x - alpha_next (e^{-h}-1) D). The first step and
        the terminal step (h = inf => 1/(2r) = 0) are first-order, i.e.
        exactly a DDIM(eta=0) step. The extrapolation coefficients
        c_i = h_{i-1}/(2 h_i) depend only on the static grid, so they are
        precomputed host-side in fp64 and fed to the scan as constants.

        x0 predictions are clipped to [-1, 1], matching the convention of
        every other sampler here AND the reference's own latent sampling
        path (gaussian_diffusion.py:753 passes clip_x_start=True
        unconditionally)."""
        times = np.linspace(-1, self.num_timesteps - 1, self.sampling_timesteps + 1)
        times = list(reversed(times.astype(int).tolist()))  # [T-1, ..., -1]
        ac64 = np.asarray(self.sched.alphas_cumprod, np.float64)

        def lam(t: int) -> float:
            return math.inf if t < 0 else 0.5 * (
                math.log(ac64[t]) - math.log1p(-ac64[t]))

        hs = [lam(t_next) - lam(t) for t, t_next in zip(times[:-1], times[1:])]
        cs = [0.0] + [
            0.0 if math.isinf(h) else h_prev / (2.0 * h)
            for h_prev, h in zip(hs[:-1], hs[1:])
        ]
        t_in = np.asarray(times[:-1], np.int32)
        ac_next_in = np.asarray(
            [1.0 if tn < 0 else ac64[tn] for tn in times[1:]], np.float32)
        c_in = np.asarray(cs, np.float32)

        k_init, _ = jax.random.split(key)  # split mirrors the other chains
        img0 = self._constrain(jax.random.normal(k_init, shape))
        ac = jnp.asarray(self.sched.alphas_cumprod)

        def body(carry, inp):
            img, x0_prev = carry
            t, ac_next, c = inp
            sc = x0_prev if self.cfg.self_condition else None
            tb = jnp.full((1,), t, jnp.int32)  # batch-uniform t (class docstring)
            _, x0 = self.model_predictions(params, img, tb, sc, clip_x_start=True)
            x0_d = (1.0 + c) * x0 - c * x0_prev
            ac_t = ac[t]
            eps_d = (img - jnp.sqrt(ac_t) * x0_d) * jax.lax.rsqrt(1.0 - ac_t)
            img = jnp.sqrt(ac_next) * x0_d + jnp.sqrt(1.0 - ac_next) * eps_d
            return (img, x0), (img if return_all_timesteps else None)

        (img, _), traj = jax.lax.scan(
            body, (img0, jnp.zeros(shape)),
            (jnp.asarray(t_in), jnp.asarray(ac_next_in), jnp.asarray(c_in)),
            unroll=self.cfg.scan_unroll,
        )
        if return_all_timesteps:
            all_imgs = jnp.concatenate([img0[None], traj], axis=0)
            return self.unnormalize(jnp.swapaxes(all_imgs, 0, 1))
        return self.unnormalize(img)

    def sample_given_start(self, params, key, x_start):
        """Noise x_start to t=T-1 via q_sample, then run the full ancestral
        chain back (reference DiffusionModel.sample_latent_given_start,
        /root/reference/diffusion_prior/model.py:57-70)."""
        shape = x_start.shape
        k_q, k_loop = jax.random.split(key)
        tb = jnp.full((shape[0],), self.num_timesteps - 1, jnp.int32)
        img0 = self._constrain(
            self.q_sample(x_start, tb, jax.random.normal(k_q, shape)))

        def body(carry, t):
            img, x_sc = carry
            sc = x_sc if self.cfg.self_condition else None
            ttb = jnp.full((1,), t, jnp.int32)  # batch-uniform t (see above)
            mean, _, logvar, x0 = self.p_mean_variance(params, img, ttb, sc, True)
            noise = jax.random.normal(jax.random.fold_in(k_loop, t), shape)
            img = mean + jnp.where(t > 0, jnp.exp(0.5 * logvar), 0.0) * noise
            return (img, x0), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (img, _), _ = jax.lax.scan(body, (img0, jnp.zeros(shape)), ts,
                                   unroll=self.cfg.scan_unroll)
        return self.unnormalize(img)

    def sample(self, params, key, batch_size: int = 16,
               return_all_timesteps: bool = False):
        shape = (batch_size, self.cfg.image_size, self.cfg.image_size, self.cfg.channels)
        method = self.cfg.sampling_method
        if method == "auto":
            method = "ddim" if self.is_ddim_sampling else "ancestral"
        if method == "dpm++":
            return self.dpmpp_sample(params, key, shape, return_all_timesteps)
        if method == "ddim":
            return self.ddim_sample(params, key, shape, return_all_timesteps)
        if method == "ancestral":
            return self.p_sample_loop(params, key, shape, return_all_timesteps)
        raise ValueError(f"unknown sampling_method: {method!r}")

    # -- interpolation (gaussian_diffusion.py:785-804) --------------------
    def interpolate(self, params, key, x1, x2, t: Optional[int] = None, lam: float = 0.5):
        t = self.num_timesteps - 1 if t is None else t
        shape = x1.shape
        k_q1, k_q2, k_loop = jax.random.split(key, 3)
        tb = jnp.full((1,), t, jnp.int32)  # batch-uniform t (class docstring)
        xt1 = self.q_sample(x1, tb, jax.random.normal(k_q1, shape))
        xt2 = self.q_sample(x2, tb, jax.random.normal(k_q2, shape))
        img0 = (1 - lam) * xt1 + lam * xt2

        def body(carry, i):
            img, x_sc = carry
            sc = x_sc if self.cfg.self_condition else None
            ib = jnp.full((1,), i, jnp.int32)
            mean, _, logvar, x_start = self.p_mean_variance(params, img, ib, sc, True)
            noise = jax.random.normal(jax.random.fold_in(k_loop, i), shape)
            img = mean + jnp.where(i > 0, jnp.exp(0.5 * logvar), 0.0) * noise
            return (img, x_start), None

        (img, _), _ = jax.lax.scan(body, (img0, jnp.zeros(shape)), jnp.arange(t - 1, -1, -1))
        return img

    # -- VLB / NLL in bits (gaussian_diffusion.py:869-958) ----------------
    def _vb_terms_bpd(self, params, x_start, x_t, t, x_self_cond=None,
                      clip_denoised=True, model_out=None):
        if self.cfg.vlb_decoder == "density" or not self.cfg.vlb_clip_denoised:
            # clamping x0 predictions to the image range [-1,1]
            # (clip_denoised, inherited from the reference's image-space
            # lucidrains base) scores a clamped reverse chain; flow latents
            # live outside [-1,1], where the clamp inflates the KL terms by
            # orders of magnitude. vlb_clip_denoised=false (and always in
            # density mode) scores the unclamped chain instead.
            clip_denoised = False
        true_mean, _, true_logvar = self.q_posterior(x_start, x_t, t)
        model_mean, _, model_logvar, _ = self.p_mean_variance(
            params, x_t, t, x_self_cond, clip_denoised, model_out=model_out
        )
        model_mean = jax.lax.stop_gradient(model_mean)
        kl = _mean_flat(normal_kl(true_mean, true_logvar, model_mean, model_logvar))
        if self.cfg.vlb_decoder == "density":
            # continuous Gaussian log-density at t=0: keeps the VLB a
            # coherent bound on the model's continuous density, so it
            # composes with a flow's change-of-variables into a calibrated
            # image bits/dim (the reference's ±0.1-bin discretized decoder,
            # gaussian_diffusion.py:46-74, saturates to -log P(bin) ≈ 0
            # once the t=0 posterior std (~sqrt(beta_1), often ~1e-2) drops
            # below the bin width — see docs/CIFAR_E2E.md).
            # The schedule's t=0 posterior variance is exactly 0 (clamped
            # to 1e-20, lucidrains-exact) — a density there is degenerate;
            # substitute the t=1 posterior variance, improved-DDPM's own
            # posterior_log_variance_clipped convention.
            lv_floor = float(np.log(max(
                float(self.sched.posterior_variance[min(
                    1, len(self.sched.posterior_variance) - 1)]), 1e-20)))
            dens_logvar = jnp.maximum(model_logvar, lv_floor)
            decoder_nll = -_mean_flat(
                -0.5 * np.log(2.0 * np.pi) - 0.5 * dens_logvar
                - 0.5 * (x_start - model_mean) ** 2 * jnp.exp(-dens_logvar)
            )
        elif self.cfg.vlb_decoder == "discretized":
            decoder_nll = -_mean_flat(
                gaussian_log_likelihood(x_start, model_mean, 0.5 * model_logvar)
            )
        else:
            raise ValueError(
                f"unknown vlb_decoder: {self.cfg.vlb_decoder!r} "
                "(expected 'discretized' or 'density')")
        return jnp.where(t == 0, decoder_nll, kl)

    def _prior_bpd(self, x_start):
        b = x_start.shape[0]
        t = jnp.full((b,), self.num_timesteps - 1, jnp.int32)
        qt_mean, _, qt_logvar = self.q_mean_variance(x_start, t)
        return _mean_flat(normal_kl(qt_mean, qt_logvar, 0.0, 0.0))

    def neg_log_likelihood(self, params, key, x_start, x_self_cond=None, clip_denoised=True):
        """Full-T VLB per batch element, in nats-per-dim terms matching the
        reference's `calc_neg_log_likelihood_loop` (one scan over T).

        NOTE: the reference sums mean-per-dim KLs over T and adds the prior
        term; units are therefore 'per-dim' KL sums, not bits — we match it
        exactly for parity (callers convert to bits).

        `cfg.vlb_time_chunk` > 1 folds that many timesteps into the batch
        dim per UNet call (TPU throughput; see the config-field comment) —
        every term stays identical to the sequential evaluation because
        each term's noise key is fold_in(key, t) either way."""
        b = x_start.shape[0]
        chunk = max(1, int(self.cfg.vlb_time_chunk))

        def term_sum(acc, ts_vec):
            """Sum of VLB terms for the |ts_vec| timesteps, each evaluated
            at full batch b, folded into one [|ts|*b] model call."""
            c = ts_vec.shape[0]
            keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(ts_vec)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, x_start.shape))(keys)
            xs = jnp.broadcast_to(x_start, (c, *x_start.shape))
            # c == 1 keeps the batch-uniform length-1 t fast path (class
            # docstring); c > 1 needs per-sample t, [c*b]
            tb = ts_vec if c == 1 else jnp.repeat(ts_vec, b)
            x_t = self.q_sample(
                xs.reshape(c * b, *x_start.shape[1:]),
                tb, noise.reshape(c * b, *x_start.shape[1:]))
            sc = None
            if x_self_cond is not None:
                sc = jnp.broadcast_to(
                    x_self_cond, (c, *x_self_cond.shape)
                ).reshape(c * b, *x_self_cond.shape[1:])
            vb = self._vb_terms_bpd(
                params, xs.reshape(c * b, *x_start.shape[1:]), x_t, tb, sc,
                clip_denoised)
            return acc + jnp.sum(vb.reshape(c, b), axis=0), None

        ts = np.arange(self.num_timesteps - 1, -1, -1)
        n_chunked = (len(ts) // chunk) * chunk
        vb_sum, _ = jax.lax.scan(
            term_sum, jnp.zeros((b,)),
            jnp.asarray(ts[:n_chunked].reshape(-1, chunk)))
        if n_chunked < len(ts):  # T % chunk remainder, one extra call
            vb_sum, _ = term_sum(vb_sum, jnp.asarray(ts[n_chunked:]))
        return vb_sum + self._prior_bpd(x_start)
