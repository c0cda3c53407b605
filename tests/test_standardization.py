"""Latent standardization (the real implementation of the scaling the
reference stubbed out as identity hooks, latent_formaters.py:68-86):
exact inverse, fitted-moment correctness, change-of-variables bookkeeping,
JSON persistence, and the DiffusionPrior NLL correction."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpm_tpu.models.formaters import (
    CatFormater,
    IdentityFormater,
    fit_formater_stats,
    stats_from_json,
)


def _random_parts(formater, rng, batch=4, scale=None, shift=None):
    parts = []
    for i, (h, w, c) in enumerate(formater.latent_shapes):
        z = rng.normal(size=(batch, h, w, c)).astype(np.float32)
        if scale is not None:
            z = z * scale + (shift if shift is not None else 0.0)
        parts.append(jnp.asarray(z))
    return parts


def _fake_stats(formater, rng):
    stats = []
    for (h, w, c) in formater.input_shapes:
        mean = rng.normal(size=c)
        std = rng.uniform(0.5, 4.0, size=c)
        stats.append((tuple(float(x) for x in mean),
                      tuple(float(x) for x in std)))
    return tuple(stats)


@pytest.mark.parametrize("cls,L", [(IdentityFormater, 2), (IdentityFormater, 3),
                                   (CatFormater, 3), (CatFormater, 4)])
def test_process_postprocess_exact_inverse_with_stats(cls, L):
    rng = np.random.default_rng(0)
    f0 = cls(L=L, in_channels=3, size=32)
    f = f0.with_stats(_fake_stats(f0, rng))
    parts = _random_parts(f, rng)
    rec = f.postprocess(f.process_latents(parts))
    assert len(rec) == len(parts)
    for a, b in zip(parts, rec):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_standardize_is_identity_without_stats():
    f = CatFormater(L=3, in_channels=3, size=32)
    rng = np.random.default_rng(1)
    parts = _random_parts(f, rng)
    out = f.process_latents(parts)
    # explicitly identical to the stats=None hook chain
    out2 = f.with_stats(None).process_latents(parts)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out2[0]))
    assert f.stats_log_sigma_total() == 0.0


@pytest.mark.parametrize("cls", [IdentityFormater, CatFormater])
def test_fit_formater_stats_recovers_moments(cls):
    """Latents drawn as sigma*N(0,1)+mu per part must fit back to ~(mu,
    sigma), and standardized processed parts must be ~N(0,1)."""
    rng = np.random.default_rng(2)
    f = cls(L=3, in_channels=3, size=32)
    shift, scale = 1.5, 3.0
    batches = [_random_parts(f, rng, batch=16, scale=scale, shift=shift)
               for _ in range(6)]
    stats = fit_formater_stats(f, iter(batches))
    assert len(stats) == f.num_parts
    for (mean, std), (h, w, c) in zip(stats, f.input_shapes):
        assert len(mean) == c and len(std) == c
        np.testing.assert_allclose(np.asarray(mean), shift, atol=0.25)
        np.testing.assert_allclose(np.asarray(std), scale, rtol=0.15)
    fs = f.with_stats(stats)
    out = fs.process_latents(batches[0])
    for z in out:
        zn = np.asarray(z)
        assert abs(zn.mean()) < 0.3
        assert abs(zn.std() - 1.0) < 0.2


def test_stats_log_sigma_total_manual():
    rng = np.random.default_rng(3)
    f0 = IdentityFormater(L=2, in_channels=3, size=32)
    stats = _fake_stats(f0, rng)
    f = f0.with_stats(stats)
    expect = 0.0
    for (h, w, c), (_m, s) in zip(f.input_shapes, stats):
        expect += h * w * float(np.sum(np.log(s)))
    assert np.isclose(f.stats_log_sigma_total(), expect, rtol=1e-12)


def test_stats_json_roundtrip():
    rng = np.random.default_rng(4)
    f0 = CatFormater(L=3, in_channels=3, size=32)
    stats = _fake_stats(f0, rng)
    rt = stats_from_json(json.loads(json.dumps(stats)))
    assert rt == stats
    assert stats_from_json(None) is None
    assert stats_from_json([]) is None


def test_diffusion_prior_nll_adds_change_of_variables_term():
    """neg_log_likelihood_nats must return NLL_standardized + sum(log std):
    with identical processed inputs fed to the diffusion models, the
    with-stats prior differs from the no-stats prior by EXACTLY the
    formater's stats_log_sigma_total()."""
    from nfdpm_tpu.models.diffusion_prior import DiffusionPrior

    rng = np.random.default_rng(5)
    f0 = IdentityFormater(L=2, in_channels=3, size=16)
    stats = _fake_stats(f0, rng)
    fs = f0.with_stats(stats)
    kw = dict(
        unet_kwargs={"dim": 8, "dim_mults": (1,), "resnet_block_groups": 4},
        diffusion_kwargs={"timesteps": 4, "beta_schedule": "linear",
                          "loss_type": "l2", "vlb_decoder": "density",
                          "vlb_clip_denoised": False},
    )
    dp0 = DiffusionPrior(formater=f0, **kw)
    dps = DiffusionPrior(formater=fs, **kw)
    params = dp0.init_params(0)

    raw = _random_parts(fs, rng, batch=2)
    # feed dp0 the ALREADY-standardized parts so both priors score the
    # identical tensors through identical weights
    standardized = fs.standardize_latents(raw)
    key = jax.random.PRNGKey(0)
    nll0 = np.asarray(dp0.neg_log_likelihood_nats(params, key, standardized))
    nlls = np.asarray(dps.neg_log_likelihood_nats(params, key, raw))
    # totals are O(1e5) fp32 nats: compare absolutes at fp32 resolution
    np.testing.assert_allclose(nlls, nll0 + fs.stats_log_sigma_total(),
                               rtol=1e-4)
    assert fs.stats_log_sigma_total() != 0.0


def test_interpolate_and_given_start_see_trained_space():
    """ADVICE r4 contract: interpolate_latents / sample_latents_given_start
    take PROCESSED (already-standardized) parts and run the diffusion chain
    on exactly those tensors — a with-stats prior must produce bit-identical
    outputs to a no-stats prior fed the same processed tensors (no hidden
    second standardize inside the call)."""
    from nfdpm_tpu.models.diffusion_prior import DiffusionPrior

    rng = np.random.default_rng(7)
    f0 = IdentityFormater(L=2, in_channels=3, size=16)
    fs = f0.with_stats(_fake_stats(f0, rng))
    kw = dict(
        unet_kwargs={"dim": 8, "dim_mults": (1,), "resnet_block_groups": 4},
        diffusion_kwargs={"timesteps": 4, "beta_schedule": "linear",
                          "loss_type": "l2"},
    )
    dp0 = DiffusionPrior(formater=f0, **kw)
    dps = DiffusionPrior(formater=fs, **kw)
    params = dp0.init_params(0)
    key = jax.random.PRNGKey(2)

    raw = _random_parts(fs, rng, batch=2)
    processed = fs.process_latents(raw)

    i0 = dp0.interpolate_latents(params, key,
                                 [p[:1] for p in processed],
                                 [p[1:2] for p in processed], lam=0.3)
    is_ = dps.interpolate_latents(params, key,
                                  [p[:1] for p in processed],
                                  [p[1:2] for p in processed], lam=0.3)
    for a, b in zip(i0, is_):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    g0 = dp0.sample_latents_given_start(params, key, processed)
    gs = dps.sample_latents_given_start(params, key, processed)
    for a, b in zip(g0, gs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the round trip back to raw latent space is exact
    rec = fs.postprocess(processed)
    for a, b in zip(raw, rec):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_sample_latents_inverts_standardization():
    """Samples come back in RAW latent space: sampling with stats equals
    inv-standardizing the no-stats samples drawn from the same keys."""
    from nfdpm_tpu.models.diffusion_prior import DiffusionPrior

    rng = np.random.default_rng(6)
    f0 = IdentityFormater(L=2, in_channels=3, size=16)
    stats = _fake_stats(f0, rng)
    fs = f0.with_stats(stats)
    kw = dict(
        unet_kwargs={"dim": 8, "dim_mults": (1,), "resnet_block_groups": 4},
        diffusion_kwargs={"timesteps": 4, "beta_schedule": "linear",
                          "loss_type": "l2"},
    )
    dp0 = DiffusionPrior(formater=f0, **kw)
    dps = DiffusionPrior(formater=fs, **kw)
    params = dp0.init_params(0)
    key = jax.random.PRNGKey(1)
    s0 = dp0.sample_latents(params, key, 2)
    ss = dps.sample_latents(params, key, 2)
    expect = fs.inv_standardize_latents(s0)
    for a, b in zip(expect, ss):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
