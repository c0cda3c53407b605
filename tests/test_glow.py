"""Glow assembly tests: shapes, invertibility, ddinit, logdet exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpm_tpu.models import glow
from nfdpm_tpu.models import prior as prior_m

CFG = glow.GlowConfig(in_channels=3, levels=3, steps=2, coupling_width=32)


@pytest.fixture(scope="module")
def params():
    return glow.init_glow(jax.random.PRNGKey(0), CFG)


def test_latent_shapes_golden():
    """Reference golden values (utils.py:103-104): L=3, C=3, 32 ->
    [(6,16,16), (12,8,8), (48,4,4)] in CHW."""
    assert glow.latent_shapes_chw(CFG, 32) == [(6, 16, 16), (12, 8, 8), (48, 4, 4)]
    cfg5 = glow.GlowConfig(in_channels=3, levels=5, steps=1)
    shapes = glow.latent_shapes_chw(cfg5, 128)
    assert shapes[-1] == (2 ** 6 * 3, 4, 4)


def test_forward_shapes(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    latents, ldj, logp = glow.forward(params, CFG, x)
    expected = glow.latent_shapes_nhwc(CFG, 16)
    assert len(latents) == CFG.levels
    for z, (h, w, c) in zip(latents, expected):
        assert z.shape == (2, h, w, c)
    assert ldj.shape == (2,) and logp.shape == (2,)


def test_roundtrip_full_latents(params):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3)) * 0.2
    latents, _, _ = glow.forward(params, CFG, x)
    x2 = glow.inverse(params, CFG, latents)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-3)


def test_inverse_samples_missing_parts(params):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3)) * 0.2
    latents, _, _ = glow.forward(params, CFG, x)
    y = glow.inverse(params, CFG, [latents[-1]], key=jax.random.PRNGKey(4), temperature=0.7)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_ddinit_roundtrip_and_determinism(params):
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 16, 16, 3))
    p1 = glow.ddinit(params, CFG, x)
    p2 = glow.ddinit(params, CFG, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b), p1, p2)
    latents, ldj, logp = glow.forward(p1, CFG, x)
    x2 = glow.inverse(p1, CFG, latents)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-3)


def test_total_logdet_exact_tiny():
    """Full-flow log|det J| against autodiff on a tiny config."""
    cfg = glow.GlowConfig(in_channels=1, levels=2, steps=1, coupling_width=8)
    params = glow.init_glow(jax.random.PRNGKey(7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 4, 1)) * 0.3

    def flat_forward(v):
        latents, _, _ = glow.forward(params, cfg, v.reshape(x.shape))
        return jnp.concatenate([z.reshape(-1) for z in latents])

    jac = jax.jacfwd(flat_forward)(x.reshape(-1))
    ref_ldj = jnp.linalg.slogdet(jac)[1]
    _, ldj, _ = glow.forward(params, cfg, x)
    np.testing.assert_allclose(float(ldj[0]), float(ref_ldj), rtol=1e-3, atol=5e-3)


def test_gaussian_prior_logp_and_sample():
    p = prior_m.init_gaussian_prior(8)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 2, 2, 8))
    logp = prior_m.gaussian_prior_logp(p, x)
    # zero-init => standard normal
    from nfdpm_tpu.ops.bijectors import gaussian_logp

    np.testing.assert_allclose(logp, gaussian_logp(x, jnp.zeros(()), jnp.zeros(())), rtol=1e-6)
    s = prior_m.gaussian_prior_sample(p, jax.random.PRNGKey(10), (4, 2, 2, 8), temperature=0.5)
    assert s.shape == (4, 2, 2, 8)


def test_bits_per_dim_formula():
    ll = jnp.array([-1000.0, -2000.0])
    n_pixel = 32 * 32 * 3.0
    bpd = prior_m.bits_per_dim(ll, n_bins=32.0, n_pixel=n_pixel)
    expected = np.mean((np.log(32.0) * n_pixel - np.array([-1000.0, -2000.0])) * np.log2(np.e) / n_pixel)
    np.testing.assert_allclose(float(bpd), expected, rtol=1e-6)
