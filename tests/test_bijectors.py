"""Unit tests for the flow bijectors: invertibility, exact log-determinants
(vs autodiff Jacobians), and the data-dependent-init contract.

Mirrors and extends the reference's tests
(/root/reference/tests/transformations.py) per SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpm_tpu.ops import bijectors as bj

EPS = 1e-3  # reference tolerance (tests/transformations.py:7)


def rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def exact_logdet(fn, x1):
    """log|det J| of fn at a single example x1 [H, W, C] via jacfwd."""
    flat_fn = lambda v: fn(v.reshape(x1.shape)).reshape(-1)
    jac = jax.jacfwd(flat_fn)(x1.reshape(-1))
    return jnp.linalg.slogdet(jac)[1]


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 16)


class TestActNorm:
    def test_roundtrip(self, keys):
        params = bj.init_actnorm(8)
        params = {"scale": rand(keys[0], (8,)) * 0.1, "bias": rand(keys[1], (8,))}
        x = rand(keys[2], (4, 6, 6, 8))
        y, ldj = bj.actnorm_forward(params, x, jnp.zeros((4,)))
        x2 = bj.actnorm_inverse(params, y)
        np.testing.assert_allclose(x2, x, atol=EPS)
        assert y.shape == x.shape

    def test_ddinit_normalizes(self, keys):
        x = rand(keys[3], (16, 8, 8, 4)) * 3.0 + 1.5
        params, y = bj.actnorm_ddinit(bj.init_actnorm(4), x)
        np.testing.assert_allclose(jnp.mean(y, axis=(0, 1, 2)), 0.0, atol=1e-4)
        np.testing.assert_allclose(jnp.std(y, axis=(0, 1, 2), ddof=1), 1.0, atol=1e-2)

    def test_logdet_exact(self, keys):
        params = {"scale": rand(keys[4], (3,)) * 0.3, "bias": rand(keys[5], (3,))}
        x = rand(keys[6], (1, 4, 4, 3))
        _, ldj = bj.actnorm_forward(params, x, jnp.zeros((1,)))
        ref = exact_logdet(
            lambda v: bj.actnorm_forward(params, v[None], jnp.zeros((1,)))[0][0], x[0]
        )
        np.testing.assert_allclose(ldj[0], ref, rtol=1e-4)


class TestInvConv:
    def test_roundtrip(self, keys):
        params = bj.init_invconv(keys[0], 12)
        x = rand(keys[1], (4, 6, 6, 12))
        y, ldj = bj.invconv_forward(params, x, jnp.zeros((4,)))
        x2 = bj.invconv_inverse(params, y)
        np.testing.assert_allclose(x2, x, atol=EPS)

    def test_logdet_exact(self, keys):
        params = bj.init_invconv(keys[2], 4)
        x = rand(keys[3], (1, 3, 3, 4))
        _, ldj = bj.invconv_forward(params, x, jnp.zeros((1,)))
        ref = exact_logdet(
            lambda v: bj.invconv_forward(params, v[None], jnp.zeros((1,)))[0][0], x[0]
        )
        np.testing.assert_allclose(ldj[0], ref, rtol=1e-4, atol=1e-4)

    def test_plu_matches_weight(self, keys):
        """PLU reassembly reproduces the decomposed weight exactly."""
        w = jnp.linalg.qr(jax.random.normal(keys[4], (16, 16)))[0]
        params = bj.plu_from_weight(w)
        np.testing.assert_allclose(bj.invconv_weight(params), w, atol=1e-5)

    def test_logdet_matches_slogdet(self, keys):
        params = bj.init_invconv(keys[5], 8)
        w = bj.invconv_weight(params)
        np.testing.assert_allclose(
            jnp.sum(params["log_s"]), jnp.linalg.slogdet(w)[1], rtol=1e-5, atol=1e-5
        )

    def test_full_param_mode_matches_plu(self, keys):
        """The full-W parameterization (reference-exact, used for trajectory
        parity) computes the same function + logdet as the PLU default when
        both hold the same weight."""
        w = jnp.linalg.qr(jax.random.normal(keys[6], (12, 12)))[0] * 1.3
        plu = bj.plu_from_weight(w)
        full = {"weight": jnp.asarray(w, jnp.float32)}
        x = rand(keys[7], (3, 4, 4, 12))
        y_p, ldj_p = bj.invconv_forward(plu, x, jnp.zeros((3,)))
        y_f, ldj_f = bj.invconv_forward(full, x, jnp.zeros((3,)))
        np.testing.assert_allclose(y_f, y_p, atol=1e-4)
        np.testing.assert_allclose(ldj_f, ldj_p, rtol=1e-5, atol=1e-4)
        # roundtrip through the general-inverse path
        np.testing.assert_allclose(bj.invconv_inverse(full, y_f), x, atol=EPS)
        # fused actnorm+invconv agrees across parameterizations too
        an = {"scale": rand(keys[8], (12,)) * 0.1, "bias": rand(keys[9], (12,)) * 0.1}
        z_p, l_p = bj.fused_actnorm_invconv_forward(an, plu, x, jnp.zeros((3,)))
        z_f, l_f = bj.fused_actnorm_invconv_forward(an, full, x, jnp.zeros((3,)))
        np.testing.assert_allclose(z_f, z_p, atol=1e-4)
        np.testing.assert_allclose(l_f, l_p, rtol=1e-5, atol=1e-4)

    def test_full_param_mode_is_trainable_leaf(self, keys):
        """init_invconv_full produces a single trainable 'weight' leaf (no
        frozen PLU constants for the optimizer mask to exclude)."""
        from nfdpm_tpu.training.optim import trainable_mask

        params = bj.init_invconv_full(keys[10], 6)
        assert set(params) == {"weight"}
        mask = trainable_mask(params)
        assert mask["weight"] is True


class TestAffineCoupling:
    def test_roundtrip(self, keys):
        params = bj.init_coupling(keys[0], 8, width=32)
        # randomize the zero-init tail so the coupling is non-trivial
        params["net"]["zconv"]["w"] = rand(keys[1], params["net"]["zconv"]["w"].shape) * 0.1
        params["net"]["zconv"]["b"] = rand(keys[2], params["net"]["zconv"]["b"].shape) * 0.1
        x = rand(keys[3], (4, 6, 6, 8))
        y, ldj = bj.coupling_forward(params, x, jnp.zeros((4,)))
        x2 = bj.coupling_inverse(params, y)
        np.testing.assert_allclose(x2, x, atol=EPS)

    def test_identity_at_init(self, keys):
        """Zero-init tail => log_scale=0, bias=0 => y_b = x_b * sigmoid(2)."""
        params = bj.init_coupling(keys[4], 8, width=32)
        x = rand(keys[5], (2, 4, 4, 8))
        y, _ = bj.coupling_forward(params, x, jnp.zeros((2,)))
        np.testing.assert_allclose(y[..., :4], x[..., :4], atol=1e-6)
        np.testing.assert_allclose(
            y[..., 4:], x[..., 4:] * jax.nn.sigmoid(2.0), atol=1e-5
        )

    def test_logdet_exact(self, keys):
        params = bj.init_coupling(keys[6], 4, width=16)
        params["net"]["zconv"]["w"] = rand(keys[7], params["net"]["zconv"]["w"].shape) * 0.2
        x = rand(keys[8], (1, 4, 4, 4))
        _, ldj = bj.coupling_forward(params, x, jnp.zeros((1,)))
        ref = exact_logdet(
            lambda v: bj.coupling_forward(params, v[None], jnp.zeros((1,)))[0][0], x[0]
        )
        # coupling logdet uses log(scale + 1e-6), a deliberate reference
        # epsilon (transforms.py:184) — tolerance covers it
        np.testing.assert_allclose(ldj[0], ref, rtol=1e-3, atol=1e-2)


class TestSqueezeSplit:
    def test_squeeze_roundtrip(self, keys):
        x = rand(keys[0], (2, 8, 8, 3))
        y = bj.squeeze_forward(x)
        assert y.shape == (2, 4, 4, 12)
        np.testing.assert_allclose(bj.squeeze_inverse(y), x)

    def test_squeeze_matches_reference_order(self, keys):
        """Channel order must equal torch rearrange
        'b c (h h1) (w w1) -> b (c h1 w1) h w' (transforms.py:226)."""
        import einops

        x = rand(keys[1], (2, 4, 4, 3))
        x_nchw = jnp.transpose(x, (0, 3, 1, 2))
        ref = einops.rearrange(x_nchw, "b c (h h1) (w w1) -> b (c h1 w1) h w", h1=2, w1=2)
        got = jnp.transpose(bj.squeeze_forward(x), (0, 3, 1, 2))
        np.testing.assert_allclose(got, ref)

    def test_split_roundtrip_with_given_latent(self, keys):
        params = bj.init_split(8)
        x = rand(keys[2], (2, 4, 4, 8))
        y, ldj, z, logp = bj.split_forward(
            params, x, jnp.zeros((2,)), jnp.zeros((2,))
        )
        x2 = bj.split_inverse(params, y, z)
        np.testing.assert_allclose(x2, x)

    def test_split_logp_standard_normal_at_init(self, keys):
        """Zero-init split conv => prior is N(0, I)."""
        params = bj.init_split(8)
        x = rand(keys[3], (2, 4, 4, 8))
        _, _, z, logp = bj.split_forward(params, x, jnp.zeros((2,)), jnp.zeros((2,)))
        expected = bj.gaussian_logp(z, jnp.zeros(()), jnp.zeros(()))
        np.testing.assert_allclose(logp, expected, rtol=1e-5)


class TestStepFlow:
    def test_roundtrip(self, keys):
        params = bj.init_step(keys[0], 12, width=64)
        x = rand(keys[1], (4, 4, 4, 12))
        y, ldj = bj.step_forward(params, x, jnp.zeros((4,)))
        x2 = bj.step_inverse(params, y)
        np.testing.assert_allclose(x2, x, atol=EPS)

    def test_ddinit_then_roundtrip(self, keys):
        params = bj.init_step(keys[2], 8, width=32)
        x = rand(keys[3], (16, 4, 4, 8)) * 2.0 + 1.0
        new_params, y = bj.step_ddinit(params, x)
        y2, _ = bj.step_forward(new_params, x, jnp.zeros((16,)))
        np.testing.assert_allclose(y, y2, atol=1e-5)
        x2 = bj.step_inverse(new_params, y2)
        np.testing.assert_allclose(x2, x, atol=EPS)


class TestQuantize:
    def test_preprocess_postprocess_roundtrip(self):
        from nfdpm_tpu.ops import quantize as q

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.float32) / 255.0
        x = q.preprocess(jnp.asarray(img), n_bits=5)
        back = q.postprocess(x, n_bits=5)
        # 5-bit quantization: recovered pixels equal the quantized originals
        expected = (np.floor(img * 255 / 8) * 8).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(back), expected)

    def test_preprocess_range(self):
        from nfdpm_tpu.ops import quantize as q

        img = jnp.linspace(0, 1, 256).reshape(1, 16, 16, 1)
        x = q.preprocess(img, n_bits=5)
        assert float(jnp.min(x)) >= -0.5
        assert float(jnp.max(x)) < 0.5
