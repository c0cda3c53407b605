"""Pallas kernel correctness vs the XLA reference path (interpreter mode on
CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nfdpm_tpu.ops import bijectors as bj
from nfdpm_tpu.ops.pallas.channel_mix import channel_mix


def test_channel_mix_matches_einsum():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 8, 8, 12))
    w = jax.random.normal(jax.random.fold_in(key, 1), (12, 12))
    b = jax.random.normal(jax.random.fold_in(key, 2), (12,))
    ref = jnp.einsum("bhwc,oc->bhwo", x, w) + b
    out = channel_mix(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_channel_mix_matches_fused_step():
    """The kernel reproduces fused_actnorm_invconv_forward exactly."""
    an = {"scale": jnp.asarray(np.random.default_rng(0).normal(size=8) * 0.1,
                               jnp.float32),
          "bias": jnp.asarray(np.random.default_rng(1).normal(size=8), jnp.float32)}
    ic = bj.init_invconv(3, 8)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 8))
    ldj = jnp.zeros((2,))
    ref, _ = bj.fused_actnorm_invconv_forward(an, ic, x, ldj)

    wmat = bj.invconv_weight(ic)
    es = jnp.exp(an["scale"])
    w_fold = wmat * es[None, :]
    b_fold = wmat @ (es * an["bias"])
    out = channel_mix(x, w_fold, b_fold, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_channel_mix_nonsquare():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 48))
    w = jax.random.normal(jax.random.PRNGKey(6), (48, 48)) * 0.2
    b = jnp.zeros((48,))
    ref = jnp.einsum("bhwc,oc->bhwo", x, w)
    out = channel_mix(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestCouplingTail:
    def _ref(self, ls, b, xb):
        s = jax.nn.sigmoid(ls + 2.0)
        y = (xb + b) * s
        ldj = jnp.sum(jnp.log(s + 1e-6).reshape(xb.shape[0], -1), axis=1)
        return y, ldj

    def test_matches_reference_formula(self):
        k = jax.random.PRNGKey(0)
        ls = jax.random.normal(jax.random.fold_in(k, 0), (3, 4, 4, 6)) * 0.5
        b = jax.random.normal(jax.random.fold_in(k, 1), (3, 4, 4, 6))
        xb = jax.random.normal(jax.random.fold_in(k, 2), (3, 4, 4, 6))
        from nfdpm_tpu.ops.pallas.coupling_tail import coupling_tail

        y, ldj = coupling_tail(ls, b, xb, True)
        y_r, ldj_r = self._ref(ls, b, xb)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_r), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ldj), np.asarray(ldj_r), rtol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        k = jax.random.PRNGKey(1)
        ls = jax.random.normal(jax.random.fold_in(k, 0), (2, 2, 2, 4)) * 0.3
        b = jax.random.normal(jax.random.fold_in(k, 1), (2, 2, 2, 4))
        xb = jax.random.normal(jax.random.fold_in(k, 2), (2, 2, 2, 4))
        from nfdpm_tpu.ops.pallas.coupling_tail import coupling_tail

        def loss_kernel(ls, b, xb):
            y, ldj = coupling_tail(ls, b, xb, True)
            return jnp.sum(y ** 2) + jnp.sum(ldj * 1.3)

        def loss_ref(ls, b, xb):
            y, ldj = self._ref(ls, b, xb)
            return jnp.sum(y ** 2) + jnp.sum(ldj * 1.3)

        g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(ls, b, xb)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(ls, b, xb)
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-6)


class TestUsePallasPath:
    """GlowConfig.use_pallas routes the product step through the kernels
    (interpreter mode here on CPU; natively compiled + benched on TPU,
    tools/bench_pallas_step.py). Forward, gradients, and a short training
    trajectory must match the XLA path."""

    def _setup(self, use_pallas):
        from nfdpm_tpu.models import glow as glow_m

        cfg = glow_m.GlowConfig(in_channels=3, levels=2, steps=2,
                                coupling_width=32, use_pallas=use_pallas)
        params = glow_m.init_glow(0, cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3)) - 0.5
        return glow_m, cfg, params, x

    def test_forward_matches_xla(self):
        glow_m, cfg_p, params, x = self._setup(True)
        cfg_x = glow_m.GlowConfig(in_channels=3, levels=2, steps=2,
                                  coupling_width=32, use_pallas=False)
        lat_p, ldj_p, logp_p = glow_m.forward(params, cfg_p, x)
        lat_x, ldj_x, logp_x = glow_m.forward(params, cfg_x, x)
        for a, b in zip(lat_p, lat_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ldj_p), np.asarray(ldj_x),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(logp_p), np.asarray(logp_x),
                                   rtol=1e-5, atol=1e-4)

    def test_gradients_match_xla(self):
        glow_m, cfg_p, params, x = self._setup(True)
        cfg_x = glow_m.GlowConfig(in_channels=3, levels=2, steps=2,
                                  coupling_width=32, use_pallas=False)

        def loss(p, cfg):
            lats, ldj, logp = glow_m.forward(p, cfg, x)
            return jnp.mean(ldj + logp)

        g_p = jax.grad(lambda p: loss(p, cfg_p))(params)
        g_x = jax.grad(lambda p: loss(p, cfg_x))(params)
        errs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g_p, g_x)
        assert max(jax.tree_util.tree_leaves(errs)) < 1e-4

    def test_inverse_matches_xla_and_roundtrips(self):
        """The sampling-path kernels (step_inverse_pallas: coupling-tail
        inverse + channel-mix with inverted folded weights) must match the
        XLA inverse AND invert the pallas forward exactly (VERDICT r2
        item 7)."""
        glow_m, cfg_p, params, x = self._setup(True)
        cfg_x = glow_m.GlowConfig(in_channels=3, levels=2, steps=2,
                                  coupling_width=32, use_pallas=False)
        lat_p, _, _ = glow_m.forward(params, cfg_p, x)
        inv_p = glow_m.inverse(params, cfg_p, lat_p)
        inv_x = glow_m.inverse(params, cfg_x, lat_p)
        np.testing.assert_allclose(np.asarray(inv_p), np.asarray(inv_x),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(inv_p), np.asarray(x), atol=2e-3)

    def test_coupling_tail_inverse_formula(self):
        from nfdpm_tpu.ops.pallas.coupling_tail import (
            coupling_tail, coupling_tail_inverse)

        k = jax.random.PRNGKey(3)
        ls, bias, xb = (jax.random.normal(jax.random.fold_in(k, i), (3, 5, 5, 7))
                        for i in range(3))
        yb, _ = coupling_tail(ls, bias, xb, True)
        back = coupling_tail_inverse(ls, bias, yb, True)
        # the reference's +eps in the inverse denominator makes the
        # roundtrip inexact by ~eps/scale (transforms.py:196-200 semantics)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xb),
                                   rtol=1e-4, atol=1e-4)

    def test_train_trajectory_matches_xla(self):
        from nfdpm_tpu.models import glow as glow_m
        from nfdpm_tpu.training import nf_trainer as nft
        from nfdpm_tpu.training.optim import make_optimizer

        def run(use_pallas):
            cfg = glow_m.GlowConfig(in_channels=3, levels=2, steps=2,
                                    coupling_width=32, use_pallas=use_pallas)
            tcfg = nft.NFTrainConfig(lr=1e-3)
            tx = make_optimizer("adam", 1e-3, fixed_prior=True)
            state = nft.init_train_state(0, cfg, tcfg, tx)
            step = nft.make_train_step(cfg, tcfg, tx)
            batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))
            key = jax.random.PRNGKey(0)
            out = []
            for _ in range(4):
                state, m = step(state, batch, key)
                out.append(float(m["bpd"]))
            return np.asarray(out)

        np.testing.assert_allclose(run(True), run(False), rtol=1e-5, atol=2e-4)


class TestStepMegakernel:
    """Fused whole-step kernel (ops/pallas/step_megakernel.py): exact vs the
    XLA step_forward on CPU-fp32 (interpret mode). Experimental — see
    BENCH.md for the on-hardware verdict before wiring it anywhere."""

    def test_matches_step_forward(self):
        from nfdpm_tpu.ops.pallas.step_megakernel import step_megakernel_forward

        rng = np.random.default_rng(0)
        C, H, W, B = 12, 16, 16, 5  # odd batch exercises tile padding
        params = bj.init_step(3, C, width=64)
        params["actnorm"] = {
            "scale": rng.normal(size=C).astype(np.float32) * 0.1,
            "bias": rng.normal(size=C).astype(np.float32) * 0.1,
        }
        params["coupling"]["net"]["zconv"]["w"] = (
            rng.normal(size=params["coupling"]["net"]["zconv"]["w"].shape)
            .astype(np.float32) * 0.05
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
        y_ref, ldj_ref = bj.step_forward(params, x, jnp.zeros((B,)))

        wf, bf, ld = bj.fold_actnorm_invconv(params["actnorm"], params["invconv"])
        y_k, tail = step_megakernel_forward(x, wf, bf, params["coupling"]["net"],
                                            tile_b=4, interpret=True)
        ldj_k = (H * W) * ld + tail
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ldj_k), np.asarray(ldj_ref),
                                   rtol=1e-5, atol=1e-3)


class TestFusedLinearAttention:
    """Fused linear-attention block kernel
    (ops/pallas/fused_linear_attention.py): exact vs the module's XLA
    masked-block path on identical params, forward and grads. On-hardware
    verdict: LOSES to XLA at both 64/256 batch (BENCH.md round 3) — kept
    as a tested A/B capability on `Unet.fused_attention`, default off."""

    def _pair(self, shape):
        from nfdpm_tpu.models.unet import LinearAttention

        x = jax.random.normal(jax.random.PRNGKey(0), shape)
        la = LinearAttention(heads=4, dim_head=32)
        laf = LinearAttention(heads=4, dim_head=32, fused=True)
        params = la.init(jax.random.PRNGKey(1), x)["params"]
        # identical param trees: the fused path declares Conv_0/Conv_1/
        # ChannelLayerNorm_0 with nn.Conv-compatible shapes
        pf = laf.init(jax.random.PRNGKey(1), x)["params"]
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(pf)
        return x, la, laf, params

    def test_forward_matches_module(self):
        for shape in [(4, 8, 8, 16), (3, 16, 16, 64)]:  # odd batch pads tb
            x, la, laf, params = self._pair(shape)
            out1 = la.apply({"params": params}, x)
            out2 = laf.apply({"params": params}, x)
            np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                       rtol=1e-5, atol=1e-5)

    def test_grads_match_module(self):
        x, la, laf, params = self._pair((2, 8, 8, 16))

        def loss(p, mod):
            return jnp.sum(jnp.sin(mod.apply({"params": p}, x)))

        g1 = jax.grad(lambda p: loss(p, la))(params)
        g2 = jax.grad(lambda p: loss(p, laf))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
            g1, g2)

    def test_unet_flag_end_to_end(self):
        from nfdpm_tpu.models.unet import Unet

        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
        t = jnp.zeros((2,), jnp.int32)
        u1 = Unet(dim=16, dim_mults=(1, 2), channels=3, resnet_block_groups=4)
        u2 = Unet(dim=16, dim_mults=(1, 2), channels=3, resnet_block_groups=4,
                  fused_attention=True)
        params = u1.init(jax.random.PRNGKey(3), x, t, None)["params"]
        o1 = u1.apply({"params": params}, x, t, None)
        o2 = u2.apply({"params": params}, x, t, None)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-4, atol=1e-5)
