"""Formater inverse-property tests (reference tests/formaters.py, fixed and
extended per SURVEY.md §4) and diffusion-prior end-to-end smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpm_tpu.models import glow as glow_m
from nfdpm_tpu.models.diffusion_prior import DiffusionPrior
from nfdpm_tpu.models.formaters import CatFormater, IdentityFormater, get_formater
from nfdpm_tpu.models.nf_backbone import NFBackbone


def make_latents(key, shapes, batch=2):
    keys = jax.random.split(key, len(shapes))
    return [jax.random.normal(k, (batch, h, w, c)) for k, (h, w, c) in zip(keys, shapes)]


class TestFormaters:
    @pytest.mark.parametrize("L", [2, 3, 4, 5, 6, 7])
    def test_cat_formater_exact_inverse(self, L):
        """CatFormater.postprocess(process_latents(x)) == x for L in 2..7,
        C=3, size=256 (the reference's own stale test intent,
        tests/formaters.py:36-49)."""
        f = CatFormater(L=L, in_channels=3, size=256)
        latents = make_latents(jax.random.PRNGKey(L), f.latent_shapes)
        processed = f.process_latents(latents)
        assert len(processed) == 1
        restored = f.postprocess(processed)
        assert len(restored) == len(latents)
        for a, b in zip(latents, restored):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_cat_formater_shapes(self):
        f = CatFormater(L=3, in_channels=3, size=32)
        # parts (16,16,6),(8,8,12),(4,4,48) -> target 8x8: 24+12+12 = 48ch
        assert f.input_shapes == [(8, 8, 48)]
        assert f.num_parts == 1

    def test_identity_formater_passthrough(self):
        f = IdentityFormater(L=3, in_channels=3, size=32)
        latents = make_latents(jax.random.PRNGKey(0), f.latent_shapes)
        out = f.process_latents(latents)
        assert len(out) == 3
        back = f.postprocess(out)
        for a, b in zip(latents, back):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_registry(self):
        assert get_formater("IdentityFormater") is IdentityFormater
        assert get_formater("CatFormater") is CatFormater
        with pytest.raises(ValueError):
            get_formater("nope")


GCFG = glow_m.GlowConfig(in_channels=3, levels=2, steps=1, coupling_width=16)
UNET_KW = dict(dim=8, dim_mults=(1, 2), resnet_block_groups=2)
DIFF_KW = dict(timesteps=8, sampling_timesteps=4, loss_type="l2",
               beta_schedule="cosine", ddim_sampling_eta=1.0)


@pytest.fixture(scope="module")
def setup():
    backbone = NFBackbone(cfg=GCFG, img_size=8, frozen=True)
    flow_params = glow_m.init_glow(0, GCFG)
    formater = IdentityFormater(L=GCFG.levels, in_channels=GCFG.in_channels, size=8)
    dp = DiffusionPrior(formater=formater, unet_kwargs=UNET_KW, diffusion_kwargs=DIFF_KW)
    return backbone, flow_params, dp


class TestDiffusionPrior:
    def test_params_registered_per_part(self, setup):
        _, _, dp = setup
        params = dp.init_params(0)
        assert len(params["parts"]) == dp.num_parts == 2
        # every part's UNet weights are present in the checkpointable tree
        n_leaves = len(jax.tree_util.tree_leaves(params))
        assert n_leaves > 50

    def test_losses_and_grads(self, setup):
        backbone, flow_params, dp = setup
        params = dp.init_params(0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3)) - 0.5
        latents, ldj = backbone.transform(flow_params, x)
        losses = dp.losses(params, jax.random.PRNGKey(2), latents)
        assert len(losses) == 2
        assert all(np.isfinite(float(l)) for l in losses)

        def total(p):
            return sum(dp.losses(p, jax.random.PRNGKey(2), latents))

        grads = jax.grad(total)(params)
        gsum = jax.tree_util.tree_reduce(lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
        assert gsum > 0

    def test_sample_latents_roundtrip_through_flow(self, setup):
        backbone, flow_params, dp = setup
        params = dp.init_params(0)
        latents = dp.sample_latents(params, jax.random.PRNGKey(3), 2)
        assert [z.shape[1:] for z in latents] == [
            tuple(s) for s in backbone.latent_shapes
        ]
        img = backbone.invert(flow_params, latents)
        assert img.shape == (2, 8, 8, 3)
        assert np.all(np.isfinite(np.asarray(img)))

    def test_frozen_backbone_blocks_flow_grads(self, setup):
        backbone, flow_params, dp = setup
        params = {"flow": flow_params, "diffusion": dp.init_params(0)}
        x = jax.random.uniform(jax.random.PRNGKey(4), (2, 8, 8, 3)) - 0.5

        def loss(p):
            latents, _ = backbone.transform(p["flow"], x)
            return sum(dp.losses(p["diffusion"], jax.random.PRNGKey(5), latents))

        grads = jax.grad(loss)(params)
        flow_gsum = jax.tree_util.tree_reduce(
            lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads["flow"], 0.0
        )
        assert flow_gsum == 0.0

    def test_nll_per_part(self, setup):
        backbone, flow_params, dp = setup
        x = jax.random.uniform(jax.random.PRNGKey(6), (2, 8, 8, 3)) - 0.5
        latents, _ = backbone.transform(flow_params, x)
        params = dp.init_params(0)
        nlls = dp.evaluate_neg_log_likelihood(params, jax.random.PRNGKey(7), latents)
        assert len(nlls) == 2
        for nll in nlls:
            assert nll.shape == (2,)
            assert np.all(np.isfinite(np.asarray(nll)))


class TestDiffusionTrainer:
    def test_train_step_descends_and_flow_static(self, setup):
        from nfdpm_tpu.training import diffusion_trainer as dt

        backbone, flow_params, dp = setup
        tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-3, print_freq=100)
        tx = dt.make_two_group_optimizer(tcfg, frozen=True)
        state = dt.init_train_state(0, backbone, flow_params, dp, tx)
        flow_before = jax.tree.map(np.asarray, state["params"]["flow"])
        step = dt.make_train_step(backbone, dp, tcfg, tx)
        batch = jax.random.uniform(jax.random.PRNGKey(8), (4, 8, 8, 3))
        key = jax.random.PRNGKey(0)
        losses = []
        for _ in range(8):
            state, m = step(state, batch, key)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        # frozen flow params unchanged
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
            flow_before, state["params"]["flow"],
        )

    def test_unfrozen_flow_cotrains_with_bpd_term(self, setup):
        """freeze=false parity (reference diffusion_prior/trainer.py:104-108,
        143-146): the flow params update at lr_nf and the reported loss is
        sum(part losses) + 0.5 * mean flow-BPD, recomputed here exactly."""
        import math

        from nfdpm_tpu.models import prior as prior_m
        from nfdpm_tpu.ops import quantize as q
        from nfdpm_tpu.training import diffusion_trainer as dt

        _, flow_params, dp = setup
        backbone = NFBackbone(cfg=GCFG, img_size=8, frozen=False)
        tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-3, lr_nf=1e-4)
        tx = dt.make_two_group_optimizer(tcfg, frozen=False)
        state = dt.init_train_state(0, backbone, flow_params, dp, tx)
        # the train step donates its input state: snapshot params first
        params_before = jax.tree.map(np.asarray, state["params"])
        step = dt.make_train_step(backbone, dp, tcfg, tx)
        batch = jax.random.uniform(jax.random.PRNGKey(8), (4, 8, 8, 3))
        key = jax.random.PRNGKey(0)
        state, m = step(state, batch, key)

        # (a) loss composition: replicate the step's key derivation for the
        # dequantization draw; the diffusion part comes from part_losses
        step_key = jax.random.fold_in(key, 0)
        k_dq, _ = jax.random.split(step_key)
        x = q.dequantize(k_dq, q.preprocess(batch, tcfg.n_bits), tcfg.n_bits)
        _, ldj = backbone.transform(params_before["flow"], x)
        n_pixel = prior_m.n_pixels(8, GCFG.in_channels,
                                   tcfg.compat_three_channel_bpd)
        nf_bpd = tcfg.nf_bpd_weight * float(
            jnp.mean(-ldj / (math.log(2.0) * n_pixel)))
        expected = float(np.sum(np.asarray(m["part_losses"]))) + nf_bpd
        np.testing.assert_allclose(float(m["loss"]), expected, rtol=1e-5)

        # (b) the flow is actually co-training: trainable flow leaves moved
        diffs = jax.tree.map(
            lambda a, b: float(jnp.sum(jnp.abs(jnp.asarray(a) - b))),
            params_before["flow"], state["params"]["flow"])
        assert sum(jax.tree_util.tree_leaves(diffs)) > 0.0

    def test_bpd_with_diff_prior_accumulates(self, setup):
        from nfdpm_tpu.data.pipeline import read_dataset
        from nfdpm_tpu.training import diffusion_trainer as dt

        backbone, flow_params, dp = setup
        tcfg = dt.DiffusionTrainConfig(epochs=1)
        tx = dt.make_two_group_optimizer(tcfg, frozen=True)
        state = dt.init_train_state(0, backbone, flow_params, dp, tx)
        loaders = read_dataset("synthetic", root="", batch_size=4, img_size=8,
                               synthetic_fallback=True, synthetic_n=16)
        bpd = dt.calculate_bpd_with_diff_prior(
            backbone, dp, tcfg, state["params"], loaders.test,
            jax.random.PRNGKey(1), max_batches=2,
        )
        assert np.isfinite(bpd)

    def test_bpd_counts_all_dims_with_cat_formater(self, setup):
        """Regression: with CatFormater the VLB bound must charge the prior
        NLL for EVERY latent dim. The old code zipped the per-diffusion-part
        per-dim NLLs against the RAW flow latents' shapes, so the single cat
        part was weighted by only latents[0]'s dims — halving the prior term
        at L=2 (caught live: a CIFAR-format stage-2 run reported VLB bpd 1.09
        vs Gaussian 3.71). Replicates the trainer's exact key schedule
        host-side and pins the reported bpd to the total-nats formula."""
        import math

        from nfdpm_tpu.data.pipeline import read_dataset
        from nfdpm_tpu.models import prior as prior_m
        from nfdpm_tpu.ops import quantize as q
        from nfdpm_tpu.training import diffusion_trainer as dt

        backbone, flow_params, _ = setup
        formater = CatFormater(L=GCFG.levels, in_channels=GCFG.in_channels,
                               size=8)
        dp = DiffusionPrior(formater=formater, unet_kwargs=UNET_KW,
                            diffusion_kwargs=DIFF_KW)
        assert dp.num_parts == 1
        tcfg = dt.DiffusionTrainConfig(epochs=1)
        tx = dt.make_two_group_optimizer(tcfg, frozen=True)
        state = dt.init_train_state(0, backbone, flow_params, dp, tx)
        loaders = read_dataset("synthetic", root="", batch_size=4, img_size=8,
                               synthetic_fallback=True, synthetic_n=4)
        base_key = jax.random.PRNGKey(1)
        bpd = dt.calculate_bpd_with_diff_prior(
            backbone, dp, tcfg, state["params"], loaders.test, base_key,
            max_batches=1,
        )

        # host-side replica of batch_nll's formula on the same single batch
        imgs, _labels, n_valid = next(iter(loaders.test.padded_batches()))
        key = jax.random.fold_in(base_key, np.int32(0))
        k_dq, k_nll = jax.random.split(key)
        x = q.dequantize(k_dq, q.preprocess(jnp.asarray(imgs), tcfg.n_bits),
                         tcfg.n_bits)
        latents, ldj = backbone.transform(state["params"]["flow"], x)
        # dimension conservation: the cat part covers every latent dim
        (processed,) = formater.process_latents(latents)
        total_latent_dims = sum(int(np.prod(z.shape[1:])) for z in latents)
        assert int(np.prod(processed.shape[1:])) == total_latent_dims
        nats = dp.neg_log_likelihood_nats(state["params"]["diffusion"],
                                          k_nll, latents)
        # ... and equals the part's own calc-loop value (a per-DIM quantity,
        # gaussian_diffusion.py:869-904 sums MEAN-over-dims terms) scaled to
        # per-image nats by the processed dim count
        l_per_dim = dp.parts[0].neg_log_likelihood(
            state["params"]["diffusion"]["parts"][0],
            jax.random.fold_in(k_nll, 0), processed)
        np.testing.assert_allclose(np.asarray(nats),
                                   np.asarray(l_per_dim) * total_latent_dims,
                                   rtol=1e-6)
        # reference-parity per-dim API: calc-loop value / processed dims
        (per_dim,) = dp.evaluate_neg_log_likelihood(
            state["params"]["diffusion"], k_nll, latents)
        np.testing.assert_allclose(np.asarray(per_dim) * total_latent_dims,
                                   np.asarray(l_per_dim), rtol=1e-6)
        n_bins = q.n_bins_of(tcfg.n_bits)
        n_pixel = prior_m.n_pixels(8, GCFG.in_channels,
                                   tcfg.compat_three_channel_bpd)
        ll = np.asarray(ldj) - np.asarray(nats)
        expected = float(np.mean(
            ((math.log(n_bins) * n_pixel - ll)
             * (np.log2(np.e) / n_pixel))[:n_valid]))
        np.testing.assert_allclose(bpd, expected, rtol=1e-5)


class TestEMA:
    """`ema_decay`: EMA shadow of the trainable params, updated in-step and
    used for all sampling/eval (greenfield — the reference dropped
    lucidrains' EMA when vendoring)."""

    def _run_steps(self, setup, n_steps=3, decay=0.5):
        from nfdpm_tpu.training import diffusion_trainer as dt

        backbone, flow_params, dp = setup
        tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2,
                                       ema_decay=decay,
                                       ema_update_every=1)
        tx = dt.make_two_group_optimizer(tcfg, frozen=True)
        state = dt.init_train_state(0, backbone, flow_params, dp, tx, ema=True)
        step = dt.make_train_step(backbone, dp, tcfg, tx)
        batch = jax.random.uniform(jax.random.PRNGKey(8), (4, 8, 8, 3))
        key = jax.random.PRNGKey(0)
        param_traj = [jax.tree.map(np.asarray, state["params"]["diffusion"])]
        for _ in range(n_steps):
            state, _ = step(state, batch, key)
            param_traj.append(jax.tree.map(np.asarray,
                                           state["params"]["diffusion"]))
        return dt, tcfg, state, param_traj

    def test_ema_matches_manual_recurrence(self, setup):
        """state['ema'] after n steps == the hand-computed warmup-decay lerp
        of the diffusion-param trajectory."""
        decay = 0.5
        dt, tcfg, state, traj = self._run_steps(setup, n_steps=3, decay=decay)
        ema = jax.tree.map(np.asarray, traj[0])
        for n, params_after in enumerate(traj[1:]):
            d = min(decay, (1.0 + n) / (10.0 + n))
            ema = jax.tree.map(lambda e, p, d=d: e + (1.0 - d) * (p - e),
                               ema, params_after)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, np.asarray(b),
                                                    rtol=1e-5, atol=1e-6),
            ema, state["ema"]["diffusion"])
        # and the shadow genuinely lags the live params
        gap = jax.tree_util.tree_reduce(
            lambda acc, pair: acc + pair, jax.tree.map(
                lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).sum()),
                state["ema"]["diffusion"], state["params"]["diffusion"]), 0.0)
        assert gap > 0.0

    def test_ema_eval_params_merges_frozen(self, setup):
        dt, tcfg, state, _ = self._run_steps(setup)
        ev = dt.ema_eval_params(state)
        # frozen flow: live flow params pass through untouched
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), ev["flow"], state["params"]["flow"])
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), ev["diffusion"],
            state["ema"]["diffusion"])
        # no-EMA state: identity
        bare = {"params": state["params"], "step": state["step"]}
        assert dt.ema_eval_params(bare) is bare["params"]

    def test_ema_unfrozen_shadows_flow_too(self, setup):
        from nfdpm_tpu.training import diffusion_trainer as dt

        _, flow_params, dp = setup
        backbone = NFBackbone(cfg=GCFG, img_size=8, frozen=False)
        tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2, lr_nf=1e-3,
                                       ema_decay=0.9, ema_update_every=1)
        tx = dt.make_two_group_optimizer(tcfg, frozen=False)
        state = dt.init_train_state(0, backbone, flow_params, dp, tx, ema=True)
        assert set(state["ema"]) == {"flow", "diffusion"}
        step = dt.make_train_step(backbone, dp, tcfg, tx)
        batch = jax.random.uniform(jax.random.PRNGKey(8), (4, 8, 8, 3))
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        ev = dt.ema_eval_params(state)
        # unfrozen: eval flow comes from the shadow, not the live params
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), ev["flow"], state["ema"]["flow"])

    def test_ema_update_every_periodic_semantics(self, setup):
        """ema_update_every=k: the hot step passes the shadow through
        untouched; make_ema_update applied every k-th step reproduces the
        per-update warmup recurrence (n = step // k)."""
        from nfdpm_tpu.training import diffusion_trainer as dt

        backbone, flow_params, dp = setup
        decay, k = 0.5, 2
        tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2,
                                       ema_decay=decay, ema_update_every=k)
        tx = dt.make_two_group_optimizer(tcfg, frozen=True)
        state = dt.init_train_state(0, backbone, flow_params, dp, tx, ema=True)
        step = dt.make_train_step(backbone, dp, tcfg, tx)
        ema_fn = dt.make_ema_update(backbone, tcfg)
        batch = jax.random.uniform(jax.random.PRNGKey(8), (4, 8, 8, 3))
        key = jax.random.PRNGKey(0)

        ema_ref = jax.tree.map(np.asarray, state["ema"]["diffusion"])
        for i in range(1, 5):  # trainer cadence: update after steps 2 and 4
            prev_ema = jax.tree.map(np.asarray, state["ema"]["diffusion"])
            state, _ = step(state, batch, key)
            if i % k != 0:
                # shadow untouched by the hot step
                jax.tree.map(lambda a, b: np.testing.assert_array_equal(
                    a, np.asarray(b)), prev_ema, state["ema"]["diffusion"])
                continue
            state = ema_fn(state)
            n = i // k  # per-update warmup with step already incremented
            d = min(decay, (1.0 + n) / (10.0 + n))
            ema_ref = jax.tree.map(
                lambda e, p, d=d: e + (1.0 - d) * (np.asarray(p) - e),
                ema_ref, state["params"]["diffusion"])
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    a, np.asarray(b), rtol=1e-5, atol=1e-6),
                ema_ref, state["ema"]["diffusion"])

    def test_ema_checkpoint_roundtrip_and_resume_reconcile(self, setup, tmp_path):
        from nfdpm_tpu.training import diffusion_trainer as dt
        from nfdpm_tpu.training.checkpoint import (
            checkpoint_keys, restore_params, restore_state, save_state)

        backbone, flow_params, dp = setup
        _, tcfg, state, _ = self._run_steps(setup)
        run_dir = str(tmp_path / "run")
        save_state(run_dir, "diffusion", 1, state)
        assert "ema" in checkpoint_keys(run_dir, "diffusion", 1)

        def assert_same_leaves(a, b):
            # Orbax restores sequences as lists where the live tree holds
            # tuples — compare leaf-wise (consumers index either the same)
            la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
            assert len(la) == len(lb)
            for x, y in zip(la, lb):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

        # inference consumers get the EMA weights by default
        p_ema = restore_params(run_dir, "diffusion", 1, prefer_ema=True)
        assert_same_leaves(p_ema["diffusion"], state["ema"]["diffusion"])
        p_live = restore_params(run_dir, "diffusion", 1)
        assert_same_leaves(p_live["diffusion"], state["params"]["diffusion"])

        # full-state restore round-trips the shadow
        tx = dt.make_two_group_optimizer(tcfg, frozen=True)
        template = dt.init_train_state(0, backbone, flow_params, dp, tx,
                                       ema=True)
        restored = restore_state(run_dir, "diffusion", 1, template)
        assert_same_leaves(restored["ema"], state["ema"])

        # non-EMA checkpoint + ema config: trainer seeds the shadow from the
        # live params (exercise the reconcile branch through train())
        bare = {k: v for k, v in jax.tree.map(np.asarray, state).items()
                if k != "ema"}
        save_state(run_dir, "diffusion", 2, bare)
        assert "ema" not in checkpoint_keys(run_dir, "diffusion", 2)


class TestCatFormaterEndToEnd:
    def test_cat_formater_diffusion_pipeline(self):
        """CatFormater -> ONE diffusion model over the concatenated latent;
        sampling postprocesses back to L flow-shaped parts and inverts."""
        from nfdpm_tpu.models.formaters import CatFormater

        backbone = NFBackbone(cfg=GCFG, img_size=8, frozen=True)
        flow_params = glow_m.init_glow(0, GCFG)
        formater = CatFormater(L=GCFG.levels, in_channels=GCFG.in_channels, size=8)
        dp = DiffusionPrior(formater=formater, unet_kwargs=UNET_KW,
                            diffusion_kwargs=DIFF_KW)
        assert dp.num_parts == 1
        params = dp.init_params(0)

        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3)) - 0.5
        latents, _ = backbone.transform(flow_params, x)
        losses = dp.losses(params, jax.random.PRNGKey(2), latents)
        assert len(losses) == 1 and np.isfinite(float(losses[0]))

        sampled = dp.sample_latents(params, jax.random.PRNGKey(3), 2)
        assert [z.shape[1:] for z in sampled] == [tuple(s) for s in backbone.latent_shapes]
        img = backbone.invert(flow_params, sampled)
        assert img.shape == (2, 8, 8, 3)
        assert np.all(np.isfinite(np.asarray(img)))
