"""Metrics engine tests: FID/KID math sanity, stats store, Storage caching,
SSIM/PSNR identities, feature extractors, full evaluate_model flow on
synthetic data."""

import numpy as np
import pytest

from nfdpm_tpu.metrics import compute as mc
from nfdpm_tpu.metrics import fid as fid_m
from nfdpm_tpu.metrics.image_quality import psnr, ssim

# fp64-oracle SSIM for the fixed images in test_ssim_golden_value, computed
# once with _np_ssim_fp64 and pinned (reflect = ignite semantics).
GOLDEN_SSIM_REFLECT = 0.9568071088637743
GOLDEN_SSIM_VALID = 0.9534688588241363


class TestScoreMath:
    def test_frechet_distance_zero_for_identical(self):
        rng = np.random.default_rng(0)
        f = rng.normal(size=(500, 16))
        mu, sigma = fid_m.feature_stats(f)
        d = fid_m.frechet_distance(mu, sigma, mu.copy(), sigma.copy())
        assert abs(d) < 1e-6

    def test_frechet_distance_mean_shift(self):
        """For equal covariance, FID == |mu1 - mu2|^2."""
        rng = np.random.default_rng(1)
        f = rng.normal(size=(2000, 8))
        mu, sigma = fid_m.feature_stats(f)
        shift = np.ones(8) * 0.5
        d = fid_m.frechet_distance(mu, sigma, mu + shift, sigma.copy())
        np.testing.assert_allclose(d, np.sum(shift ** 2), rtol=1e-4)

    def test_kid_zero_for_same_distribution(self):
        rng = np.random.default_rng(2)
        a = rng.normal(size=(600, 32))
        b = rng.normal(size=(600, 32))
        k_same = fid_m.kid_score(a, b, num_subsets=20, max_subset_size=200)
        k_diff = fid_m.kid_score(a, b + 1.0, num_subsets=20, max_subset_size=200)
        assert abs(k_same) < 0.05
        assert k_diff > k_same + 0.1

    def test_stats_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        f = rng.normal(size=(100, 8)).astype(np.float32)
        fid_m.save_stats(f, "synthetic", "clean", "inception_v3", "test", 32,
                         str(tmp_path))
        assert fid_m.stats_exist("synthetic", "clean", "inception_v3", "test", 32,
                                 str(tmp_path))
        s = fid_m.load_stats("synthetic", "clean", "inception_v3", "test", 32,
                             str(tmp_path))
        np.testing.assert_allclose(s["feats"], f)
        fid_m.remove_all_stats(str(tmp_path))
        assert not fid_m.stats_exist("synthetic", "clean", "inception_v3", "test", 32,
                                     str(tmp_path))


class TestResize:
    def test_modes_shape(self):
        imgs = np.random.default_rng(0).integers(0, 256, (3, 16, 16, 3)).astype(np.uint8)
        for mode in ("clean", "legacy_tensorflow"):
            out = fid_m.resize_batch(imgs, 32, mode)
            assert out.shape == (3, 32, 32, 3)

    def test_identity_when_same_size(self):
        imgs = np.random.default_rng(0).integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
        np.testing.assert_allclose(fid_m.resize_batch(imgs, 8, "clean"), imgs)


class TestImageQuality:
    def test_ssim_identity(self):
        import jax.numpy as jnp

        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 32, 32, 3)),
                        jnp.float32)
        assert float(ssim(x, x, 255.0)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_decreases_with_noise(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3)), jnp.float32)
        y = x + jnp.asarray(rng.normal(0, 25, x.shape), jnp.float32)
        assert float(ssim(x, y, 255.0)) < 0.99

    @staticmethod
    def _np_ssim_fp64(pred, target, data_range, pad):
        """Independent double-precision SSIM oracle (direct sliding-window
        loops, no convolution code shared with the implementation).
        Matches ignite semantics: gaussian 11x11 sigma 1.5, K1=0.01,
        K2=0.03; pad='reflect' mirrors both images by 5 px (ignite's
        F.pad mode='reflect'), pad='valid' scores the interior only."""
        size, sigma = 11, 1.5
        coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
        g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
        g /= g.sum()
        win = np.outer(g, g)
        c1 = (0.01 * data_range) ** 2
        c2 = (0.03 * data_range) ** 2
        pred = np.asarray(pred, np.float64)
        target = np.asarray(target, np.float64)
        if pad == "reflect":
            widths = ((0, 0), (5, 5), (5, 5), (0, 0))
            pred = np.pad(pred, widths, mode="reflect")
            target = np.pad(target, widths, mode="reflect")
        b, h, w, c = pred.shape
        vals = []
        for n in range(b):
            for ch in range(c):
                p, t = pred[n, :, :, ch], target[n, :, :, ch]
                for i in range(h - size + 1):
                    for j in range(w - size + 1):
                        pw = p[i:i + size, j:j + size]
                        tw = t[i:i + size, j:j + size]
                        mp = (win * pw).sum()
                        mt = (win * tw).sum()
                        sp = (win * pw * pw).sum() - mp * mp
                        st = (win * tw * tw).sum() - mt * mt
                        spt = (win * pw * tw).sum() - mp * mt
                        vals.append(
                            ((2 * mp * mt + c1) * (2 * spt + c2))
                            / ((mp * mp + mt * mt + c1) * (sp + st + c2))
                        )
        return float(np.mean(vals))

    def test_ssim_golden_value(self):
        """Cross-check the jitted SSIM against the fp64 oracle on fixed
        structured images, in BOTH pad modes (VERDICT r2 item 3). The
        reflect-mode value is what ignite would report for these inputs."""
        import jax.numpy as jnp

        h = w = 20
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        base = 127.5 + 80 * np.sin(xx / 3.0) * np.cos(yy / 4.0)
        shifted = np.clip(base + 20 * np.sin((xx + yy) / 5.0), 0, 255)
        pred = np.stack([base, np.flipud(base)])[..., None]
        targ = np.stack([shifted, np.flipud(shifted)])[..., None]

        for pad in ("reflect", "valid"):
            golden = self._np_ssim_fp64(pred, targ, 255.0, pad)
            got = float(ssim(jnp.asarray(pred, jnp.float32),
                             jnp.asarray(targ, jnp.float32), 255.0, pad))
            np.testing.assert_allclose(got, golden, rtol=2e-5,
                                       err_msg=f"pad={pad}")

        # Pin the oracle itself against pre-computed constants so the test
        # and the implementation cannot drift together.
        np.testing.assert_allclose(
            self._np_ssim_fp64(pred, targ, 255.0, "reflect"),
            GOLDEN_SSIM_REFLECT, rtol=1e-9)
        np.testing.assert_allclose(
            self._np_ssim_fp64(pred, targ, 255.0, "valid"),
            GOLDEN_SSIM_VALID, rtol=1e-9)

    def test_psnr_golden_value(self):
        """PSNR oracle: per-image fp64 MSE -> 10 log10(R^2/mse), averaged."""
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        x = rng.uniform(0, 255, (3, 12, 12, 3))
        y = np.clip(x + rng.normal(0, 12, x.shape), 0, 255)
        mse = ((x - y) ** 2).mean(axis=(1, 2, 3))
        golden = float(np.mean(10 * np.log10(255.0 ** 2 / mse)))
        got = float(psnr(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                         255.0))
        np.testing.assert_allclose(got, golden, rtol=1e-5)

    def test_psnr_known_value(self):
        import jax.numpy as jnp

        x = jnp.zeros((1, 8, 8, 1))
        y = x + 10.0
        # mse = 100 -> psnr = 10 log10(255^2/100)
        np.testing.assert_allclose(
            float(psnr(x, y, 255.0)), 10 * np.log10(255 ** 2 / 100), rtol=1e-5
        )


class TestStorage:
    def test_cached_sampler_single_pass(self):
        calls = []

        def raw(n):
            calls.append(n)
            return np.full((n, 4, 4, 3), len(calls), np.uint8)

        gen = mc.make_cached_sampler(raw)
        a = gen(3)
        b = gen(2)
        assert len(calls) == 2
        gen.storage.set_ready_for_usage()
        a2 = gen(3)
        b2 = gen(2)
        assert len(calls) == 2  # replayed from cache
        np.testing.assert_array_equal(a, a2)
        np.testing.assert_array_equal(b, b2)


class TestFeatureExtractors:
    def test_inception_features_shape(self):
        fn = mc.get_feature_extractor("inception_v3")
        imgs = np.random.default_rng(0).integers(0, 256, (2, 299, 299, 3)).astype(np.uint8)
        import jax.numpy as jnp

        f = np.asarray(fn(jnp.asarray(imgs)))
        assert f.shape == (2, 2048)
        assert np.all(np.isfinite(f))

    def test_clip_features_shape_and_norm(self):
        fn = mc.get_feature_extractor("clip_vit_b_32")
        imgs = np.random.default_rng(1).integers(0, 256, (2, 224, 224, 3)).astype(np.uint8)
        import jax.numpy as jnp

        f = np.asarray(fn(jnp.asarray(imgs)))
        assert f.shape == (2, 512)
        np.testing.assert_allclose(np.linalg.norm(f, axis=1), 1.0, rtol=1e-5)


class TestEndToEnd:
    def test_evaluate_model_full_flow(self, tmp_path):
        """precompute synthetic stats -> evaluate FID+KID+SSIM/PSNR via one
        cached generation pass."""
        import logging

        from nfdpm_tpu.data.pipeline import Loader
        from nfdpm_tpu.data.datasets import synthetic

        logger = logging.getLogger("t")
        stats_dir = str(tmp_path)
        mc.precompute_statistics(
            logger, "", "synthetic", "test", 16, "clean", "inception_v3",
            stats_dir=stats_dir, limit=48,
        )

        ds = synthetic(64, 16, 3, seed=5)

        def sample_images(n):
            idx = np.random.default_rng(0).integers(0, len(ds.images), n)
            return ds.images[idx]

        loader = Loader(synthetic(32, 16, 3, seed=6), batch_size=16)
        metrics = mc.evaluate_model(
            sample_images=sample_images, data_name="synthetic", dataset_res=16,
            batch_size=16, num_gen=32, dataset_split="test",
            fid_kwargs=[{"mode": "clean", "model_name": "inception_v3"}],
            kid_kwargs=[{"mode": "clean", "model_name": "inception_v3"}],
            ssim_psnr_kwargs={"data_range": 255, "loader": loader},
            stats_dir=stats_dir, logger=logger,
        )
        assert "FID_clean_inception" in metrics and np.isfinite(metrics["FID_clean_inception"])
        assert "KID_clean_inception" in metrics and np.isfinite(metrics["KID_clean_inception"])
        assert np.isfinite(metrics["SSIM"]) and np.isfinite(metrics["PSNR"])


class TestTF1Resize:
    def test_tf1_bilinear_known_values(self):
        """2x2 -> 4x4 with TF1 semantics: src = out_idx * 0.5, floor-clamped.
        Row 0 of the output samples src rows 0/0.5/1/1.5."""
        img = np.array([[0.0, 2.0], [4.0, 6.0]], np.float32).reshape(1, 2, 2, 1)
        out = fid_m.tf1_bilinear_resize(img, 4)[0, :, :, 0]
        # x coords: 0, .5, 1, 1.5(clamped pair idx 1,1) -> row0: 0, 1, 2, 2
        np.testing.assert_allclose(out[0], [0, 1, 2, 2], atol=1e-6)
        # y likewise: col0: 0, 2, 4, 4
        np.testing.assert_allclose(out[:, 0], [0, 2, 4, 4], atol=1e-6)

    def test_tf1_differs_from_half_pixel(self):
        import jax

        rng = np.random.default_rng(0)
        img = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        tf1 = fid_m.tf1_bilinear_resize(img, 16)
        hp = np.asarray(jax.image.resize(img, (1, 16, 16, 3), "bilinear"))
        assert np.abs(tf1 - hp).max() > 1e-3  # genuinely different conventions


class TestEvaluateFnRandomness:
    def test_each_generation_call_gets_fresh_salt(self, tmp_path):
        """Within one evaluation the cached sampler must NOT produce
        bit-identical batches: each sample_images call folds a fresh salt
        (counter) into the key, so FID covariance / KID MMD see independent
        samples (round-1 advisor high-severity finding)."""
        import logging

        from nfdpm_tpu.data.pipeline import Loader
        from nfdpm_tpu.data.datasets import synthetic

        logger = logging.getLogger("t")
        stats_dir = str(tmp_path)
        mc.precompute_statistics(
            logger, "", "synthetic", "train", 16, "clean", "inception_v3",
            stats_dir=stats_dir, limit=48,
        )

        seen_salts = []

        def fake_sample_fn(params, key, n, temperature, salt):
            seen_salts.append(int(salt))
            rng = np.random.default_rng(int(salt) & 0x7FFFFFFF)
            return rng.integers(0, 256, (n, 16, 16, 3), dtype=np.uint8)

        loaders = type("L", (), {"eval": Loader(synthetic(16, 16, 3, seed=1),
                                                batch_size=16)})()
        from nfdpm_tpu.parallel import mesh as mesh_m

        evaluate_fn = mc.make_nf_evaluate_fn(
            data_name="synthetic", loaders=loaders,
            fid_configs=[{"mode": "clean", "model_name": "inception_v3"}],
            kid_configs=[], img_size=16, temperature=1.0, logger=logger,
            stats_dir=stats_dir, quick_num_gen=64, dataset_split="train",
            gen_batch_size=32,
            mesh=mesh_m.make_mesh(),  # sharded feature extraction end-to-end
        )
        metrics = evaluate_fn(fake_sample_fn, None, epoch=3)
        assert "FID_clean_inception" in metrics
        # 64 samples at gen batch 32 -> 2 generation calls with DISTINCT salts
        assert len(seen_salts) >= 2
        assert len(set(seen_salts)) == len(seen_salts), seen_salts

    def test_dataset_split_defaults_to_train(self):
        """Reference scores against train-split stats in both trainers."""
        import inspect

        sig = inspect.signature(mc.make_nf_evaluate_fn)
        assert sig.parameters["dataset_split"].default == "train"


class TestFloatFeatureInput:
    def test_extract_features_no_requantize(self):
        """clean-fid feeds the float resize output straight to Inception:
        features from float32 inputs must differ from a uint8-requantized
        pipeline whenever the resize produced non-integer values."""
        import jax.numpy as jnp

        from nfdpm_tpu.metrics.compute import get_feature_extractor

        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
        fn = get_feature_extractor("inception_v3")
        f_float = fid_m.extract_features(imgs, fn, 299, "clean", batch_size=4)
        # manual uint8-requantized path
        resized = fid_m.resize_batch(imgs, 299, "clean")
        f_u8 = np.asarray(fn(jnp.asarray(np.clip(resized, 0, 255).astype(np.uint8))))
        # resize produces fractional values, so the two must differ
        assert np.abs(f_float - f_u8).max() > 0


class TestShardedFeatureExtraction:
    def test_mesh_sharded_features_match_unsharded(self):
        """extract_features(mesh=...) shards the feature-net forward
        P("data") over the 8-device mesh; features must match the
        single-device path bit-for-bit, including the padded+trimmed final
        partial batch (n=11 with batch 8)."""
        import jax

        from nfdpm_tpu.metrics.compute import get_feature_extractor
        from nfdpm_tpu.parallel import mesh as mesh_m

        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 256, (11, 16, 16, 3), dtype=np.uint8)
        fn = get_feature_extractor("inception_v3")
        mesh = mesh_m.make_mesh()
        ref = fid_m.extract_features(imgs, fn, 299, "clean", batch_size=8)
        shd = fid_m.extract_features(imgs, fn, 299, "clean", batch_size=8,
                                     mesh=mesh)
        assert shd.shape == ref.shape == (11, 2048)
        np.testing.assert_allclose(shd, ref, rtol=1e-6, atol=1e-6)

        # a batch that doesn't divide the data axis rounds UP (6 -> 8) and
        # still produces exact features — no fail-late crash on big meshes
        shd6 = fid_m.extract_features(imgs, fn, 299, "clean", batch_size=6,
                                      mesh=mesh)
        np.testing.assert_allclose(shd6, ref, rtol=1e-6, atol=1e-6)
