"""Data pipeline tests: native vs numpy batch assembly parity, loader
contracts, stratified split, host sharding, prefetch."""

import numpy as np
import pytest

from nfdpm_tpu.data import native
from nfdpm_tpu.data.datasets import synthetic
from nfdpm_tpu.data.pipeline import (
    Loader,
    host_shard,
    pad_to,
    prefetch_to_device,
    read_dataset,
    stratified_split,
)


class TestNative:
    def test_native_lib_builds_and_loads(self):
        assert native.available(), "C++ batch-ops library failed to build/load"

    def test_gather_normalize_matches_numpy(self):
        rng = np.random.default_rng(0)
        images = rng.integers(0, 256, (32, 8, 8, 3)).astype(np.uint8)
        idx = rng.integers(0, 32, 16).astype(np.int64)
        flips = (rng.random(16) < 0.5).astype(np.uint8)
        out = native.batch_gather_normalize(images, idx, flips)
        ref = images[idx].astype(np.float32) / 255.0
        mask = flips.astype(bool)
        ref[mask] = ref[mask, :, ::-1, :]
        np.testing.assert_allclose(out, ref, atol=1e-7)

    def test_no_flips(self):
        rng = np.random.default_rng(1)
        images = rng.integers(0, 256, (10, 4, 4, 1)).astype(np.uint8)
        idx = np.arange(10, dtype=np.int64)
        out = native.batch_gather_normalize(images, idx, None)
        np.testing.assert_allclose(out, images.astype(np.float32) / 255.0)


class TestLoader:
    def test_drop_last_static_shapes(self):
        ds = synthetic(50, 8, 3)
        loader = Loader(ds, batch_size=16, shuffle=True, drop_last=True)
        batches = list(loader)
        assert len(batches) == 3
        assert all(b[0].shape == (16, 8, 8, 3) for b in batches)

    def test_padded_batches_mask(self):
        ds = synthetic(20, 8, 3)
        loader = Loader(ds, batch_size=16)
        out = list(loader.padded_batches())
        assert out[0][2] == 16 and out[1][2] == 4
        assert out[1][0].shape == (16, 8, 8, 3)

    def test_shuffle_deterministic_per_epoch(self):
        ds = synthetic(32, 8, 3)
        l1 = Loader(ds, batch_size=8, shuffle=True, seed=3)
        l2 = Loader(ds, batch_size=8, shuffle=True, seed=3)
        a = next(iter(l1))[0]
        b = next(iter(l2))[0]
        np.testing.assert_array_equal(a, b)
        # next epoch differs
        c = next(iter(l1))[0]
        assert not np.array_equal(a, c)

    def test_stratified_split(self):
        labels = np.repeat(np.arange(5), 20)
        tr, va = stratified_split(labels, 0.2, seed=0)
        assert len(va) == 20 and len(tr) == 80
        for c in range(5):
            assert (labels[va] == c).sum() == 4

    def test_four_loader_contract(self):
        loaders = read_dataset("synthetic", "", validate=True, batch_size=8,
                               img_size=8, synthetic_fallback=True, synthetic_n=64)
        assert loaders.val is not None
        assert loaders.train.drop_last and loaders.train.shuffle
        assert not loaders.test.shuffle
        assert loaders.eval.shuffle  # train data, test transforms, shuffled

    def test_pad_to(self):
        x = np.ones((2, 28, 28, 1), np.uint8)
        out = pad_to(x, 32)
        assert out.shape == (2, 32, 32, 1)
        assert out[:, :2].sum() == 0 and out[:, 2:30, 2:30].all()

    def test_host_shard(self):
        batch = np.arange(16).reshape(16, 1)
        s0 = host_shard(batch, 0, 4)
        s3 = host_shard(batch, 3, 4)
        np.testing.assert_array_equal(s0.ravel(), [0, 1, 2, 3])
        np.testing.assert_array_equal(s3.ravel(), [12, 13, 14, 15])

    def test_prefetch_to_device(self):
        ds = synthetic(32, 8, 3)
        loader = Loader(ds, batch_size=8, drop_last=True)
        out = list(prefetch_to_device(iter(loader), size=2))
        assert len(out) == 4
        import jax

        assert isinstance(out[0][0], jax.Array)


class TestDatasetReaders:
    """On-disk format parsing: construct tiny files in each dataset's real
    layout and read them back."""

    def test_mnist_idx_roundtrip(self, tmp_path):
        import gzip
        import struct

        from nfdpm_tpu.data.datasets import read_mnist

        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (7, 28, 28)).astype(np.uint8)
        labels = rng.integers(0, 10, 7).astype(np.uint8)
        raw = tmp_path / "MNIST" / "raw"
        raw.mkdir(parents=True)
        with gzip.open(raw / "train-images-idx3-ubyte.gz", "wb") as f:
            f.write(struct.pack(">IIII", 0x803, 7, 28, 28) + imgs.tobytes())
        with gzip.open(raw / "train-labels-idx1-ubyte.gz", "wb") as f:
            f.write(struct.pack(">II", 0x801, 7) + labels.tobytes())
        ds = read_mnist(str(tmp_path), "train")
        assert ds.images.shape == (7, 28, 28, 1)
        np.testing.assert_array_equal(ds.images[..., 0], imgs)
        np.testing.assert_array_equal(ds.labels, labels)
        # digit filtering
        keep = [int(labels[0])]
        ds2 = read_mnist(str(tmp_path), "train", digits=keep)
        assert set(ds2.labels.tolist()) <= set(keep)

    def test_cifar10_pickle_roundtrip(self, tmp_path):
        import pickle

        from nfdpm_tpu.data.datasets import read_cifar10

        rng = np.random.default_rng(1)
        base = tmp_path / "cifar10" / "cifar-10-batches-py"
        base.mkdir(parents=True)
        all_imgs = []
        for i in range(1, 6):
            data = rng.integers(0, 256, (4, 3 * 32 * 32)).astype(np.uint8)
            all_imgs.append(data)
            with open(base / f"data_batch_{i}", "wb") as f:
                pickle.dump({b"data": data, b"labels": [i % 10] * 4}, f)
        ds = read_cifar10(str(tmp_path), "train")
        assert ds.images.shape == (20, 32, 32, 3)
        expected0 = all_imgs[0][0].reshape(3, 32, 32).transpose(1, 2, 0)
        np.testing.assert_array_equal(ds.images[0], expected0)

    def test_imagenet32_roundtrip(self, tmp_path):
        import pickle

        from nfdpm_tpu.data.datasets import read_imagenet

        rng = np.random.default_rng(2)
        base = tmp_path / "imagenet32" / "val"
        base.mkdir(parents=True)
        flat = rng.integers(0, 256, (5, 3 * 32 * 32)).astype(np.uint8)
        with open(base / "val_data", "wb") as f:
            pickle.dump({"data": flat, "labels": [1, 2, 3, 4, 5]}, f)
        ds = read_imagenet(str(tmp_path), "val", 32)
        assert ds.images.shape == (5, 32, 32, 3)
        # channel-planar unpacking: R plane first
        np.testing.assert_array_equal(
            ds.images[0, :, :, 0], flat[0][:1024].reshape(32, 32)
        )

        # first read wrote the NHWC memmap cache; the second load maps it
        # (instant startup for the 3.7 GB train split) with equal bytes,
        # and the batch gather reads straight from the mapping
        import os as _os

        assert _os.path.exists(tmp_path / "imagenet32" / "val_nhwc_u8.npy")
        ds2 = read_imagenet(str(tmp_path), "val", 32)
        assert isinstance(ds2.images, np.memmap)
        np.testing.assert_array_equal(np.asarray(ds2.images), ds.images)
        np.testing.assert_array_equal(ds2.labels, ds.labels)
        from nfdpm_tpu.data.native import batch_gather_normalize

        got = batch_gather_normalize(ds2.images, np.array([2, 0], np.int64))
        np.testing.assert_allclose(
            got, ds.images[[2, 0]].astype(np.float32) / 255.0)

        # opt-out stays in memory and ignores the cache
        ds3 = read_imagenet(str(tmp_path), "val", 32, memmap=False)
        assert not isinstance(ds3.images, np.memmap)

    def test_celeba_roundtrip(self, tmp_path):
        from PIL import Image

        from nfdpm_tpu.data.datasets import read_celeba

        img_dir = tmp_path / "celeba" / "img_align_celeba" / "img_align_celeba"
        img_dir.mkdir(parents=True)
        rng = np.random.default_rng(3)
        rows = ["image_id,partition"]
        for i, part in enumerate([0, 0, 2]):
            name = f"{i:06d}.jpg"
            Image.fromarray(
                rng.integers(0, 256, (218, 178, 3)).astype(np.uint8)
            ).save(img_dir / name)
            rows.append(f"{name},{part}")
        (tmp_path / "celeba" / "list_eval_partition.csv").write_text(
            "\n".join(rows)
        )
        train = read_celeba(str(tmp_path), [0], img_size=32)
        test = read_celeba(str(tmp_path), [2], img_size=32)
        assert train.images.shape == (2, 32, 32, 3)
        assert test.images.shape == (1, 32, 32, 3)

        # memmap cache: keyed by split+size (train/test caches coexist),
        # second read maps with identical bytes
        assert (tmp_path / "celeba" / "decoded_s0_r32_l0_u8.npy").exists()
        assert (tmp_path / "celeba" / "decoded_s2_r32_l0_u8.npy").exists()
        train2 = read_celeba(str(tmp_path), [0], img_size=32)
        assert isinstance(train2.images, np.memmap)
        np.testing.assert_array_equal(np.asarray(train2.images), train.images)
        # a different img_size misses the cache and re-decodes
        big = read_celeba(str(tmp_path), [0], img_size=64)
        assert big.images.shape == (2, 64, 64, 3)


class TestMnistTransformQuirk:
    """The reference trains MNIST on Pad(2)-padded digits but evaluates on
    bilinearly RESIZED ones (test transform is Resize even for MNIST,
    utils.py:164; the eval loader reuses it on train data, dataset.py:85-88).
    Replicated: train loader padded, test/eval loaders resized."""

    def _loaders(self, tmp_path):
        import gzip
        import struct

        from nfdpm_tpu.data.pipeline import read_dataset

        rng = np.random.default_rng(0)
        raw = tmp_path / "MNIST" / "raw"
        raw.mkdir(parents=True)
        for prefix, n in (("train", 8), ("t10k", 4)):
            imgs = rng.integers(0, 256, (n, 28, 28)).astype(np.uint8)
            labels = rng.integers(0, 10, n).astype(np.uint8)
            with gzip.open(raw / f"{prefix}-images-idx3-ubyte.gz", "wb") as f:
                f.write(struct.pack(">IIII", 0x803, n, 28, 28) + imgs.tobytes())
            with gzip.open(raw / f"{prefix}-labels-idx1-ubyte.gz", "wb") as f:
                f.write(struct.pack(">II", 0x801, n) + labels.tobytes())
        return read_dataset("MNIST", str(tmp_path), batch_size=4, img_size=32)

    def test_train_padded_eval_resized(self, tmp_path):
        loaders = self._loaders(tmp_path)
        # train: zero border from Pad(2)
        tr = loaders.train.dataset.images
        assert tr.shape[1:] == (32, 32, 1)
        assert tr[:, :2].max() == 0 and tr[:, -2:].max() == 0
        # eval (train data, test transform): resized — border not all zero
        ev = loaders.eval.dataset.images
        assert ev.shape[1:] == (32, 32, 1)
        assert ev[:, :2].max() > 0
        te = loaders.test.dataset.images
        assert te.shape[1:] == (32, 32, 1)
        assert te[:, :2].max() > 0


class TestOfflineDatasetMakers:
    """The tools/make_synthetic_* constructors write the REAL on-disk
    formats (idx / cifar pickle / imagenet pickle / celeba JPEG+csv), so
    every dataset family is exercisable through the CLI in a zero-egress
    environment. Contract: maker output loads through read_dataset with
    the right shapes/splits."""

    def _tool(self, name):
        import importlib.util
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "tools", name)
        spec = importlib.util.spec_from_file_location(name[:-3], path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def _run(self, name, argv):
        import sys
        from unittest import mock

        with mock.patch.object(sys, "argv", [name] + argv):
            self._tool(name).main()

    def test_imagenet32_maker(self, tmp_path):
        self._run("make_synthetic_imagenet32.py",
                  ["--root", str(tmp_path), "--per-batch", "8", "--n-val", "8"])
        loaders = read_dataset("imagenet32", str(tmp_path), batch_size=4,
                               img_size=32)
        assert len(loaders.train.dataset) == 80  # 10 pickle files vstacked
        assert len(loaders.test.dataset) == 8    # val split doubles as test
        imgs, labels = next(iter(loaders.train.iter_epoch(0)))
        assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.float32
        assert 0.0 <= imgs.min() and imgs.max() <= 1.0
        # maker labels are 1-indexed like the real download
        assert loaders.train.dataset.labels.min() >= 1

    def test_imagenet64_maker(self, tmp_path):
        self._run("make_synthetic_imagenet32.py",
                  ["--root", str(tmp_path), "--res", "64", "--per-batch", "8",
                   "--n-val", "4"])
        loaders = read_dataset("imagenet64", str(tmp_path), batch_size=4,
                               img_size=64)
        # res-64 train is the SINGLE train_data file (utils.py:105-111)
        assert len(loaders.train.dataset) == 8
        assert len(loaders.test.dataset) == 4
        imgs, _ = next(iter(loaders.train.iter_epoch(0)))
        assert imgs.shape == (4, 64, 64, 3)

    def test_celeba_maker(self, tmp_path):
        self._run("make_synthetic_celeba.py",
                  ["--root", str(tmp_path), "--n-train", "6", "--n-val", "2",
                   "--n-test", "3"])
        loaders = read_dataset("celeba", str(tmp_path), batch_size=2,
                               img_size=32)
        # partition semantics: train=0 only; test=2 only (val rows ignored)
        assert len(loaders.train.dataset) == 6
        assert len(loaders.test.dataset) == 3
        imgs, _ = next(iter(loaders.train.iter_epoch(0)))
        assert imgs.shape == (2, 32, 32, 3)
        # faces are structured, not constant: spatial variance present
        assert np.asarray(loaders.train.dataset.images).std() > 10

    def test_mnist_maker(self, tmp_path):
        self._run("make_synthetic_mnist.py",
                  ["--root", str(tmp_path), "--n-train", "8", "--n-test", "4"])
        loaders = read_dataset("MNIST", str(tmp_path), batch_size=4,
                               img_size=32)
        assert len(loaders.train.dataset) == 8
        assert len(loaders.test.dataset) == 4
        assert loaders.train.dataset.images.shape[1:] == (32, 32, 1)

    def test_cifar10_maker(self, tmp_path):
        self._run("make_synthetic_cifar10.py",
                  ["--root", str(tmp_path), "--per-batch", "8", "--n-test", "4"])
        loaders = read_dataset("cifar10", str(tmp_path), batch_size=4,
                               img_size=32)
        assert len(loaders.train.dataset) == 40
        assert len(loaders.test.dataset) == 4
