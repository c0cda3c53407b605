"""Metrics orchestration: evaluate_model, sampler caching, stats precompute.

Capability-parity re-design of /root/reference/metrics/compute.py:

  * `Storage` caches generated images so ONE generation pass serves every
    metric config (reference metrics/utils.py:24-68, reuse at
    compute.py:199-226).
  * `evaluate_model` loops FID configs, then KID configs, then SSIM/PSNR
    (compute.py:270-320), marking the cache ready after the first metric.
  * CelebA images are evaluated at 224 with CLIP features (compute.py:47,
    219-222, 256).
  * `precompute_statistics` computes and stores dataset stats
    skip-if-exists (compute.py:238-251); `make_custom_stats` is the
    work-horse (compute.py:101-144 analogue) using on-device extractors.

Model-name -> extractor resolution lives in `get_feature_extractor`; real
weights are loaded from NFDPM_TPU_WEIGHTS_DIR when present (see
metrics/inception.py, metrics/clip_features.py docstrings).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from ..data.datasets import DATASET_SIZE
from . import fid as fid_m
from .image_quality import psnr as psnr_fn
from .image_quality import ssim as ssim_fn

WEIGHTS_DIR = os.environ.get(
    "NFDPM_TPU_WEIGHTS_DIR", os.path.join(os.path.expanduser("~"), ".nfdpm_tpu", "weights")
)

_EXTRACTOR_CACHE: Dict[str, Callable] = {}

FEATURE_RES = {"inception_v3": 299, "clip_vit_b_32": 224}


def get_feature_extractor(model_name: str) -> Callable:
    """uint8 [B, res, res, 3] -> [B, D] features; cached per model."""
    if model_name in _EXTRACTOR_CACHE:
        return _EXTRACTOR_CACHE[model_name]
    if model_name == "inception_v3":
        from . import inception

        wpath = os.path.join(WEIGHTS_DIR, "pt_inception-2015-12-05-6726825d.pth")
        params = inception.load_torch_weights(wpath) if os.path.exists(wpath) else None
        fn = inception.make_feature_fn(params)
    elif model_name == "clip_vit_b_32":
        from . import clip_features

        wpath = os.path.join(WEIGHTS_DIR, "ViT-B-32.pt")
        params = clip_features.load_torch_weights(wpath) if os.path.exists(wpath) else None
        fn = clip_features.make_feature_fn(params)
    else:
        raise ValueError(f"Unknown feature model: {model_name}")
    _EXTRACTOR_CACHE[model_name] = fn
    return fn


# ---------------------------------------------------------------------------
# Generated-sample cache (reference Storage, metrics/utils.py:24-68)
# ---------------------------------------------------------------------------

class Storage:
    def __init__(self):
        self.data: Optional[np.ndarray] = None
        self.ready = False
        self.index = 0

    def reset(self):
        self.data, self.ready, self.index = None, False, 0

    def set_ready_for_usage(self):
        self.ready, self.index = True, 0

    def append(self, samples: np.ndarray):
        self.data = samples if self.data is None else np.concatenate([self.data, samples])

    def take(self, n: int) -> np.ndarray:
        out = self.data[self.index: self.index + n]
        self.index += n
        return out


def make_cached_sampler(sample_images: Callable[[int], np.ndarray]) -> Callable:
    """Wraps a raw `n -> uint8 [n, H, W, C]` sampler with Storage caching
    (reference __sample_from_model, compute.py:199-226). Returns (gen,
    storage)."""
    storage = Storage()

    def gen(n: int) -> np.ndarray:
        if storage.ready:
            return storage.take(n)
        out = np.asarray(sample_images(n))
        storage.append(out)
        return out

    gen.storage = storage
    return gen


# ---------------------------------------------------------------------------
# Dataset image resolution for stats
# ---------------------------------------------------------------------------

def load_dataset_images(
    data_name: str, data_root: str, split: str, res: int,
    limit: Optional[int] = None,
) -> np.ndarray:
    """uint8 [N, H, W, C] source images for stats precompute (reference file
    resolvers, compute.py:68-98)."""
    from ..data import datasets as ds

    if data_name == "cifar10":
        d = ds.read_cifar10(data_root, "train" if split == "train" else "test")
    elif data_name == "MNIST":
        d = ds.read_mnist(data_root, split)
    elif data_name in ("imagenet32", "imagenet64"):
        r = int(data_name.replace("imagenet", ""))
        d = ds.read_imagenet(data_root, "train" if split == "train" else "val", r)
    elif data_name == "celeba":
        d = ds.read_celeba(data_root, [0] if split == "train" else [2], img_size=res,
                           limit=limit)
    elif data_name == "synthetic":
        d = ds.synthetic(limit or 512, res, 3)
    else:
        raise ValueError(f"Unknown dataset: {data_name}")
    imgs = d.images
    if limit is not None:
        imgs = imgs[:limit]
    return imgs


# ---------------------------------------------------------------------------
# Stats precompute (compute.py:101-144, 238-251)
# ---------------------------------------------------------------------------

def make_custom_stats(
    logger, data_root: str, data_name: str, split: str, res: int,
    mode: str, model_name: str, batch_size: int = 64,
    stats_dir: str = fid_m.DEFAULT_STATS_DIR, limit: Optional[int] = None,
    mesh=None,
) -> str:
    feature_fn = get_feature_extractor(model_name)
    images = load_dataset_images(data_name, data_root, split, res, limit)
    feats = fid_m.extract_features(
        images, feature_fn, FEATURE_RES[model_name], mode, batch_size,
        mesh=mesh,
    )
    path = fid_m.save_stats(feats, data_name, mode, model_name, split, res, stats_dir)
    if logger:
        logger.info(f"Saved stats ({len(feats)} samples) to {path}")
    return path


def precompute_statistics(
    logger, data_root: str, data_name: str, dataset_split: str, dataset_res: int,
    mode: str, model_name: str, stats_dir: str = fid_m.DEFAULT_STATS_DIR,
    limit: Optional[int] = None, mesh=None,
) -> None:
    """Skip-if-exists semantics (compute.py:238-251)."""
    if fid_m.stats_exist(data_name, mode, model_name, dataset_split, dataset_res, stats_dir):
        if logger:
            logger.info("Precomputed stats already exist for the dataset.")
        return
    make_custom_stats(logger, data_root, data_name, dataset_split, dataset_res,
                      mode, model_name, stats_dir=stats_dir, limit=limit,
                      mesh=mesh)


# ---------------------------------------------------------------------------
# FID / KID against stored stats (compute.py:254-294)
# ---------------------------------------------------------------------------

def calculate_fid_kid(
    gen: Callable[[int], np.ndarray],
    data_name: str, dataset_res: int, num_gen: int, dataset_split: str,
    batch_size: int, score_type: str, mode: str, model_name: str = "inception_v3",
    stats_dir: str = fid_m.DEFAULT_STATS_DIR, gen_batch_size: Optional[int] = None,
    mesh=None,
) -> float:
    """`gen_batch_size` (default = batch_size) sets how many images each
    sampler call produces — at FID scale the DDPM sampler chain amortizes
    its per-step overhead over the batch, so 256+ is much faster per image
    than the 32-64 used for feature-extraction batching (BENCH.md,
    time-to-50k measurements)."""
    gen_batch_size = gen_batch_size or batch_size
    dataset_res = 224 if data_name == "celeba" else dataset_res  # compute.py:256
    stats = fid_m.load_stats(data_name, mode, model_name, dataset_split, dataset_res,
                             stats_dir)
    if stats is None:
        raise FileNotFoundError(
            f"No precomputed stats for {data_name}/{mode}/{model_name}/"
            f"{dataset_split}/{dataset_res}; run precompute_statistics first."
        )
    feature_fn = get_feature_extractor(model_name)
    feats = []
    remaining = num_gen
    while remaining > 0:
        n = min(gen_batch_size, remaining)
        imgs = gen(n)
        feats.append(fid_m.extract_features(
            imgs, feature_fn, FEATURE_RES[model_name], mode, batch_size,
            mesh=mesh,
        ))
        remaining -= n
    gen_feats = np.concatenate(feats)

    if score_type == "FID":
        mu_g, sigma_g = fid_m.feature_stats(gen_feats)
        return fid_m.frechet_distance(stats["mu"], stats["sigma"], mu_g, sigma_g)
    if score_type == "KID":
        return fid_m.kid_score(stats["feats"], gen_feats)
    raise ValueError(f"Unknown score type {score_type}.")


# ---------------------------------------------------------------------------
# evaluate_model (compute.py:270-320)
# ---------------------------------------------------------------------------

def evaluate_model(
    *,
    sample_images: Callable[[int], np.ndarray],
    data_name: str,
    dataset_res: int,
    batch_size: int,
    num_gen: int,
    dataset_split: str,
    fid_kwargs: Optional[List[Dict]] = None,
    kid_kwargs: Optional[List[Dict]] = None,
    ssim_psnr_kwargs: Optional[Dict] = None,
    stats_dir: str = fid_m.DEFAULT_STATS_DIR,
    logger=None,
    gen_batch_size: Optional[int] = None,
    mesh=None,
) -> Dict[str, Any]:
    """One generation pass serves all requested metrics via Storage."""
    metrics: Dict[str, Any] = {}
    if data_name == "celeba":
        # reference resizes CelebA generations to 224 (bilinear) BEFORE
        # caching, so CLIP and Inception both see the 224 images
        # (compute.py:47, 219-222)
        raw_sampler = sample_images

        def sample_images(n):  # noqa: F811
            imgs = np.asarray(raw_sampler(n))
            return _bilinear_resize_uint8(imgs, 224)

    gen = make_cached_sampler(sample_images)

    for kwarg in fid_kwargs or []:
        mode, model_name = kwarg["mode"], kwarg["model_name"]
        key = f"FID{'_clean' if mode == 'clean' else ''}_{model_name.split('_')[0]}"
        metrics[key] = calculate_fid_kid(
            gen, data_name, dataset_res, num_gen, dataset_split, batch_size,
            "FID", mode, model_name, stats_dir, gen_batch_size, mesh=mesh,
        )
        gen.storage.set_ready_for_usage()
        if logger:
            logger.info(f"{key}: {metrics[key]:.4f}")

    for kwarg in kid_kwargs or []:
        mode, model_name = kwarg["mode"], kwarg["model_name"]
        key = f"KID{'_clean' if mode == 'clean' else ''}_{model_name.split('_')[0]}"
        metrics[key] = calculate_fid_kid(
            gen, data_name, dataset_res, num_gen, dataset_split, batch_size,
            "KID", mode, model_name, stats_dir, gen_batch_size, mesh=mesh,
        )
        gen.storage.set_ready_for_usage()
        if logger:
            logger.info(f"{key}: {metrics[key]:.4f}")

    if ssim_psnr_kwargs:
        import jax.numpy as jnp

        data_range = float(ssim_psnr_kwargs.get("data_range", 255))
        loader = ssim_psnr_kwargs["loader"]
        ssim_vals, psnr_vals = [], []
        n_used, n_total = 0, 0
        for imgs, _labels in loader:
            n_total += len(imgs)
            target = np.asarray(gen(len(imgs)), np.float32)
            if len(target) < len(imgs):
                # the generated cache ran short — stop, but never silently:
                # the reference breaks here too (compute.py:271-273)
                break
            n_used += len(imgs)
            # reference `discretize` truncates real images to uint8
            # (metrics/utils.py:11-21: (img*255).to(uint8)) before SSIM/PSNR
            real = (imgs * 255).astype(np.uint8).astype(np.float32)
            if real.shape[-1] == 1:
                real = np.repeat(real, target.shape[-1] // real.shape[-1], axis=-1)
            ssim_vals.append(float(ssim_fn(jnp.asarray(target, jnp.float32),
                                           jnp.asarray(real), data_range)))
            psnr_vals.append(float(psnr_fn(jnp.asarray(target, jnp.float32),
                                           jnp.asarray(real), data_range)))
        if logger and n_used < n_total:
            logger.warning(
                f"SSIM/PSNR covered only {n_used}/{n_total} eval images "
                f"(generated cache holds {num_gen}); raise num_gen for full coverage."
            )
        metrics["SSIM"] = float(np.mean(ssim_vals)) if ssim_vals else float("nan")
        metrics["PSNR"] = float(np.mean(psnr_vals)) if psnr_vals else float("nan")
        gen.storage.set_ready_for_usage()

    gen.storage.reset()
    return metrics


def _bilinear_resize_uint8(images: np.ndarray, size: int) -> np.ndarray:
    """torchvision T.Resize(size) semantics (PIL bilinear) on uint8 NHWC."""
    from PIL import Image

    if images.shape[1] == size and images.shape[2] == size:
        return images
    out = np.empty((len(images), size, size, images.shape[3]), np.uint8)
    for i, im in enumerate(images):
        arr = im[..., 0] if im.shape[-1] == 1 else im
        r = np.asarray(Image.fromarray(arr).resize((size, size), Image.BILINEAR))
        out[i] = r[..., None] if im.shape[-1] == 1 else r
    return out


# ---------------------------------------------------------------------------
# Trainer hook
# ---------------------------------------------------------------------------

def make_nf_evaluate_fn(
    *,
    data_name: str,
    loaders,
    fid_configs: List[Dict],
    kid_configs: List[Dict],
    img_size: int,
    temperature: float,
    logger,
    stats_dir: str = fid_m.DEFAULT_STATS_DIR,
    quick_num_gen: int = 64,
    ssim_psnr: Optional[Dict] = None,
    dataset_split: str = "train",
    gen_batch_size: int = 256,
    mesh=None,
):
    """evaluate_fn(sample_fn, params, epoch) used by both trainers: quick
    FID/KID at checkpoint epochs (reference num_gen=15 for NF trainer.py:202-207,
    2000 for diffusion trainer.py:195-204; configure via quick_num_gen),
    full DATASET_SIZE counts at the final/eval phase. `dataset_split` defaults
    to "train" — the reference scores against train-split stats with
    DATASET_SIZE[data]["train"] counts in both trainers."""
    split = dataset_split
    if data_name == "imagenet32" and split == "test":
        split = "val"  # imagenet32 has no test split (data/__init__.py:8-21)

    def evaluate_fn(sample_fn, params, epoch, full: bool = False):
        import jax

        # checkpoint-epoch evals are quick; `full=True` (final/eval phase)
        # generates the reference's DATASET_SIZE counts (data/__init__.py:8-21)
        num_gen = (
            DATASET_SIZE.get(data_name, {}).get(split, quick_num_gen)
            if full else quick_num_gen
        )

        # Each sample_images call must draw fresh randomness: fold a running
        # call counter into the salt, otherwise every cached-generation batch
        # within one evaluation is bit-identical and FID/KID covariance and
        # KID MMD estimates collapse (duplicated samples).
        call_counter = [0]

        def sample_images(n):
            key = jax.random.PRNGKey(epoch)
            salt = np.int32(epoch * 100_003 + call_counter[0])
            call_counter[0] += 1
            return np.asarray(sample_fn(params, key, n, temperature, salt))

        ssim_kwargs = None
        if ssim_psnr is not None:
            ssim_kwargs = {"data_range": ssim_psnr.get("data_range", 255),
                           "loader": loaders.eval}
        try:
            metrics = evaluate_model(
                sample_images=sample_images, data_name=data_name,
                dataset_res=img_size, batch_size=32, num_gen=num_gen,
                dataset_split=split, fid_kwargs=fid_configs,
                kid_kwargs=kid_configs, ssim_psnr_kwargs=ssim_kwargs,
                stats_dir=stats_dir, logger=logger,
                gen_batch_size=max(gen_batch_size, 32), mesh=mesh,
            )
            logger.info(f"epoch {epoch} metrics: {metrics}")
            return metrics
        except FileNotFoundError as e:
            logger.warning(f"Skipping FID/KID (no precomputed stats): {e}")
            return {}

    return evaluate_fn
