"""FID / KID scoring: on-device features, host-side score math, stats store.

Clean-fid-compatible pipeline (reference integration:
/root/reference/metrics/compute.py):

  * Feature extraction batches uint8 images through the JAX Inception-v3
    (2048-d) or CLIP ViT-B/32 (512-d) extractors on device.
  * Resize modes: "clean" = PIL bicubic (clean-fid's high-quality mode);
    "legacy_tensorflow" = bilinear without antialias (TF1 semantics, the
    mode the reference uses for most experiments).
  * FID: Frechet distance with a host scipy sqrtm (the classic Heusel
    formulation); KID: unbiased polynomial-kernel MMD averaged over
    clean-fid's protocol of 100 subsets of size <=1000.
  * Stats store: per-(dataset, mode, model, split, res) npz files holding
    mu/sigma (FID) and raw features (KID), with skip-if-exists precompute
    (reference precompute_statistics, compute.py:238-251).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import numpy as np

DEFAULT_STATS_DIR = os.path.join(os.path.expanduser("~"), ".nfdpm_tpu", "stats")


# ---------------------------------------------------------------------------
# Resizing (clean-fid mode semantics)
# ---------------------------------------------------------------------------

def resize_batch(images: np.ndarray, size: int, mode: str) -> np.ndarray:
    """uint8 [N, H, W, C] -> uint8-ish float [N, size, size, C].

    clean: PIL bicubic (clean-fid "clean" mode). legacy_tensorflow: bilinear
    without antialias (TF1 `tf.image.resize_bilinear` semantics, which
    clean-fid reproduces for the legacy Inception graph)."""
    if images.shape[1] == size and images.shape[2] == size:
        return images.astype(np.float32)
    if mode == "clean":
        # clean-fid's make_resizer("PIL", quantize_after=False, "bicubic"):
        # each channel is resized as a float32 'F'-mode PIL image, so the
        # output is fractional (NOT re-quantized through a uint8 image).
        from PIL import Image

        out = np.empty((len(images), size, size, images.shape[3]), np.float32)
        for i, im in enumerate(images):
            for c in range(im.shape[-1]):
                ch = Image.fromarray(im[..., c].astype(np.float32), mode="F")
                out[i, :, :, c] = np.asarray(
                    ch.resize((size, size), Image.BICUBIC), np.float32
                )
        return out
    elif mode == "legacy_tensorflow":
        return tf1_bilinear_resize(images.astype(np.float32), size)
    raise ValueError(f"Unknown resize mode: {mode}")


def tf1_bilinear_resize(images: np.ndarray, size: int) -> np.ndarray:
    """TF1 `tf.image.resize_bilinear(align_corners=False)` semantics: source
    coordinate = out_idx * (in/out), clamped — NOT half-pixel centers (which
    TF2/jax.image use). clean-fid's legacy_tensorflow mode reproduces the
    original TF-FID graph, so exactness matters here."""
    import jax
    import jax.numpy as jnp

    n, h, w, c = images.shape
    scale_h, scale_w = h / size, w / size
    ys = np.arange(size, dtype=np.float64) * scale_h
    xs = np.arange(size, dtype=np.float64) * scale_w
    y0 = np.clip(np.floor(ys).astype(np.int32), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int32), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(np.float32)
    wx = (xs - x0).astype(np.float32)

    x_j = jnp.asarray(images, jnp.float32)
    top = x_j[:, y0][:, :, x0] * (1 - wx)[None, None, :, None]         + x_j[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = x_j[:, y1][:, :, x0] * (1 - wx)[None, None, :, None]         + x_j[:, y1][:, :, x1] * wx[None, None, :, None]
    out = top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
    return np.asarray(out)


def _to_rgb(images: np.ndarray) -> np.ndarray:
    if images.shape[-1] == 1:
        return np.repeat(images, 3, axis=-1)
    return images


def extract_features(
    images: np.ndarray,
    feature_fn: Callable,
    size: int,
    mode: str,
    batch_size: int = 64,
    mesh=None,
) -> np.ndarray:
    """uint8 [N, H, W, C] -> [N, D] features (resize -> extractor).

    The resized images are fed to the feature net as float32 in [0, 255]
    WITHOUT re-quantizing to uint8 — clean-fid passes the resizer's float
    output straight to Inception (its ResizeDataset returns float tensors),
    so quantizing here would deviate from clean-fid's exact values.

    With `mesh`, each batch is placed sharded P("data") so the jitted
    feature net runs data-parallel over all mesh devices (GSPMD partitions
    from the input sharding) — the Inception/CLIP forward dominates
    full-dataset stats precompute at 50k-1.28M images. Final partial
    batches are padded to the compiled batch and trimmed after."""
    import jax
    import jax.numpy as jnp

    sharding = None
    if mesh is not None:
        from ..parallel import mesh as mesh_m

        n_data = mesh.shape.get("data", 1)
        # round UP to a multiple of the data axis (device_put needs the
        # leading dim divisible; the pad-and-trim below absorbs the rest) —
        # never fail hours into a run over a batch/mesh mismatch
        batch_size = ((batch_size + n_data - 1) // n_data) * n_data
        sharding = mesh_m.data_sharding(mesh)

    feats = []
    for i in range(0, len(images), batch_size):
        chunk = _to_rgb(images[i: i + batch_size])
        resized = resize_batch(chunk, size, mode).astype(np.float32)
        n_valid = len(resized)
        if sharding is not None:
            if n_valid < batch_size:  # pad: sharding needs the full batch
                pad = np.repeat(resized[-1:], batch_size - n_valid, axis=0)
                resized = np.concatenate([resized, pad], axis=0)
            x = jax.device_put(resized, sharding)
        else:
            x = jnp.asarray(resized)
        feats.append(np.asarray(feature_fn(x))[:n_valid])
    return np.concatenate(feats, axis=0)


# ---------------------------------------------------------------------------
# Score math
# ---------------------------------------------------------------------------

def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Classic FID: |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def kid_score(
    feats1: np.ndarray, feats2: np.ndarray,
    num_subsets: int = 100, max_subset_size: int = 1000, seed: int = 0,
) -> float:
    """Unbiased MMD^2 with the polynomial kernel (x.y/d + 1)^3, averaged
    over `num_subsets` random subsets (clean-fid's KID protocol)."""
    n = feats1.shape[1]
    m = min(min(feats1.shape[0], feats2.shape[0]), max_subset_size)
    rng = np.random.default_rng(seed)
    t = 0.0
    for _ in range(num_subsets):
        x = feats2[rng.choice(feats2.shape[0], m, replace=False)].astype(np.float64)
        y = feats1[rng.choice(feats1.shape[0], m, replace=False)].astype(np.float64)
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


# ---------------------------------------------------------------------------
# Stats store
# ---------------------------------------------------------------------------

def stat_filename(name: str, mode: str, model_name: str, split: str, res: int) -> str:
    """clean-fid naming convention: {name}_{mode}_{split}_{res}(_model).npz"""
    model_tag = "" if model_name == "inception_v3" else f"_{model_name}"
    return f"{name.lower()}_{mode}_{split}_{res}{model_tag}.npz"


def save_stats(
    feats: np.ndarray, name: str, mode: str, model_name: str, split: str, res: int,
    stats_dir: str = DEFAULT_STATS_DIR,
) -> str:
    os.makedirs(stats_dir, exist_ok=True)
    mu, sigma = feature_stats(feats)
    path = os.path.join(stats_dir, stat_filename(name, mode, model_name, split, res))
    np.savez_compressed(path, mu=mu, sigma=sigma, feats=feats.astype(np.float32))
    return path


def load_stats(
    name: str, mode: str, model_name: str, split: str, res: int,
    stats_dir: str = DEFAULT_STATS_DIR,
):
    path = os.path.join(stats_dir, stat_filename(name, mode, model_name, split, res))
    if not os.path.exists(path):
        return None
    d = np.load(path)
    return {"mu": d["mu"], "sigma": d["sigma"], "feats": d["feats"]}


def stats_exist(name, mode, model_name, split, res, stats_dir=DEFAULT_STATS_DIR) -> bool:
    return os.path.exists(
        os.path.join(stats_dir, stat_filename(name, mode, model_name, split, res))
    )


def remove_all_stats(stats_dir: str = DEFAULT_STATS_DIR) -> None:
    """`clean` action of the stats CLI (reference precompute_stats.py:12-17)."""
    if os.path.isdir(stats_dir):
        for f in os.listdir(stats_dir):
            if f.endswith(".npz"):
                os.remove(os.path.join(stats_dir, f))
