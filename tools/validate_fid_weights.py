#!/usr/bin/env python
"""Bit-compare our on-device feature extractors against clean-fid, given real
weights (VERDICT round-1 item #2b).

This environment is zero-egress, so the real weight files cannot be fetched
here; run this tool on any machine that has them. Expected files in
$NFDPM_TPU_WEIGHTS_DIR (default ~/.nfdpm_tpu/weights):

  pt_inception-2015-12-05-6726825d.pth
      clean-fid's pt_inception (the pytorch-fid TF-port).
      URL:    https://github.com/mseitzer/pytorch-fid/releases/download/
              fid_weights/pt_inception-2015-12-05-6726825d.pth
      SHA256: 6726825d0af5f729cebd5821db510b11b1cfad8faad88a03f1befd49fb9129b2
      (clean-fid resolves the same file via `cleanfid.inception_pytorch`.)

  ViT-B-32.pt
      OpenAI CLIP ViT-B/32 jit archive.
      URL:    https://openaipublic.azureedge.net/clip/models/
              40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt
      SHA256: 40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af
      (the hash is embedded in the URL; clean-fid loads it through the
      `clip` package for model_name="clip_vit_b_32".)

Checks, per extractor:
  1. strict weight import (every leaf assigned, every key consumed —
     structurally pre-validated offline by tests/test_weight_importers.py);
  2. feature parity on deterministic uint8 inputs vs the torch model run
     locally (requires torch; cleanfid/clip packages are used when installed,
     otherwise the torch graph is rebuilt from the same .pth);
  3. when the `cleanfid` package is installed: FID of two fixed synthetic
     image sets computed by clean-fid vs by nfdpm_tpu.metrics — the
     end-to-end number parity check.

Exit code 0 = all available checks passed.
"""

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WEIGHTS_DIR = os.environ.get(
    "NFDPM_TPU_WEIGHTS_DIR",
    os.path.join(os.path.expanduser("~"), ".nfdpm_tpu", "weights"),
)
INCEPTION_FILE = "pt_inception-2015-12-05-6726825d.pth"
INCEPTION_SHA256 = "6726825d0af5f729cebd5821db510b11b1cfad8faad88a03f1befd49fb9129b2"
CLIP_FILE = "ViT-B-32.pt"

ATOL = 2e-3  # fp32 conv reassociation across frameworks; FID moves < 0.1


def _sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def validate_inception(path) -> bool:
    import torch

    from nfdpm_tpu.metrics import inception

    digest = _sha256(path)
    if digest != INCEPTION_SHA256:
        print(f"  WARNING: sha256 {digest} != expected {INCEPTION_SHA256}")

    params = inception.load_torch_weights(path, strict=True)
    print("  strict import OK (every leaf assigned)")
    ours = inception.make_feature_fn(params)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 299, 299, 3)).astype(np.uint8)
    ours_feats = np.asarray(ours(imgs))

    # torch side: prefer cleanfid's own builder; else pytorch-fid's; else the
    # bundled pure-torch mirror (NO extra installs needed — VERDICT r2 item 9)
    try:
        from cleanfid.inception_pytorch import InceptionV3W  # type: ignore

        net = InceptionV3W(os.path.dirname(path), download=False)
        net.eval()
        with torch.no_grad():
            x = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float()
            theirs = net(x).numpy()
    except ImportError:
        try:
            from pytorch_fid.inception import InceptionV3  # type: ignore

            net = InceptionV3([3], resize_input=False, normalize_input=True)
            net.eval()
            with torch.no_grad():
                x = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float() / 255.0
                theirs = net(x)[0].squeeze(-1).squeeze(-1).numpy()
        except ImportError:
            from nfdpm_tpu.metrics import torch_inception

            print("  cleanfid/pytorch_fid not installed -> using bundled "
                  "pure-torch FID-Inception mirror (torch-only mode)")
            net = torch_inception.load_weights(
                torch_inception.build_feature_model(), path)
            theirs = torch_inception.features_u8(net, imgs)

    err = np.abs(ours_feats - theirs).max()
    print(f"  feature parity max |err| = {err:.2e} (atol {ATOL})")
    return bool(err < ATOL)


def validate_clip(path) -> bool:
    import torch

    from nfdpm_tpu.metrics import clip_features

    params = clip_features.load_torch_weights(path, strict=True)
    print("  strict import OK (every leaf assigned)")
    ours = clip_features.make_feature_fn(params)

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (8, 224, 224, 3)).astype(np.uint8)
    ours_feats = np.asarray(ours(imgs))

    try:
        import clip  # type: ignore

        model, _ = clip.load("ViT-B/32", device="cpu", jit=False,
                             download_root=os.path.dirname(path))
        model.eval()
        mean = torch.tensor(clip_features.CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(clip_features.CLIP_STD).view(1, 3, 1, 1)
        with torch.no_grad():
            x = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float() / 255.0
            f = model.encode_image((x - mean) / std).float()
            theirs = (f / f.norm(dim=-1, keepdim=True)).numpy()
    except ImportError:
        from nfdpm_tpu.metrics import torch_clip

        print("  clip package not installed -> using bundled pure-torch "
              "ViT-B/32 visual mirror (torch-only mode)")
        net = torch_clip.load_weights(torch_clip.build_visual_model(), path)
        theirs = torch_clip.features_u8(net, imgs)

    err = np.abs(ours_feats - theirs).max()
    print(f"  feature parity max |err| = {err:.2e} (atol {ATOL})")
    return bool(err < ATOL)


def validate_fid_end_to_end(mode: str = "legacy_tensorflow") -> bool:
    """FID between two fixed synthetic image sets: clean-fid's folder-based
    protocol (PNGs in temp dirs) vs our in-memory pipeline on the same
    arrays — the full resize+extract+Frechet number must agree."""
    try:
        from cleanfid import fid as cf_fid  # type: ignore
    except ImportError:
        print("  cleanfid not installed -> end-to-end FID cross-check SKIPPED")
        return True

    import tempfile

    from PIL import Image

    from nfdpm_tpu.metrics.compute import get_feature_extractor
    from nfdpm_tpu.metrics.fid import extract_features, feature_stats, frechet_distance

    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (256, 32, 32, 3)).astype(np.uint8)
    b = rng.integers(0, 256, (256, 32, 32, 3)).astype(np.uint8)

    feature_fn = get_feature_extractor("inception_v3")
    fa = extract_features(a, feature_fn, size=299, mode=mode)
    fb = extract_features(b, feature_fn, size=299, mode=mode)
    ours = frechet_distance(*feature_stats(fa), *feature_stats(fb))

    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        for arr, d in ((a, d1), (b, d2)):
            for i, img in enumerate(arr):
                Image.fromarray(img).save(os.path.join(d, f"{i:05d}.png"))
        theirs = cf_fid.compute_fid(d1, d2, mode=mode,
                                    model_name="inception_v3")

    print(f"  end-to-end FID ({mode}): ours={ours:.4f} cleanfid={theirs:.4f}")
    return abs(ours - theirs) < 0.1


def refresh_stats(model_name: str, mode: str = "legacy_tensorflow",
                  dataset: str = None, data_root: str = "./datasets",
                  stats_dir: str = None) -> bool:
    """Recompute ONE stored stats file through the full precompute pipeline
    (resize -> on-device features -> mu/Sigma + raw KID feats -> stats dir)
    and reload it — the step that turns validated weights into usable
    FID/KID stats in the same command (VERDICT r3 item 7).

    With --dataset, routes through `make_custom_stats` on the real dataset
    files; without, a fixed synthetic image set exercises the identical
    code path under the name 'validate_synthetic'."""
    from nfdpm_tpu.metrics import fid as fid_m
    from nfdpm_tpu.metrics.compute import (
        FEATURE_RES,
        get_feature_extractor,
        make_custom_stats,
    )

    stats_dir = stats_dir or fid_m.DEFAULT_STATS_DIR
    if dataset:
        path = make_custom_stats(None, data_root, dataset, "train", 32,
                                 mode, model_name, stats_dir=stats_dir)
    else:
        rng = np.random.default_rng(7)
        imgs = rng.integers(0, 256, (128, 32, 32, 3)).astype(np.uint8)
        feature_fn = get_feature_extractor(model_name)
        feats = fid_m.extract_features(imgs, feature_fn,
                                       FEATURE_RES[model_name], mode)
        path = fid_m.save_stats(feats, "validate_synthetic", mode,
                                model_name, "train", 32, stats_dir)
    name = dataset or "validate_synthetic"
    st = fid_m.load_stats(name, mode, model_name, "train", 32, stats_dir)
    mu, sigma, kid_feats = st["mu"], st["sigma"], st["feats"]
    ok = (bool(np.all(np.isfinite(mu))) and bool(np.all(np.isfinite(sigma)))
          and kid_feats is not None and len(kid_feats) > 0)
    print(f"  stats file {path}: mu{mu.shape} sigma{sigma.shape} "
          f"kid_feats{np.asarray(kid_feats).shape} "
          f"{'OK' if ok else 'NON-FINITE'}")
    return bool(ok)


def make_random_weight_files(out_dir: str) -> None:
    """Write RANDOM-weight .pth files in the exact formats the real
    downloads use (pt_inception state dict; CLIP visual.* state dict), from
    the bundled pure-torch mirror architectures. Lets the ENTIRE command —
    strict import, feature parity vs torch, stats precompute — dry-run on a
    zero-egress box; with real files the same path validates absolutely."""
    import torch

    from nfdpm_tpu.metrics import torch_clip, torch_inception

    os.makedirs(out_dir, exist_ok=True)
    inc = torch_inception.build_feature_model()
    torch.save(inc.state_dict(), os.path.join(out_dir, INCEPTION_FILE))
    vit = torch_clip.build_visual_model()
    sd = {f"visual.{k}": v for k, v in vit.state_dict().items()}
    torch.save(sd, os.path.join(out_dir, CLIP_FILE))
    print(f"  wrote random-weight {INCEPTION_FILE} + {CLIP_FILE} to {out_dir}")


def main(argv=None):
    import argparse

    global WEIGHTS_DIR
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights-dir", default=WEIGHTS_DIR,
                   help="dir holding the two weight files (or to write the "
                        "--random-weights dry-run files into)")
    p.add_argument("--random-weights", action="store_true",
                   help="generate random-weight files in the expected "
                        "formats first, then run every check against them "
                        "(zero-egress dry-run of the full command)")
    p.add_argument("--dataset", default=None,
                   help="also recompute this dataset's stored stats file "
                        "(e.g. cifar10) via the real reader; default uses a "
                        "synthetic image set through the same pipeline")
    p.add_argument("--data_root", default="./datasets")
    p.add_argument("--stats_dir", default=None)
    p.add_argument("--mode", default="legacy_tensorflow",
                   choices=["legacy_tensorflow", "clean"])
    args = p.parse_args(argv)

    # honor an explicit JAX_PLATFORMS choice (the axon sitecustomize
    # force-selects the TPU backend after jax consumed the env var; the
    # CLIP ViT graph exceeds the tunnel proxy's request limit — HTTP 413 —
    # so feature extraction must be runnable on CPU on this box) and share
    # the persistent compile cache like every other CLI
    from nfdpm_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    WEIGHTS_DIR = args.weights_dir
    # keep the metrics engine's extractor resolution in lockstep with the
    # CLI choice (compute.WEIGHTS_DIR snapshots the env var at import)
    os.environ["NFDPM_TPU_WEIGHTS_DIR"] = WEIGHTS_DIR
    from nfdpm_tpu.metrics import compute as _compute

    _compute.WEIGHTS_DIR = WEIGHTS_DIR
    _compute._EXTRACTOR_CACHE.clear()
    if args.random_weights:
        print("[random-weights dry-run]")
        make_random_weight_files(WEIGHTS_DIR)

    ok = True
    for name, fn in (("inception_v3", validate_inception),
                     ("clip_vit_b_32", validate_clip)):
        path = os.path.join(WEIGHTS_DIR, INCEPTION_FILE if name == "inception_v3"
                            else CLIP_FILE)
        print(f"[{name}] {path}")
        if not os.path.exists(path):
            print("  weights file MISSING -> skipped "
                  "(see module docstring for URL + sha256)")
            continue
        ok = fn(path) and ok
        print(f"[{name} stats refresh]")
        ok = refresh_stats(name, args.mode, args.dataset, args.data_root,
                           args.stats_dir) and ok

    if os.path.exists(os.path.join(WEIGHTS_DIR, INCEPTION_FILE)):
        print("[fid end-to-end]")
        ok = validate_fid_end_to_end() and ok
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
