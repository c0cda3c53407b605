#!/usr/bin/env python
"""Latent interpolation strips from a finished run directory.

The reference exposes interpolation only as a library method — per-part
diffusion interpolation at t=T-1 (/root/reference/diffusion_prior/model.py:
149-150 calling gaussian_diffusion.py:785-804) with no CLI around it. This
tool makes it a one-liner for BOTH run kinds:

  * diffusion-prior runs: x1/x2 -> flow transform -> formater -> per-part
    diffusion interpolate (q_sample both endpoints to T-1, lerp, denoise)
    -> formater inverse -> flow inverse. The WHOLE strip denoises in one
    batched chain (lambda broadcasts elementwise through q_sample/lerp).
  * baseline Glow runs: linear interpolation directly in flow latent space
    (exact endpoints at lambda=0/1 since the flow is a bijection).

Endpoints default to two test-split images of the run's own dataset
(rebuilt from the persisted config.yaml).

    python tools/interpolate.py --run-dir <run> --idx 0 1 --steps 8
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_endpoint_images(run_dir: str, img_size: int, idx):
    """Two uint8 test images via the run's persisted data config."""
    import yaml

    from nfdpm_tpu.data.pipeline import read_dataset
    from nfdpm_tpu.utils.config import Config

    with open(os.path.join(run_dir, "config.yaml")) as f:
        cfg = Config(yaml.safe_load(f))
    loaders = read_dataset(
        cfg.data.name, cfg.data.root, digits=cfg.data.get("digits"),
        batch_size=2, img_size=img_size,
        transformations=list(cfg.data.get("transformations") or []),
        seed=int(cfg.get("seed", 0)),
        synthetic_fallback=bool(cfg.data.get("synthetic_fallback", False)),
        synthetic_n=int(cfg.data.get("synthetic_n", 512)),
    )
    images = loaders.test.dataset.images  # post-static-transform uint8 NHWC
    a, b = idx
    if max(a, b) >= len(images):
        raise SystemExit(f"--idx {a} {b} out of range (test set has "
                         f"{len(images)} images)")
    return images[[a, b]]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--run-dir", required=True,
                    help="run dir (or its name under outputs/)")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--idx", type=int, nargs=2, default=(0, 1),
                    metavar=("A", "B"), help="test-split endpoint indices")
    ap.add_argument("--steps", type=int, default=8,
                    help="number of lambda values in [0, 1]")
    ap.add_argument("--no-ema", action="store_true",
                    help="diffusion runs: use the live weights instead of "
                         "the EMA shadow")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="output dir (default: <run-dir>/interpolations)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.ops import quantize as q
    from nfdpm_tpu.training.runload import (
        detect_kind, load_diffusion_run, load_glow_run, resolve_run_dir,
    )
    from nfdpm_tpu.training.tracking import save_image_grid
    from nfdpm_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    try:
        run_dir = resolve_run_dir(args.run_dir)
        kind, _ = detect_kind(run_dir)
    except FileNotFoundError as e:
        raise SystemExit(str(e))

    steps = max(args.steps, 2)
    lams = jnp.linspace(0.0, 1.0, steps)
    key = jax.random.PRNGKey(args.seed)

    if kind == "diffusion":
        run = load_diffusion_run(run_dir, args.epoch,
                                 use_ema=not args.no_ema)
        n_bits = run.tcfg.n_bits
        raw = _load_endpoint_images(run_dir, run.img_size, args.idx)

        @jax.jit
        def strip_fn(params, x_pair, lams, key):
            x = q.preprocess(x_pair.astype(jnp.float32) / 255.0, n_bits)
            latents, _ = run.backbone.transform(params["flow"], x)
            parts = run.dp.formater.process_latents(latents)
            l1 = [jnp.repeat(p[:1], steps, axis=0) for p in parts]
            l2 = [jnp.repeat(p[1:2], steps, axis=0) for p in parts]
            lam_b = lams.reshape(steps, 1, 1, 1)
            mixed = run.dp.interpolate_latents(
                params["diffusion"], key, l1, l2, lam=lam_b)
            flow_latents = run.dp.formater.postprocess(mixed)
            imgs = run.backbone.invert(params["flow"], flow_latents)
            return q.postprocess(imgs, n_bits)

        interp = np.asarray(strip_fn(run.params, jnp.asarray(raw), lams, key))
    else:
        run = load_glow_run(run_dir, args.epoch)
        n_bits = run.tcfg.n_bits
        raw = _load_endpoint_images(run_dir, run.img_size, args.idx)

        @jax.jit
        def strip_fn(params, x_pair, lams):
            x = q.preprocess(x_pair.astype(jnp.float32) / 255.0, n_bits)
            latents, _, _ = glow_m.forward(params["flow"], run.gcfg, x,
                                           with_logp=False)
            lam_b = lams.reshape(steps, 1, 1, 1)
            mixed = [(1.0 - lam_b) * z[:1] + lam_b * z[1:2] for z in latents]
            imgs = glow_m.inverse(params["flow"], run.gcfg, mixed)
            return q.postprocess(imgs, n_bits)

        interp = np.asarray(strip_fn(run.params, jnp.asarray(raw), lams))

    # strip layout: [x1 raw | lambda 0..1 | x2 raw] on one row
    strip = np.concatenate([raw[:1], interp, raw[1:2]], axis=0)
    out_dir = args.out or os.path.join(run_dir, "interpolations")
    os.makedirs(out_dir, exist_ok=True)
    a, b = args.idx
    png = os.path.join(out_dir, f"interp_{a}_{b}.png")
    save_image_grid(strip, png, nrow=len(strip))
    npz = os.path.join(out_dir, f"interp_{a}_{b}.npz")
    np.savez_compressed(npz, strip=strip, lams=np.asarray(lams))
    print(json.dumps({
        "run_dir": run_dir, "kind": kind, "epoch": run.epoch,
        "idx": [a, b], "steps": steps, "png": png, "npz": npz,
        "shape": list(strip.shape),
    }))


if __name__ == "__main__":
    main()
