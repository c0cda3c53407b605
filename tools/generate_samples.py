#!/usr/bin/env python
"""Standalone sample generation from a finished run directory.

The reference only generates images inside its training/eval loops (grids
logged to Aim, samples produced for FID); there is no "give me N samples
from this checkpoint" command (/root/reference/diffusion_prior/trainer.py:
181-182 is the closest). This tool fills that production gap for BOTH run
kinds, rebuilding everything from the run dir alone:

  * baseline (Glow) runs: architecture.json + model_gaussian_* checkpoints
    -> prior sample -> flow inverse;
  * diffusion-prior runs: diffusion_architecture.json + model_diffusion_*
    checkpoints -> per-part denoise chains -> formater -> flow inverse.

Generation is batched (FID-scale friendly: batch 256 + --ddim 100 matches
the BENCH.md time-to-50k recipe) and lands as `samples.npz` (uint8 NHWC)
plus an 8-wide `grid.png` preview.

    python tools/generate_samples.py --run-dir nf_mnist_2026-.. --n 1024
    python tools/generate_samples.py --run-dir diff_mnist_2026-.. \
        --n 50000 --batch 256 --ddim 100 --out /tmp/fid_samples
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_glow(run_dir: str, epoch, mesh=None):
    import jax

    from nfdpm_tpu.training import nf_trainer as nft
    from nfdpm_tpu.training.runload import load_glow_run

    run = load_glow_run(run_dir, epoch)
    params = run.params
    if mesh is not None:
        from nfdpm_tpu.parallel import mesh as mesh_m

        params = mesh_m.replicate(mesh, params)
    else:
        params = jax.device_put(params)
    sample_fn = nft.make_sample_fn(run.gcfg, run.tcfg, run.img_size,
                                   mesh=mesh)
    return sample_fn, params, run.temperature, run.epoch


def _build_diffusion(run_dir: str, epoch, ddim, mesh=None, use_ema=True,
                     sampler=None):
    import jax

    from nfdpm_tpu.training import diffusion_trainer as dt
    from nfdpm_tpu.training.runload import load_diffusion_run

    batch_sharding = None
    if mesh is not None:
        from nfdpm_tpu.parallel import mesh as mesh_m

        batch_sharding = mesh_m.data_sharding(mesh)
    run = load_diffusion_run(run_dir, epoch, ddim,
                             batch_sharding=batch_sharding, use_ema=use_ema,
                             sampler=sampler)
    params = run.params
    if mesh is not None:
        from nfdpm_tpu.parallel import mesh as mesh_m

        params = mesh_m.replicate(mesh, params)
    else:
        params = jax.device_put(params)
    sample_fn = dt.make_sample_fn(run.backbone, run.dp, run.tcfg, mesh=mesh)
    return sample_fn, params, run.temperature, run.epoch


def generate_batched(sample_fn, params, n, batch, temperature, seed):
    """Chunked fixed-batch generation: ONE compiled program (fixed batch),
    final chunk trimmed, a fresh salt folded per chunk so no two chunks
    repeat samples (cf. compute.py's salt-collapse note). Shared by the
    CLI below and tools/serve.py."""
    import jax
    import numpy as np

    key = jax.random.PRNGKey(seed)
    chunks, produced, salt = [], 0, 0
    while produced < n:
        take = min(batch, n - produced)
        imgs = np.asarray(sample_fn(params, key, batch, temperature,
                                    np.int32(salt)))[:take]
        chunks.append(imgs)
        produced += take
        salt += 1
    return np.concatenate(chunks, axis=0)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--run-dir", required=True,
                    help="run dir (or its name under outputs/)")
    ap.add_argument("--epoch", type=int, default=None,
                    help="checkpoint epoch (default: latest)")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=None,
                    help="sampling temperature (default: the run's)")
    ap.add_argument("--ddim", type=int, default=None,
                    help="diffusion runs: override sampling_timesteps "
                         "(DDIM stride) for FID-scale generation")
    ap.add_argument("--sampler", default=None,
                    choices=["auto", "ancestral", "ddim", "dpm++"],
                    help="diffusion runs: override the sampler (dpm++ = "
                         "DPM-Solver++(2M): DDIM-100 quality at ~25 steps; "
                         "pair with --ddim 25)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard generation over ALL local devices (a "
                         "(n_devices, 1) data mesh): the prior draws / "
                         "denoise chains and the flow inverse run "
                         "data-parallel — multi-chip FID-scale generation")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="output dir (default: <run-dir>/generated)")
    ap.add_argument("--no-npz", action="store_true",
                    help="skip samples.npz (grid preview only)")
    ap.add_argument("--no-ema", action="store_true",
                    help="diffusion runs: sample the live weights instead "
                         "of the EMA shadow (A/B; EMA is the default when "
                         "the run tracked one)")
    args = ap.parse_args(argv)
    if args.n < 1 or args.batch < 1:
        ap.error("--n and --batch must be >= 1")

    import jax
    import numpy as np

    from nfdpm_tpu.training.runload import detect_kind, resolve_run_dir
    from nfdpm_tpu.utils.env import enable_compilation_cache
    from nfdpm_tpu.training.tracking import save_image_grid

    enable_compilation_cache()
    try:
        run_dir = resolve_run_dir(args.run_dir)
        prefix, newest = detect_kind(run_dir)
    except FileNotFoundError as e:
        raise SystemExit(str(e))
    epoch = args.epoch if args.epoch is not None else newest

    mesh = None
    if args.data_parallel:
        from nfdpm_tpu.parallel import mesh as mesh_m

        mesh = mesh_m.make_mesh()

    if prefix == "diffusion":
        sample_fn, params, run_temp, epoch = _build_diffusion(
            run_dir, epoch, args.ddim, mesh=mesh, use_ema=not args.no_ema,
            sampler=args.sampler)
    else:
        sample_fn, params, run_temp, epoch = _build_glow(
            run_dir, epoch, mesh=mesh)
    temperature = args.temperature if args.temperature is not None else run_temp

    out_dir = args.out or os.path.join(run_dir, "generated")
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.perf_counter()
    samples = generate_batched(sample_fn, params, args.n, args.batch,
                               temperature, args.seed)
    dt_s = time.perf_counter() - t0

    grid_path = os.path.join(out_dir, "grid.png")
    save_image_grid(samples[:64], grid_path)
    paths = {"grid": grid_path}
    if not args.no_npz:
        npz_path = os.path.join(out_dir, "samples.npz")
        np.savez_compressed(npz_path, samples=samples)
        paths["npz"] = npz_path

    print(json.dumps({
        "run_dir": run_dir, "kind": prefix, "epoch": epoch,
        "n": int(samples.shape[0]), "shape": list(samples.shape),
        "temperature": temperature, "seconds": round(dt_s, 2),
        "samples_per_sec": round(samples.shape[0] / dt_s, 1),
        "devices": jax.device_count() if args.data_parallel else 1, **paths,
    }))


if __name__ == "__main__":
    main()
