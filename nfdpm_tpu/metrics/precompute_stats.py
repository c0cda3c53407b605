#!/usr/bin/env python
"""Stats precompute CLI.

Counterpart of /root/reference/metrics/precompute_stats.py: precompute FID/KID
feature statistics for celeba@224 and imagenet32/64 (plus any other
supported dataset) across {legacy_tensorflow, clean} x {inception_v3,
clip_vit_b_32}; `--action clean` wipes the stats dir (:12-17, 64-65).

    python -m nfdpm_tpu.metrics.precompute_stats --action precompute \
        --data_root ./datasets --datasets celeba imagenet32
    python -m nfdpm_tpu.metrics.precompute_stats --action clean
"""

from __future__ import annotations

import argparse
import logging

from . import fid as fid_m
from .compute import precompute_statistics

DEFAULT_PLAN = {
    # (dataset, split, res) x (mode, model)
    "celeba": [("train", 224), ("test", 224)],
    "imagenet32": [("train", 32), ("val", 32)],
    "imagenet64": [("train", 64), ("val", 64)],
    "cifar10": [("train", 32), ("test", 32)],
    "MNIST": [("train", 32), ("test", 32)],
}
MODES = ["legacy_tensorflow", "clean"]
MODELS = ["inception_v3", "clip_vit_b_32"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--action", choices=["precompute", "clean"], required=True)
    p.add_argument("--data_root", default="./datasets")
    p.add_argument("--datasets", nargs="*", default=["celeba", "imagenet32", "imagenet64"])
    p.add_argument("--modes", nargs="*", default=MODES)
    p.add_argument("--models", nargs="*", default=MODELS)
    p.add_argument("--stats_dir", default=fid_m.DEFAULT_STATS_DIR)
    p.add_argument("--limit", type=int, default=None,
                   help="cap the number of source images (smoke runs)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the feature-net forward over all local "
                        "devices (Inception/CLIP dominate full-dataset "
                        "precompute at 50k-1.28M images)")
    args = p.parse_args(argv)

    from ..utils.env import enable_compilation_cache

    enable_compilation_cache()  # Inception/CLIP nets compile in minutes

    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("precompute_stats")

    mesh = None
    if args.data_parallel:
        from ..parallel import mesh as mesh_m

        mesh = mesh_m.make_mesh()

    if args.action == "clean":
        fid_m.remove_all_stats(args.stats_dir)
        logger.info(f"Cleaned stats dir {args.stats_dir}")
        return

    for name in args.datasets:
        for split, res in DEFAULT_PLAN.get(name, [("train", 32)]):
            for mode in args.modes:
                for model in args.models:
                    if name == "celeba" and model == "clip_vit_b_32" and res != 224:
                        continue
                    logger.info(f"precompute {name} {split}@{res} {mode} {model}")
                    precompute_statistics(
                        logger, args.data_root, name, split, res, mode, model,
                        stats_dir=args.stats_dir, limit=args.limit, mesh=mesh,
                    )


if __name__ == "__main__":
    main()
