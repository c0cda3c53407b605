#!/usr/bin/env python
"""Export an nfdpm_tpu Glow run as a PyTorch reference checkpoint.

The inverse of tools/convert_reference_checkpoint.py: reads a stage-1
(gaussian) run directory and writes `model_gaussian_{epoch:03d}.pt` in the
exact format the reference's `save_model` produces
(/root/reference/normalizing_flow/prior.py:102-115: keys {flow, prior_dist,
optimizer, current_iter}), loadable by the unmodified reference code with
`load_state_dict(strict=True)` — so models trained on TPU here can be
evaluated, sampled, or fine-tuned by reference users. A `model_{epoch:03d}
.pt` alias is also written because the reference's resume path loads that
name (trainer.py:112 — its own save/load filename mismatch).

Diffusion (stage-2) runs are NOT exportable: the reference's own diffusion
checkpoints never contained the UNet weights (model.py:100 unregistered
`__priors` bug), so there is no working torch-side load target.

    python tools/export_reference_checkpoint.py \
        --run-dir outputs/mnist_glow_2026… [--epoch N] [--out DIR] [--lr 1e-4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", required=True)
    p.add_argument("--epoch", type=int, default=None,
                   help="checkpoint epoch (default: latest)")
    p.add_argument("--out", default=None,
                   help="output dir (default: <run-dir>/exported)")
    p.add_argument("--lr", type=float, default=1e-4,
                   help="lr recorded in the exported optimizer param group "
                        "(the reference overrides it on resume anyway, "
                        "trainer.py:119-120)")
    args = p.parse_args(argv)

    import torch

    from nfdpm_tpu.training.runload import load_glow_run, resolve_run_dir
    from nfdpm_tpu.utils.reference_export import (
        adam_skeleton,
        export_gaussian_prior_state_dict,
        export_glow_state_dict,
    )

    run_dir = resolve_run_dir(args.run_dir)
    run = load_glow_run(run_dir, args.epoch)
    flow_sd = export_glow_state_dict(run.params["flow"], run.gcfg.levels,
                                     run.gcfg.steps)
    prior_sd = export_gaussian_prior_state_dict(run.params["prior"])
    to_torch = lambda sd: {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    ckpt = {
        "flow": to_torch(flow_sd),
        "prior_dist": to_torch(prior_sd),
        "optimizer": adam_skeleton(flow_sd, args.lr),
        "current_iter": int(getattr(run, "current_iter", 0) or 0),
    }
    out_dir = args.out or os.path.join(run_dir, "exported")
    os.makedirs(out_dir, exist_ok=True)
    name = f"model_gaussian_{run.epoch:03d}.pt"
    torch.save(ckpt, os.path.join(out_dir, name))
    # resume-path alias (reference trainer.py:112 loads model_{epoch}.pt)
    torch.save(ckpt, os.path.join(out_dir, f"model_{run.epoch:03d}.pt"))
    n = sum(v.numel() for v in ckpt["flow"].values())
    print(f"wrote {os.path.join(out_dir, name)} (+ resume alias), "
          f"{n:,} flow elements, epoch {run.epoch}")


if __name__ == "__main__":
    main()
