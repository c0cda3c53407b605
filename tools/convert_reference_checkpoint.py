#!/usr/bin/env python
"""Convert a PyTorch reference checkpoint into an nfdpm_tpu run directory.

The reference saves `model_gaussian_{epoch:03d}.pt` dicts with keys
{flow, prior_dist, optimizer, current_iter}
(/root/reference/normalizing_flow/prior.py:102-115). This tool maps the flow
and prior state dicts through utils/reference_import into our param trees
and writes an Orbax checkpoint + architecture.json, so reference training
runs can be evaluated or continued here (optimizer state is re-initialized —
torch Adam moments do not transfer across parameterizations).

    python tools/convert_reference_checkpoint.py \
        --checkpoint model_gaussian_100.pt --L 3 --K 4 --in_channels 1 \
        --img_size 32 --out outputs/imported_run --epoch 100
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--L", type=int, required=True)
    p.add_argument("--K", type=int, required=True)
    p.add_argument("--in_channels", type=int, default=3)
    p.add_argument("--img_size", type=int, default=32)
    p.add_argument("--coupling_width", type=int, default=512)
    p.add_argument("--n_bits", type=int, default=5)
    p.add_argument("--out", required=True, help="run dir to create")
    p.add_argument("--epoch", type=int, required=True)
    args = p.parse_args()

    import jax.numpy as jnp
    import torch

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.training.checkpoint import save_architecture, save_state
    from nfdpm_tpu.training.optim import make_optimizer
    from nfdpm_tpu.utils.reference_import import (
        import_gaussian_prior_state_dict,
        import_glow_state_dict,
    )

    ckpt = torch.load(args.checkpoint, map_location="cpu")
    flow_params = import_glow_state_dict(ckpt["flow"], args.L, args.K)
    prior_params = import_gaussian_prior_state_dict(ckpt["prior_dist"])

    cfg = glow_m.GlowConfig(
        in_channels=args.in_channels, levels=args.L, steps=args.K,
        coupling_width=args.coupling_width,
    )
    params = {"flow": flow_params, "prior": prior_params}
    # reference checkpoints come from a flow-only optimizer (trainer.py:109)
    tx = make_optimizer("adam", 1e-3, fixed_prior=True)
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.asarray(int(ckpt.get("current_iter", 0)), jnp.int32),
    }

    os.makedirs(args.out, exist_ok=True)
    save_architecture(args.out, {
        "L": cfg.levels, "K": cfg.steps, "in_channels": cfg.in_channels,
        "img_size": args.img_size, "coupling_width": cfg.coupling_width,
        "learn_prior": True, "n_bits": args.n_bits,
    })
    path = save_state(args.out, "gaussian", args.epoch, state)
    print(f"Imported reference checkpoint -> {path}")


if __name__ == "__main__":
    main()
