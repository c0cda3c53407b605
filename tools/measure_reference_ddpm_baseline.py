#!/usr/bin/env python
"""Measure the PyTorch reference's DDPM denoising throughput on CPU.

Anchor for the DDPM steps/sec metric named in BASELINE.json (the reference
publishes no numbers, SURVEY.md §6). Loads the reference's vendored
GaussianDiffusion + Unet from /root/reference/diffusion_prior (read-only) and
times `p_sample` ancestral denoise steps at the same workload shape
tools/bench_ddpm.py uses on TPU: UNet dim 64, mults (1, 2), latent 16x16x6
(the MNIST L3 first latent part), batch 64, cosine schedule
(/root/reference/diffusion_prior/gaussian_diffusion.py:706-733).

The full T=250 chain would take many minutes on this 1-core CPU, so the
steps/sec rate is measured over a window of p_sample calls (each call is one
full UNet forward + posterior update — the per-step cost is
time-step-independent).

Measured in this environment (torch CPU, 1 thread, fp32):
    0.295 denoise steps/sec (batch 64)  -> full T=250 chain ~849 s
"""

import importlib.util
import json
import os
import sys
import time
import types


def _load_reference_diffusion(ref_root="/root/reference"):
    pkg = types.ModuleType("dp_ref")
    pkg.__path__ = [os.path.join(ref_root, "diffusion_prior")]
    sys.modules["dp_ref"] = pkg
    path = os.path.join(ref_root, "diffusion_prior", "gaussian_diffusion.py")
    spec = importlib.util.spec_from_file_location("dp_ref.gaussian_diffusion", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["dp_ref.gaussian_diffusion"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    gd = _load_reference_diffusion()

    torch.manual_seed(0)
    h = w = 16
    c = 6
    batch = 64
    T = 250

    unet = gd.Unet(dim=64, dim_mults=(1, 2), channels=c, resnet_block_groups=8)
    diffusion = gd.GaussianDiffusion(
        unet, image_size=h, timesteps=T, loss_type="l2",
        beta_schedule="cosine", auto_normalize=False,
    )
    diffusion.eval()

    x = torch.randn(batch, c, h, w)
    with torch.no_grad():
        diffusion.p_sample(x, T - 1)  # warmup
        n_steps = 8
        t0 = time.perf_counter()
        img = x
        for i in range(n_steps):
            img, _ = diffusion.p_sample(img, T - 1 - i)
        dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    print(json.dumps({
        "metric": "reference_cpu_ddpm_unet64_denoise_steps_per_sec_batch64_16x16x6",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "threads": torch.get_num_threads(),
        "full_chain_T250_seconds_extrapolated": round(T / steps_per_sec, 1),
    }))


if __name__ == "__main__":
    main()
