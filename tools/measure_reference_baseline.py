#!/usr/bin/env python
"""Measure the PyTorch reference's Glow fwd+inverse throughput on CPU.

Produces the comparison anchor recorded in BASELINE.md / bench.py (the
reference publishes no numbers, SURVEY.md §6). Loads the reference modules
from /root/reference directly (read-only), stubbing the aim/torchvision
imports its utils module pulls in but the benchmark never exercises.

Measured in this environment (1-core CPU, torch 2.x, fp32):
    Glow L3 K4, batch 64, 32x32, eval-mode transform+invert
    -> 19.0 images/sec (3363 ms/iter)
"""

import importlib.util
import os
import sys
import time
import types


def _stub_external_modules():
    aim = types.ModuleType("aim")
    aim.Image = object
    aim.Run = object
    sys.modules["aim"] = aim
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: None
    tvu.save_image = lambda *a, **k: None
    tvt = types.ModuleType("torchvision.transforms")
    for attr in ("Pad", "Resize", "RandomHorizontalFlip", "ToTensor", "Compose"):
        setattr(tvt, attr, lambda *a, **k: None)
    tv.utils, tv.transforms = tvu, tvt
    sys.modules.update({"torchvision": tv, "torchvision.utils": tvu,
                        "torchvision.transforms": tvt})


def _load_reference_glow(ref_root="/root/reference"):
    sys.path.insert(0, ref_root)
    pkg = types.ModuleType("nf_ref")
    pkg.__path__ = [os.path.join(ref_root, "normalizing_flow")]
    sys.modules["nf_ref"] = pkg

    def load(name, fname):
        path = os.path.join(ref_root, "normalizing_flow", fname)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("nf_ref.base", "base.py")
    load("nf_ref.utils", "utils.py")
    load("nf_ref.prior", "prior.py")
    load("nf_ref.transforms", "transforms.py")
    return load("nf_ref.glow", "glow.py")


def main():
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    _stub_external_modules()
    glow = _load_reference_glow()

    torch.manual_seed(0)
    model = glow.Glow(in_channel=3, L=3, K=4)
    model.eval()
    batch = 64
    x = torch.rand(batch, 3, 32, 32) - 0.5

    with torch.no_grad():
        model.transform(x, torch.zeros(batch), torch.zeros(batch))  # actnorm init

        def fwd_inv():
            latents, _, _ = model.transform(x, torch.zeros(batch), torch.zeros(batch))
            return model.invert(latents)

        fwd_inv()  # warmup
        n_iter = 10
        t0 = time.perf_counter()
        for _ in range(n_iter):
            fwd_inv()
        dt = time.perf_counter() - t0

    print(f"threads={torch.get_num_threads()}")
    print(f"reference CPU Glow L3K4 fwd+inverse: {n_iter * batch / dt:.2f} images/sec "
          f"(batch {batch}, {dt / n_iter * 1000:.1f} ms/iter)")


if __name__ == "__main__":
    main()
