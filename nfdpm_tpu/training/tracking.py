"""Experiment tracking: scalars, images, texts.

The reference tracks to Aim (/root/reference/normalizing_flow/trainer.py:127-130,
SURVEY.md §5.5). The tracker writes an append-only JSONL metric stream plus
PNG image grids — the same information channels (scalars with subset
contexts, generated-image grids, final-stats text) in a dependency-free
form — and mirrors everything to a live **TensorBoard** event stream
(`<run_dir>/tb/`, via tensorboardX when importable; disable with
`NFDPM_NO_TENSORBOARD=1`). `tensorboard --logdir <outputs>` is the
dashboard-parity answer to the reference's `aim up`
(/root/reference/README.md:347-352): scalar curves with subset contexts,
sample-grid images, and parameter histograms, live during training. If
`aim` itself IS importable it is used as an additional sink, preserving
`aim up` compatibility.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class Tracker:
    def __init__(self, run_dir: str, experiment: str = "") -> None:
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._f = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._aim = None
        try:  # optional Aim sink
            import aim

            self._aim = aim.Run(repo=os.path.join(run_dir, "..", "..", "aim"))
            self._aim["experiment"] = experiment
        except Exception:
            self._aim = None
        self._tb = None
        if not os.environ.get("NFDPM_NO_TENSORBOARD"):
            try:  # TensorBoard sink (tensorboardX keeps the import light —
                # no TF runtime); events live under <run_dir>/tb/
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir=os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None

    @staticmethod
    def _tb_tag(name: str, context: Optional[Dict[str, Any]]) -> str:
        """"bpd" + {"subset": "train"} -> "bpd/train" (the Aim-context
        convention flattened into TensorBoard's tag hierarchy)."""
        subset = (context or {}).get("subset")
        return f"{name}/{subset}" if subset else name

    def track(
        self,
        value: Any,
        name: str,
        step: Optional[int] = None,
        epoch: Optional[int] = None,
        context: Optional[Dict[str, Any]] = None,
    ) -> None:
        if isinstance(value, (int, float, np.floating, np.integer)) or hasattr(value, "item"):
            value = float(value)
        rec = {
            "t": time.time(),
            "name": name,
            "value": value,
            "step": step,
            "epoch": epoch,
            "context": context or {},
        }
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None and isinstance(value, float):
            try:
                self._tb.add_scalar(self._tb_tag(name, context), value,
                                    global_step=step if step is not None else epoch)
            except Exception:
                pass
        if self._aim is not None:
            try:
                self._aim.track(value=value, name=name, step=step, epoch=epoch, context=context)
            except Exception:
                pass

    def track_param_distributions(
        self,
        params,
        step: Optional[int] = None,
        epoch: Optional[int] = None,
        bins: int = 32,
    ) -> None:
        """Per-leaf histograms of the model parameters (the reference's
        log_param_distribution Aim histograms, normalizing_flow/trainer.py
        logging section), stored as {edges, counts} JSONL records."""
        import jax

        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            arr = np.asarray(leaf).ravel()
            if arr.size == 0 or not np.issubdtype(arr.dtype, np.floating):
                continue
            counts, edges = np.histogram(arr, bins=bins)
            name = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                            for k in path)
            self.track({"edges": edges.tolist(), "counts": counts.tolist()},
                       name=f"param_dist/{name}", step=step, epoch=epoch)
            if self._tb is not None:
                try:
                    self._tb.add_histogram(f"param_dist/{name}", arr,
                                           global_step=step)
                except Exception:
                    pass

    def track_images(
        self,
        images: np.ndarray,
        name: str = "generated",
        step: Optional[int] = None,
        epoch: Optional[int] = None,
        context: Optional[Dict[str, Any]] = None,
    ) -> None:
        """Save an 8-wide grid PNG (reference's aim image grid + PDF grid,
        normalizing_flow/utils.py:213-241)."""
        path = os.path.join(self.run_dir, "results", f"{name}_e{epoch or 0}_s{step or 0}.png")
        grid = save_image_grid(images, path)
        self.track(path, name=f"{name}_path", step=step, epoch=epoch, context=context)
        if self._tb is not None:
            try:  # HWC uint8 grid -> TensorBoard (dataformats avoids a copy)
                self._tb.add_image(name, grid, global_step=step,
                                   dataformats="HWC")
            except Exception:
                pass

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            try:
                self._tb.close()
            except Exception:
                pass


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8, pad: int = 1) -> np.ndarray:
    """images: uint8 [N, H, W, C] -> single grid image on disk; returns the
    grid array (HWC uint8) for in-memory sinks."""
    from PIL import Image

    images = np.asarray(images)
    if images.dtype != np.uint8:
        # value_range (-0.5, 0.5) normalization like vutils.make_grid
        images = np.clip((images + 0.5) * 255.0, 0, 255).astype(np.uint8)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0, x0 = pad + r * (h + pad), pad + col * (w + pad)
        grid[y0: y0 + h, x0: x0 + w] = images[i]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(grid.squeeze(-1) if c == 1 else grid).save(path)
    return grid
