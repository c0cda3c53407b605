"""Orbax checkpointing of train-state PyTrees + architecture metadata.

Replaces the reference's torch.save checkpoints
(/root/reference/normalizing_flow/prior.py:102-115) and the separately
pickled `architecture.pkl` (run_baseline_experiment.py:64-68):

  * state tree: {"model": flow_params, "prior": prior_params,
    "opt_state": ..., "current_iter": ...} — directory name
    `model_{prefix}_{epoch:03d}` mirrors the reference filename scheme so
    run dirs look familiar.
  * `architecture.json` holds the hyperparams a later diffusion-prior run
    needs to rebuild the flow (L, K, in_channels, img_size, ...).
  * Unlike the reference, diffusion checkpoints register ALL sub-model
    params in the tree (fixing the lost-UNet-weights bug of
    diffusion_prior/model.py:100, SURVEY.md §2.10).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(run_dir: str) -> str:
    d = os.path.join(run_dir, "checkpoints")
    os.makedirs(d, exist_ok=True)
    return d


def save_architecture(run_dir: str, arch: Dict[str, Any],
                      filename: str = "architecture.json") -> None:
    with open(os.path.join(run_dir, filename), "w") as f:
        json.dump(arch, f, indent=2)


def load_architecture(run_dir: str,
                      filename: str = "architecture.json") -> Dict[str, Any]:
    with open(os.path.join(run_dir, filename)) as f:
        return json.load(f)


_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _get_async_ckptr() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def save_state(run_dir: str, prefix: str, epoch: int, state: Any,
               *, block: bool = True) -> str:
    """Write `checkpoints/model_{prefix}_{epoch:03d}` (atomic).

    `block=False` returns as soon as the state is staged to host memory and
    commits the write on a background thread (Orbax AsyncCheckpointer), so
    periodic epoch saves don't stall the train loop on disk I/O. Callers
    must `wait_for_saves()` before reading the checkpoint back or exiting
    the process; the trainers do this at end-of-training and before any
    same-run restore."""
    path = os.path.abspath(os.path.join(_ckpt_dir(run_dir), f"model_{prefix}_{epoch:03d}"))
    if block:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, state, force=True)
    else:
        _get_async_ckptr().save(
            path, args=ocp.args.StandardSave(state), force=True)
    return path


def wait_for_saves() -> None:
    """Block until every `save_state(..., block=False)` has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_mid_epoch_marker(run_dir: str, prefix: str, epoch: int,
                          batch_in_epoch: int) -> None:
    """Record that the `model_{prefix}_{epoch:03d}` checkpoint was written
    MID-epoch, after `batch_in_epoch` train batches of epoch `epoch` —
    the emergency-interrupt path writes this so a resume can continue from
    the exact batch (trainers' `resume_batch`) instead of silently skipping
    the rest of the interrupted epoch. Greenfield vs the reference, whose
    recovery is whole epochs only (normalizing_flow/trainer.py:111-122)."""
    with open(os.path.join(_ckpt_dir(run_dir), "mid_epoch.json"), "w") as f:
        json.dump({"prefix": prefix, "epoch": epoch,
                   "batch_in_epoch": batch_in_epoch}, f)


def load_mid_epoch_marker(run_dir: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(run_dir, "checkpoints", "mid_epoch.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def clear_mid_epoch_marker(run_dir: str) -> None:
    """Remove a stale marker (called on any completed-epoch save so the
    marker never outlives the interrupt it recorded)."""
    path = os.path.join(run_dir, "checkpoints", "mid_epoch.json")
    if os.path.exists(path):
        os.remove(path)


def _host_abstract(leaf: Any) -> Any:
    """Numpy-zeros template leaf: Orbax restores it as a HOST np.ndarray,
    never touching a device. Device placement is the caller's job (one
    batched transfer on first jit call) — restoring leaf-by-leaf onto a
    tunneled TPU costs a roundtrip per tensor (~155 leaves for the MNIST
    Glow state = minutes of wall-clock, measured; host restore is ~0.2 s)."""
    if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
        return np.zeros(leaf.shape, leaf.dtype)
    return leaf


def restore_state(run_dir: str, prefix: str, epoch: int, template: Any) -> Any:
    """Restore into the shape/dtype structure of `template`, as HOST numpy
    arrays (see `_host_abstract`; callers re-place under their mesh)."""
    wait_for_saves()  # the target may still be committing on the writer thread
    path = os.path.abspath(os.path.join(_ckpt_dir(run_dir), f"model_{prefix}_{epoch:03d}"))
    abstract = jax.tree.map(_host_abstract, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)


def checkpoint_keys(run_dir: str, prefix: str, epoch: int) -> list:
    """Top-level keys of a saved state tree (from Orbax metadata, no tensor
    reads) — used to reconcile EMA-carrying checkpoints against templates."""
    wait_for_saves()
    path = os.path.abspath(
        os.path.join(_ckpt_dir(run_dir), f"model_{prefix}_{epoch:03d}"))
    with ocp.StandardCheckpointer() as ckptr:
        return list(ckptr.metadata(path).item_metadata.tree.keys())


def restore_params(run_dir: str, prefix: str, epoch: int,
                   prefer_ema: bool = False) -> Any:
    """Restore ONLY the `params` subtree, templated from the checkpoint's
    own shape/dtype metadata.

    Unlike `restore_state` this needs no optimizer reconstruction (the
    opt_state structure varies with optimizer type / frozen-flow groups and
    is not recorded in architecture.json), and the host-numpy abstract
    leaves (`_host_abstract`) mean checkpoints saved under ANY mesh
    topology restore cleanly on the current host — with zero device
    traffic (a per-leaf restore onto a tunneled TPU measured minutes; see
    `_host_abstract`). This is the right call for inference-only consumers
    (generation/interpolation tools).

    `prefer_ema=True` substitutes the checkpoint's EMA weights (diffusion
    trainer's `ema_decay`) over the live params where present — the right
    weights for generation quality; a no-op for checkpoints without EMA."""
    wait_for_saves()
    path = os.path.abspath(
        os.path.join(_ckpt_dir(run_dir), f"model_{prefix}_{epoch:03d}"))
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata.tree
        abstract = jax.tree.map(_host_abstract, meta)
        tree = ckptr.restore(path, abstract)
        params = tree["params"]
        if prefer_ema and "ema" in tree:
            params = {**params, **tree["ema"]}
        return params


def latest_epoch(run_dir: str, prefix: str) -> Optional[int]:
    d = _ckpt_dir(run_dir)
    pat = re.compile(rf"model_{prefix}_(\d+)$")
    epochs = [int(m.group(1)) for f in os.listdir(d) if (m := pat.match(f))]
    return max(epochs) if epochs else None
