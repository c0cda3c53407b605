"""Optimizer construction: adam/adamw with the reference's double gradient
clipping, plus a mask freezing the flow's non-trainable PLU constants.

Reference behaviors reproduced:
  * `init_optimizer` adam/adamw selection
    (/root/reference/normalizing_flow/utils.py:120-137).
  * NF trainer clips grads BOTH by value 1.0 and by global norm 1.0
    (/root/reference/normalizing_flow/trainer.py:165-166); the diffusion
    trainer uses no clipping (/root/reference/diffusion_prior/trainer.py:148-150).
  * Two-LR param groups for unfrozen-flow diffusion training
    (/root/reference/diffusion_prior/trainer.py:104-108) via
    `optax.multi_transform` in training/diffusion_trainer.py.

Note torch's `clip_grad_norm_(1)` clips by the global norm over all params —
`optax.clip_by_global_norm` is the exact equivalent.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

FROZEN_LEAF_NAMES = ("p_mat", "sign")


def _is_frozen_path(path) -> bool:
    for p in path:
        key = getattr(p, "key", None) or getattr(p, "name", None)
        if key in FROZEN_LEAF_NAMES:
            return True
    return False


def trainable_mask(params: Any) -> Any:
    """PyTree of bools: False for PLU constants (p_mat / sign)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [not _is_frozen_path(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_lr_schedule(
    lr: float,
    schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int | None = None,
    end_lr_factor: float = 0.0,
):
    """Learning-rate schedule factory (capability extension: the reference
    trains at a fixed LR throughout, normalizing_flow/utils.py:120-137).

      * "constant": fixed `lr`, with an optional linear warmup from 0 over
        `warmup_steps` (then held).
      * "cosine": linear warmup to `lr` over `warmup_steps`, cosine decay to
        `lr * end_lr_factor` at `decay_steps` (total steps incl. warmup).

    Returns a float (plain constant) or an optax schedule; both feed
    optax.adam/adamw directly. Schedules index by the optimizer's own step
    count inside opt_state, so checkpoint resume continues the schedule
    exactly."""
    if schedule == "constant":
        if warmup_steps <= 0:
            return lr
        return optax.linear_schedule(0.0, lr, warmup_steps)
    if schedule == "cosine":
        if decay_steps is None:
            raise ValueError("cosine schedule needs decay_steps "
                             "(total steps including warmup)")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
            decay_steps=decay_steps, end_value=lr * end_lr_factor)
    raise ValueError(f"Unknown lr schedule: {schedule!r} "
                     "(one of 'constant', 'cosine')")


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-3,
    clip_value: float | None = 1.0,
    clip_norm: float | None = 1.0,
    fixed_prior: bool = False,
    lr_schedule=None,
) -> optax.GradientTransformation:
    """`fixed_prior=True` reproduces the reference exactly: its optimizer and
    BOTH grad clips cover `flow.parameters()` only
    (/root/reference/normalizing_flow/trainer.py:109,165-166), so the final
    Gaussian prior's (bias, logs) never update and never enter the global-norm
    clip. Implemented as a multi_transform over the {"flow", "prior"} top-level
    keys so clip_by_global_norm sees flow grads only. `fixed_prior=False`
    trains the prior too (a deliberate capability extension).

    `lr_schedule`: an optax schedule (or the output of make_lr_schedule) to
    use instead of the flat `lr`."""
    rate = lr_schedule if lr_schedule is not None else lr
    if name == "adam":
        opt = optax.adam(rate)
    elif name == "adamw":
        opt = optax.adamw(rate)
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    chain = []
    if clip_value is not None:
        chain.append(optax.clip(clip_value))
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(opt)
    tx = optax.chain(*chain)

    if fixed_prior:
        # Label by tree path, not by dict iteration: optax.tree_map_params
        # (used by parallel.sharding_rules.shard_opt_state for FSDP) probes
        # the optimizer with a _ParamsPlaceholder pytree that is not a dict.
        def label_fn(params):
            def label(path, _):
                head = (getattr(path[0], "key", None)
                        or getattr(path[0], "name", ""))
                return "prior" if head == "prior" else "flow"

            return jax.tree_util.tree_map_with_path(label, params)

        tx = optax.multi_transform({"flow": tx, "prior": optax.set_to_zero()},
                                   label_fn)
    return optax.masked(tx, trainable_mask)
