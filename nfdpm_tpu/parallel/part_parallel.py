"""Part-parallel stage-2 training: each diffusion part on its own devices.

The expert-parallel analogue for the diffusion prior. With a FROZEN flow
the per-part diffusion losses are mutually independent — the joint train
step (training/diffusion_trainer.py) only sums them — so the parts can
train on DISJOINT device groups with ZERO cross-group communication:

  * group g holds ONLY part g's UNet params + Adam moments (per-device
    optimizer memory shrinks to 1/num_parts of the joint step's, without
    any FSDP gather traffic);
  * each group runs the (frozen) flow forward on its OWN batch and steps
    its part alone — the gradient all-reduce spans the group's devices
    only, never the full mesh;
  * groups never synchronize: a small late-level part (latents shrink with
    each split, models/glow.latent_shapes_nhwc) finishes its step early
    and immediately starts the next batch instead of idling at a lockstep
    barrier under the biggest part's critical path;
  * each group compiles a program containing ONE UNet, not all of them.

This is MPMD expressed the JAX way: one jitted program per part, each
placed on its own `Mesh`, dispatched back-to-back from the host loop —
async dispatch overlaps their execution on the disjoint device sets. (A
single-program GSPMD formulation is impossible here: the parts have
heterogeneous latent shapes and therefore heterogeneous UNet param trees,
which cannot be stacked along a mesh axis.)

Capability note vs /root/reference: the reference trains all parts jointly
on one GPU (diffusion_prior/trainer.py:140-141 sums per-part losses);
part-parallelism is greenfield. Semantics: each sample is seen by exactly
one part per pass (round-robin batch assignment), so per epoch every part
sees ~1/num_parts of the data — same sample throughput per part at ~1/P
memory and 1/P collective span; scale `epochs` accordingly when comparing
loss curves against joint training.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.diffusion_prior import DiffusionPrior
from ..models.nf_backbone import NFBackbone
from . import mesh as mesh_m


def part_group_meshes(
    n_parts: int,
    devices: Optional[Sequence[jax.Device]] = None,
    n_model: int = 1,
) -> List[mesh_m.Mesh]:
    """One ("data", "model") mesh per part over disjoint contiguous device
    blocks (equal split; remainder devices idle). When there are fewer
    devices than parts, groups share devices round-robin — functionally
    identical, just without cross-group overlap (the single-chip case)."""
    devices = list(devices if devices is not None else jax.devices())
    per = len(devices) // n_parts
    if per >= 1:
        if per % n_model:
            raise ValueError(
                f"per-group device count ({per}) not divisible by "
                f"n_model ({n_model})")
        blocks = [devices[g * per:(g + 1) * per] for g in range(n_parts)]
    else:
        blocks = [[devices[g % len(devices)]] for g in range(n_parts)]
        n_model = 1
    return [
        mesh_m.make_mesh(n_data=len(b) // n_model, n_model=n_model, devices=b)
        for b in blocks
    ]


def make_part_optimizer(tcfg) -> optax.GradientTransformation:
    """Per-part optimizer: the diffusion group of the joint two-group
    optimizer (diffusion_trainer.make_two_group_optimizer), minus the flow
    branch — the flow never enters a part group's optimizer tree."""
    from ..training.optim import make_lr_schedule

    opt = optax.adam if tcfg.optimizer == "adam" else optax.adamw
    return opt(make_lr_schedule(
        tcfg.lr_diffusion, tcfg.lr_schedule, tcfg.lr_warmup_steps,
        tcfg.lr_decay_steps, tcfg.lr_end_factor))


def init_part_state(
    seed: int, dp: DiffusionPrior, part_idx: int, flow_params, tx,
    ema: bool = False,
) -> Dict[str, Any]:
    """State for ONE part group. `params["flow"]` rides along (frozen,
    replicated inside the group); only `params["part"]` is optimized.
    Part params are seeded identically to the joint trainer's
    (dp.init_params uses PRNGKey(seed + part_idx) per part)."""
    x = jnp.zeros((1,) + dp.formater.input_shapes[part_idx], jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    part = dp._unets[part_idx].init(
        jax.random.PRNGKey(seed + part_idx), x, t, None)["params"]
    state = {
        "params": {"flow": flow_params, "part": part},
        "opt_state": tx.init(part),
        "step": jnp.zeros((), jnp.int32),
    }
    if ema:
        state["ema"] = jax.tree.map(jnp.copy, part)
    return state


def make_part_train_step(
    backbone: NFBackbone, dp: DiffusionPrior, part_idx: int, tcfg, tx
):
    """Jitted step for ONE part: frozen-flow forward -> formater -> part
    loss -> part-only Adam update. Key threading mirrors the joint step
    exactly (fold_in(base, step) -> split -> fold_in(k_diff, part_idx)),
    so on identical batches the part's trajectory is bit-compatible with
    its slice of the joint trainer's (tests/test_part_parallel.py)."""
    if not backbone.frozen:
        raise ValueError(
            "part-parallel training requires a frozen flow: an unfrozen "
            "flow couples the parts through its gradient, which needs the "
            "joint train step (diffusion_trainer.make_train_step)")
    from ..ops import quantize as q

    def loss_fn(part_params, flow_params, batch, key):
        k_dq, k_diff = jax.random.split(key)
        x = q.preprocess(batch, tcfg.n_bits)
        x = q.dequantize(k_dq, x, tcfg.n_bits)
        latents, _ldj = backbone.transform(flow_params, x)
        z = dp.formater.process_latents(latents)[part_idx]
        return dp.parts[part_idx].loss(
            part_params, jax.random.fold_in(k_diff, part_idx), z)

    def train_step(state, batch, base_key):
        step_key = jax.random.fold_in(base_key, state["step"])
        loss, grads = jax.value_and_grad(loss_fn)(
            state["params"]["part"], state["params"]["flow"], batch, step_key)
        updates, opt_state = tx.update(
            grads, state["opt_state"], state["params"]["part"])
        part = jax.tree.map(lambda p, u: p + u,
                            state["params"]["part"], updates)
        out = {
            "params": {"flow": state["params"]["flow"], "part": part},
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        if tcfg.ema_decay is not None:
            if tcfg.ema_update_every > 1:
                out["ema"] = state["ema"]  # periodic update via
                # make_part_ema_update (same semantics as the joint trainer)
            else:
                n = state["step"].astype(jnp.float32)
                d = jnp.minimum(tcfg.ema_decay, (1.0 + n) / (10.0 + n))
                out["ema"] = jax.tree.map(
                    lambda e, p: e + (1.0 - d) * (p - e), state["ema"], part)
        return out, loss

    return jax.jit(train_step, donate_argnums=(0,))


def make_part_ema_update(tcfg):
    """Per-group periodic EMA update (`ema_update_every`>1), mirroring
    diffusion_trainer.make_ema_update: lerp the part shadow toward the live
    part params with per-update warmup decay (n = step // k)."""
    k = max(1, int(tcfg.ema_update_every))

    def apply(state):
        n = (state["step"] // k).astype(jnp.float32)
        d = jnp.minimum(tcfg.ema_decay, (1.0 + n) / (10.0 + n))
        ema = jax.tree.map(lambda e, p: e + (1.0 - d) * (p - e),
                           state["ema"], state["params"]["part"])
        return {**state, "ema": ema}

    return jax.jit(apply, donate_argnums=(0,))


@dataclasses.dataclass
class PartParallelPlan:
    """All per-part machinery: group meshes, states, steps — plus the
    merge back to the joint {"flow", "diffusion": {"parts": ...}} params
    layout every downstream consumer (make_sample_fn, VLB eval,
    checkpoint tools) expects."""

    backbone: NFBackbone
    dp: DiffusionPrior
    tcfg: Any
    meshes: List[mesh_m.Mesh]
    states: List[Dict[str, Any]]
    steps: List[Any]
    tx: optax.GradientTransformation
    ema_fn: Optional[Any] = None  # periodic per-group EMA update
    n_steps: Optional[List[int]] = None  # host-side per-group step counts

    @classmethod
    def build(cls, seed: int, backbone: NFBackbone, flow_params,
              dp: DiffusionPrior, tcfg,
              devices: Optional[Sequence[jax.Device]] = None,
              n_model: int = 1) -> "PartParallelPlan":
        meshes = part_group_meshes(dp.num_parts, devices=devices,
                                   n_model=n_model)
        tx = make_part_optimizer(tcfg)
        ema = tcfg.ema_decay is not None
        states, steps = [], []
        for g, mesh in enumerate(meshes):
            state = init_part_state(seed, dp, g, flow_params, tx, ema=ema)
            state = _place_group_state(mesh, tx, state, n_model)
            states.append(state)
            steps.append(make_part_train_step(backbone, dp, g, tcfg, tx))
        ema_fn = (make_part_ema_update(tcfg)
                  if ema and tcfg.ema_update_every > 1 else None)
        return cls(backbone=backbone, dp=dp, tcfg=tcfg, meshes=meshes,
                   states=states, steps=steps, tx=tx, ema_fn=ema_fn,
                   n_steps=[0] * len(meshes))

    def step_all(self, batches: Sequence[Any], base_key) -> List[jax.Array]:
        """Dispatch every group's step (async — disjoint device sets run
        concurrently); returns the per-part device-scalar losses."""
        losses = []
        for g, (step, batch) in enumerate(zip(self.steps, batches)):
            with self.meshes[g]:
                self.states[g], loss = step(self.states[g], batch, base_key)
                self._post_step(g)
            losses.append(loss)
        return losses

    def _post_step(self, g: int) -> None:
        """Host-side per-group bookkeeping: apply the periodic EMA update
        every `ema_update_every` group-steps (mirrors the joint trainer's
        `current_iter % k` cadence)."""
        self.n_steps[g] += 1
        if self.ema_fn is not None and (
                self.n_steps[g] % self.tcfg.ema_update_every == 0):
            self.states[g] = self.ema_fn(self.states[g])

    def shard_group_batch(self, g: int, batch) -> Any:
        return jax.device_put(batch, mesh_m.data_sharding(self.meshes[g]))

    def joint_params(self, prefer_ema: bool = True) -> Dict[str, Any]:
        """Merged {"flow", "diffusion": {"parts": tuple}} params tree on
        host memory — placeable under any mesh by the consumer."""
        host = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
        parts = []
        for s in self.states:
            src = s["ema"] if (prefer_ema and "ema" in s) else s["params"]["part"]
            parts.append(host(src))
        return {"flow": host(self.states[0]["params"]["flow"]),
                "diffusion": {"parts": tuple(parts)}}


def train_part_parallel(
    *,
    backbone: NFBackbone,
    flow_params,
    dp: DiffusionPrior,
    tcfg,
    loaders,
    run_dir: str,
    logger,
    seed: int = 42,
    resume_dir: Optional[str] = None,
    resume_epoch: Optional[int] = None,
    evaluate_fn=None,
    sample_mesh=None,
    devices: Optional[Sequence[jax.Device]] = None,
    n_model: int = 1,
) -> Dict[str, Any]:
    """Part-parallel counterpart of diffusion_trainer.train (same surface,
    same run-dir artifacts).

    Batches round-robin over the part groups: batch i goes to group
    i % num_parts, dispatched immediately — async dispatch keeps disjoint
    groups running concurrently with zero lockstep barriers. Per epoch
    every part therefore sees ~1/num_parts of the data (module docstring);
    scale `epochs` accordingly vs joint training.

    Checkpoints: every save writes TWO trees —
      * `model_diffusion_parts_*`: the exact per-group states (params +
        Adam moments + EMA), the resume source for this trainer;
      * `model_diffusion_*`: the merged joint-layout view
        {"params": {flow, diffusion}, "ema"?, "step"} that every
        downstream consumer (phase=eval, generation/interpolation/serve
        CLIs, VLB eval, runload) reads unchanged.
    """
    from ..training.checkpoint import restore_state, save_state, wait_for_saves
    from ..training.diffusion_trainer import make_sample_fn
    from ..training.tracking import Tracker
    from ..utils.profiling import StepTimer

    if not backbone.frozen:
        raise ValueError("part-parallel training requires a frozen flow")
    plan = PartParallelPlan.build(seed, backbone, flow_params, dp, tcfg,
                                  devices=devices, n_model=n_model)
    n_parts = dp.num_parts
    logger.info(
        f"Part-parallel: {n_parts} groups x "
        f"{plan.meshes[0].devices.size} devices (n_model={n_model})")
    tracker = Tracker(run_dir)
    loss_name = dp.parts[0].cfg.loss_type

    start_epoch, current_iter = 0, 0
    if resume_dir is not None and resume_epoch is not None:
        host = {"groups": [jax.tree.map(np.asarray, s) for s in plan.states]}
        restored = restore_state(resume_dir, "diffusion_parts", resume_epoch,
                                 host)
        plan.states = [
            _place_group_state(plan.meshes[g], plan.tx, s, n_model)
            for g, s in enumerate(restored["groups"])
        ]
        plan.n_steps = [int(s["step"]) for s in plan.states]
        start_epoch = resume_epoch
        current_iter = sum(plan.n_steps)
        logger.info(f"Resumed part states from {resume_dir} @ {resume_epoch}")

    def _joint_view():
        live = plan.joint_params(prefer_ema=False)
        view = {"params": live,
                "step": jnp.asarray(current_iter, jnp.int32)}
        if tcfg.ema_decay is not None:
            view["ema"] = {
                "diffusion": plan.joint_params(prefer_ema=True)["diffusion"]}
        return view

    def _save(epoch: int, block: bool = True):
        wait_for_saves()
        save_state(run_dir, "diffusion_parts", epoch,
                   {"groups": [jax.tree.map(np.asarray, s)
                               for s in plan.states]}, block=block)
        save_state(run_dir, "diffusion", epoch, _joint_view(), block=block)

    sample_fn = make_sample_fn(backbone, dp, tcfg, mesh=sample_mesh)
    key = jax.random.PRNGKey(seed)
    log_count = 0
    epoch = start_epoch
    try:
        for epoch in range(start_epoch + 1, start_epoch + tcfg.epochs + 1):
            t0 = time.time()
            timer = StepTimer()
            pending = [[] for _ in range(n_parts)]
            # pure-function-of-epoch data order (Loader.iter_epoch): a
            # resumed run replays the uninterrupted stream, keeping the
            # round-robin batch->group assignment aligned across resumes
            for i, (batch, _labels) in enumerate(
                    loaders.train.iter_epoch(epoch - 1)):
                g = i % n_parts
                sharded = plan.shard_group_batch(g, jnp.asarray(batch))
                with timer.step():
                    with plan.meshes[g]:
                        plan.states[g], loss = plan.steps[g](
                            plan.states[g], sharded, key)
                        plan._post_step(g)
                current_iter += 1
                pending[g].append(loss)

                if current_iter % tcfg.print_freq == 0:
                    per_part = [float(jnp.mean(jnp.stack(p))) if p else
                                float("nan") for p in pending]
                    pending = [[] for _ in range(n_parts)]
                    avg = float(np.nanmean(per_part))
                    tracker.track(avg, loss_name, step=current_iter,
                                  epoch=epoch, context={"subset": "train"})
                    logger.info(
                        f"epoch {epoch} iter {current_iter}: {loss_name} "
                        f"{avg:.4f} (per-part "
                        f"{['%.4f' % x for x in per_part]})")
                    log_count += 1
                    if log_count % tcfg.log_gen_images_per_iter == 0:
                        samples = sample_fn(
                            _joint_view_params(plan), key,
                            tcfg.n_samples_log, tcfg.temperature,
                            np.int32(-current_iter))
                        tracker.track_images(np.asarray(samples), "generated",
                                             step=current_iter, epoch=epoch)

            dt_s = time.time() - t0
            ts = timer.summary()
            logger.info(f"epoch {epoch} done in {dt_s:.1f}s "
                        f"(group-step p50 {ts.get('p50_ms', 0):.1f}ms "
                        f"p95 {ts.get('p95_ms', 0):.1f}ms)")

            if epoch % tcfg.save_checkpoint_freq == 0:
                merged = _joint_view_params(plan)
                if evaluate_fn is not None:
                    evaluate_fn(sample_fn, merged, epoch)
                _save(epoch, block=False)
                samples = sample_fn(merged, key, 64, tcfg.temperature,
                                    np.int32(epoch))
                tracker.track_images(np.asarray(samples), "checkpoint_samples",
                                     step=current_iter, epoch=epoch)
    except KeyboardInterrupt:
        _save(epoch)
        logger.warning(f"Interrupted — emergency checkpoint at epoch {epoch}")
        raise

    final_epoch = start_epoch + tcfg.epochs
    _save(final_epoch)

    results = {}
    if evaluate_fn is not None:
        results["metrics"] = evaluate_fn(sample_fn, _joint_view_params(plan),
                                         final_epoch, full=True)
    tracker.close()
    state = _joint_view()
    return {"state": state, "results": results, "sample_fn": sample_fn,
            "plan": plan}


def _joint_view_params(plan: "PartParallelPlan"):
    """Merged params for sampling/eval: EMA where tracked, live otherwise."""
    return plan.joint_params(prefer_ema=plan.tcfg.ema_decay is not None)


def _place_group_state(mesh, tx, state, n_model: int):
    """Device-place a group's state under its mesh: everything replicated
    inside the group except the batch (sharded at feed time); with a model
    axis, the part UNet gets the standard TP param shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if n_model > 1:
        from .sharding_rules import shard_opt_state, unet_param_specs

        part_specs = unet_param_specs(state["params"]["part"])
        params = {
            "flow": mesh_m.replicate(mesh, state["params"]["flow"]),
            "part": jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                state["params"]["part"], part_specs),
        }
        opt_state = shard_opt_state(mesh, tx, state["opt_state"],
                                    part_specs)
        out = {"params": params, "opt_state": opt_state,
               "step": jax.device_put(state["step"], NamedSharding(mesh, P()))}
        if "ema" in state:
            out["ema"] = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                state["ema"], part_specs)
        return out
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state)
