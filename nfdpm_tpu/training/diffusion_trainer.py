"""Diffusion-prior training loop: NFBackbone + DiffusionPrior, TPU-first.

Capability-parity re-design of /root/reference/diffusion_prior/trainer.py:

  * ONE jitted train step: preprocess + dequantize -> flow transform (no
    split-prior logp, trainer.py:136-139) -> formater -> per-part diffusion
    losses summed (trainer.py:140-141) -> (+ 0.5 * flow-BPD term when the
    flow is unfrozen, trainer.py:143-146) -> optimizer. NO grad clipping,
    matching the reference's diffusion trainer.
  * Two-LR param groups (diffusion lr vs flow lr, trainer.py:104-108) via
    optax.multi_transform over the {"flow", "prior"} tree labels; when the
    flow is frozen its params are stop-gradiented AND set_to_zero-masked.
  * Checkpoints register ALL sub-model params (flow + every part's UNet) in
    one state tree (fixing the reference's lost-UNet-weights bug,
    model.py:100) — and unlike the reference (trainer.py:124) resume IS
    supported.
  * Sampling path: per-part diffusion sample -> formater.postprocess ->
    flow invert -> uint8 (trainer.py:181-182, 210-211).
  * Final eval: VLB-based BPD (fixing the reference's dead+buggy
    `calculate_bpd_with_diff_prior` accumulator, trainer.py:45) + FID/KID.
  * Optional EMA (`ema_decay`): an exponential moving average of the
    trainable params updated inside the jitted step; all sampling and eval
    reads go through `ema_eval_params`. Standard DDPM practice the
    reference dropped when vendoring lucidrains' trainer.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import DatasetLoaders, Loader
from ..models.diffusion_prior import DiffusionPrior
from ..models.nf_backbone import NFBackbone
from ..ops import quantize as q
from ..parallel import mesh as mesh_m
from .checkpoint import restore_state, save_state, wait_for_saves
from .optim import trainable_mask
from .tracking import Tracker


@dataclasses.dataclass(frozen=True)
class DiffusionTrainConfig:
    epochs: int = 10
    lr_diffusion: float = 1e-3
    lr_nf: Optional[float] = None      # used when the flow is unfrozen
    optimizer: str = "adam"
    # LR schedule applied to BOTH param groups at their own peak LRs
    # (capability extension; reference is flat-LR): "constant" (+ optional
    # warmup) or "cosine" (training/optim.py)
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 0
    lr_decay_steps: Optional[int] = None  # cosine: total steps incl. warmup
    lr_end_factor: float = 0.0            # cosine: end LR = lr * factor
    n_bits: int = 5
    temperature: float = 1.0
    print_freq: int = 50
    save_checkpoint_freq: int = 5
    log_gen_images_per_iter: int = 20
    n_samples_log: int = 8
    log_param_distribution: bool = False  # per-epoch param histograms
    nf_bpd_weight: float = 0.5         # trainer.py:145 weighting factor
    compat_three_channel_bpd: bool = True  # reference hardcodes n_pixel =
    # img_size^2 * 3.0 even for 1-channel MNIST (diffusion_prior/trainer.py:134
    # analogue); set False for the channel-correct count.
    ema_decay: Optional[float] = None  # e.g. 0.9995: keep an exponential
    # moving average of the TRAINABLE params (diffusion parts; + flow when
    # unfrozen) and sample/evaluate from it. Standard DDPM practice for FID
    # quality (lucidrains' upstream trainer has EMA; the reference dropped
    # it when vendoring — greenfield capability). Decay warms up as
    # min(ema_decay, (1+n)/(10+n)) so early steps track the live params
    # without a bias-correction buffer. The update is one fused lerp inside
    # the jitted train step.
    profile_epoch: Optional[int] = None  # capture this epoch's first
    # `profile_steps` steps as a profiler trace under <run_dir>/tb
    # (TensorBoard Profile tab; utils/profiling.EpochProfiler)
    profile_steps: int = 50
    watchdog_timeout_s: Optional[float] = None  # hung-step detection: when
    # no train step completes for this many seconds, dump all-thread stacks
    # and raise KeyboardInterrupt into the emergency-checkpoint path
    # (utils/watchdog.py; 10x compile allowance until the first metric
    # fetch; size the timeout > print_freq x step time). None = off.
    ema_update_every: int = 10  # apply the EMA lerp every k-th step as a
    # separate jitted program instead of inside the hot step (1 = in-step).
    # The in-step update measured +39% step time on the tunneled v5e (the
    # shadow doubles the step's output buffers; tools/bench_ema_overhead.py)
    # — lucidrains' upstream EMA defaults to update_every=10 for the same
    # reason. Decay warms up per update: min(d, (1+n)/(10+n)), n = step//k.


def make_two_group_optimizer(
    tcfg: DiffusionTrainConfig, frozen: bool
) -> optax.GradientTransformation:
    """{'diffusion': lr_diffusion, 'flow': lr_nf or frozen-zero} groups
    (reference param groups, trainer.py:104-108). An LR schedule, when
    configured, applies to both groups at their own peak LRs."""
    from .optim import make_lr_schedule

    opt_fn = optax.adam if tcfg.optimizer == "adam" else optax.adamw

    def opt(lr):
        return opt_fn(make_lr_schedule(
            lr, tcfg.lr_schedule, tcfg.lr_warmup_steps,
            tcfg.lr_decay_steps, tcfg.lr_end_factor))

    def label_fn(params):
        # Label by tree path (not by subscripting `params`): this keeps the
        # optimizer compatible with optax.tree_map_params, whose
        # _ParamsPlaceholder probe is a pytree but not a dict.
        def label(path, _):
            head = getattr(path[0], "key", None) or getattr(path[0], "name", "")
            return "flow" if head == "flow" else "diffusion"

        return jax.tree_util.tree_map_with_path(label, params)

    flow_tx = (
        optax.set_to_zero() if frozen or tcfg.lr_nf is None else opt(tcfg.lr_nf)
    )
    tx = optax.multi_transform(
        {"diffusion": opt(tcfg.lr_diffusion), "flow": flow_tx}, label_fn
    )
    # freeze PLU constants inside the flow subtree as well
    return optax.masked(tx, trainable_mask)


def make_train_step(
    backbone: NFBackbone, dp: DiffusionPrior, tcfg: DiffusionTrainConfig, tx,
    spatial_sharding=None,
):
    """`spatial_sharding` (mesh.spatial_sharding) constrains the dequantized
    NHWC batch P("data", "model") so the flow transform runs spatially
    partitioned — same activation-memory lever as the NF trainer's
    (nf_trainer.make_train_step). The latents are re-constrained to
    P("data") before the diffusion losses: the UNet's 7x7 init conv on
    small latents is exactly the regime where XLA's spatial conv
    partitioning miscompiles (mesh.spatial_sharding docstring)."""
    from ..models import prior as prior_m

    n_pixel = prior_m.n_pixels(
        backbone.img_size, backbone.cfg.in_channels, tcfg.compat_three_channel_bpd
    )
    latent_sharding = (mesh_m.data_sharding(spatial_sharding.mesh)
                       if spatial_sharding is not None else None)

    def loss_fn(params, batch, key):
        k_dq, k_diff = jax.random.split(key)
        x = q.preprocess(batch, tcfg.n_bits)
        x = q.dequantize(k_dq, x, tcfg.n_bits)
        if spatial_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, spatial_sharding)
        latents, ldj = backbone.transform(params["flow"], x)
        if latent_sharding is not None:
            latents = [jax.lax.with_sharding_constraint(z, latent_sharding)
                       for z in latents]
        losses = dp.losses(params["diffusion"], k_diff, latents)
        loss = sum(losses)
        if not backbone.frozen:
            nf_bpd = tcfg.nf_bpd_weight * jnp.mean(-ldj / (math.log(2.0) * n_pixel))
            loss = loss + nf_bpd
        return loss, jnp.stack(losses)

    def train_step(state, batch, base_key):
        step_key = jax.random.fold_in(base_key, state["step"])
        (loss, part_losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, step_key
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = jax.tree.map(lambda p, u: p + u, state["params"], updates)
        out = {"params": params, "opt_state": opt_state, "step": state["step"] + 1}
        if tcfg.ema_decay is not None:
            if tcfg.ema_update_every > 1:
                # shadow untouched in the hot step; the trainer applies
                # make_ema_update every `ema_update_every` steps (the
                # update's dispatch+traffic cost measured +39%/step on the
                # tunneled chip — tools/bench_ema_overhead.py)
                out["ema"] = state["ema"]
            else:
                # warmup-scheduled decay; see DiffusionTrainConfig.ema_decay
                n = state["step"].astype(jnp.float32)
                d = jnp.minimum(tcfg.ema_decay, (1.0 + n) / (10.0 + n))
                live = _ema_subtree(params, backbone.frozen)
                out["ema"] = jax.tree.map(
                    lambda e, p: e + (1.0 - d) * (p - e), state["ema"], live)
        return out, {"loss": loss, "part_losses": part_losses}

    return jax.jit(train_step, donate_argnums=(0,))


def make_ema_update(backbone: NFBackbone, tcfg: DiffusionTrainConfig):
    """Periodic EMA update as its own jitted program (`ema_update_every`>1):
    state -> state with the shadow lerped toward the live params. Decay
    warms up per UPDATE (n = step // k), lucidrains' update_every
    semantics — the k-step stride is one EMA application, not k."""
    k = max(1, int(tcfg.ema_update_every))

    def apply(state):
        n = (state["step"] // k).astype(jnp.float32)
        d = jnp.minimum(tcfg.ema_decay, (1.0 + n) / (10.0 + n))
        live = _ema_subtree(state["params"], backbone.frozen)
        ema = jax.tree.map(lambda e, p: e + (1.0 - d) * (p - e),
                           state["ema"], live)
        return {**state, "ema": ema}

    return jax.jit(apply, donate_argnums=(0,))


def _ema_subtree(params, frozen: bool):
    """The subtree the EMA shadows: the diffusion parts, plus the flow when
    it co-trains. A frozen flow never changes, so shadowing it would only
    duplicate its HBM footprint."""
    if frozen:
        return {"diffusion": params["diffusion"]}
    return {"flow": params["flow"], "diffusion": params["diffusion"]}


def ema_eval_params(state):
    """Full params tree with EMA weights substituted where tracked; the
    identity when the state carries no EMA. Sampling/eval should always go
    through this."""
    ema = state.get("ema")
    if ema is None:
        return state["params"]
    return {"flow": ema.get("flow", state["params"]["flow"]),
            "diffusion": ema["diffusion"]}


def make_sample_fn(backbone: NFBackbone, dp: DiffusionPrior,
                   tcfg: DiffusionTrainConfig, mesh=None):
    """diffusion latents -> flow inverse -> uint8 (trainer.py:181-182).

    With `mesh`, the diffusion-to-flow handoff is batch-sharded so the flow
    inverse runs data-parallel; for the denoise chains themselves to shard,
    construct the DiffusionPrior with `batch_sharding` (the entry point
    does both from the same mesh)."""
    import functools

    batch_s = mesh_m.data_sharding(mesh) if mesh is not None else None
    # constraint, not out_shardings: tolerates n not divisible by the data
    # axis (cf. nf_trainer.make_sample_fn)

    @functools.partial(jax.jit, static_argnums=(2,))
    def sample(params, key, n: int, temperature: float, salt=0):
        key = jax.random.fold_in(key, salt)
        k_diff, k_flow = jax.random.split(key)
        latents = dp.sample_latents(params["diffusion"], k_diff, n)
        if batch_s is not None:
            latents = [jax.lax.with_sharding_constraint(z, batch_s)
                       for z in latents]
        x = backbone.invert(params["flow"], latents, k_flow, temperature)
        return q.postprocess(x, tcfg.n_bits)

    return sample


def init_train_state(
    seed: int, backbone: NFBackbone, flow_params, dp: DiffusionPrior, tx,
    ema: bool = False,
) -> Dict[str, Any]:
    params = {"flow": flow_params, "diffusion": dp.init_params(seed)}
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32)}
    if ema:
        state["ema"] = jax.tree.map(jnp.copy,
                                    _ema_subtree(params, backbone.frozen))
    return state


def shard_diffusion_state(mesh, tx, state, *, fsdp: bool = False):
    """Re-place the diffusion-prior train state under the mesh's plan:
    UNet tensor-parallel shardings over "model", Glow TP rules for the
    (possibly frozen) flow, and with `fsdp=True` ZeRO partitioning of every
    large param + Adam moment over "data" (parallel/sharding_rules.py).
    The frozen flow is FSDP-sharded too — frozen weights still occupy HBM."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding_rules import (
        glow_param_specs, shard_opt_state, unet_param_specs)

    n_data = mesh.shape["data"] if fsdp else 1
    specs = {
        "flow": glow_param_specs(state["params"]["flow"], fsdp_data=n_data),
        "diffusion": {"parts": tuple(
            unet_param_specs(p, fsdp_data=n_data)
            for p in state["params"]["diffusion"]["parts"])},
    }
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state["params"], specs)
    opt_state = shard_opt_state(mesh, tx, state["opt_state"], specs)
    out = {"params": params, "opt_state": opt_state,
           "step": jax.device_put(state["step"], NamedSharding(mesh, P()))}
    if "ema" in state:  # shadow shards exactly like the params it mirrors
        ema_specs = {k: specs[k] for k in state["ema"]}
        out["ema"] = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            state["ema"], ema_specs)
    return out


def calculate_bpd_with_diff_prior(
    backbone: NFBackbone, dp: DiffusionPrior, tcfg: DiffusionTrainConfig,
    params, loader: Loader, key, max_batches: Optional[int] = None,
    with_stats: bool = False,
):
    """Variational-bound BPD of flow + diffusion prior.

    BPD = [log(n_bins)*n_pixel - (ldj - sum_part nll_nats)] * log2(e)/n_pixel
    where the diffusion NLL replaces the Gaussian prior logp. Correctly
    ACCUMULATES across batches (the reference version overwrote its
    accumulator and was dead code, diffusion_prior/trainer.py:45,242-248).

    max_batches=None scores the FULL loader (the apples-to-apples setting
    vs nf_trainer's full-test-set Gaussian BPD). with_stats=True returns
    (mean, n_images, stderr_of_mean) so sub-sampled budgets report their
    uncertainty."""
    from ..models import prior as prior_m

    n_bins = q.n_bins_of(tcfg.n_bits)
    n_pixel = prior_m.n_pixels(
        backbone.img_size, backbone.cfg.in_channels, tcfg.compat_three_channel_bpd
    )
    bpd_const = np.log2(np.e) / n_pixel

    @jax.jit
    def batch_nll(params, batch, base_key, salt):
        key = jax.random.fold_in(base_key, salt)
        k_dq, k_nll = jax.random.split(key)
        x = q.preprocess(batch, tcfg.n_bits)
        x = q.dequantize(k_dq, x, tcfg.n_bits)
        latents, ldj = backbone.transform(params["flow"], x)
        # total nats over the FORMATER-PROCESSED parts: with CatFormater the
        # single concatenated part carries every latent dim, so weighting
        # per-dim NLLs by the raw flow latents' shapes would drop dims
        prior_nll = dp.neg_log_likelihood_nats(params["diffusion"], k_nll, latents)
        ll = ldj - prior_nll
        return (np.log(n_bins) * n_pixel - ll) * bpd_const

    total, total_sq, count = 0.0, 0.0, 0
    for i, (imgs, _labels, n_valid) in enumerate(loader.padded_batches()):
        if max_batches is not None and i >= max_batches:
            break
        bpds = batch_nll(params, jnp.asarray(imgs), key, np.int32(i))
        valid = np.asarray(bpds[:n_valid], dtype=np.float64)
        total += float(valid.sum())
        total_sq += float((valid * valid).sum())
        count += n_valid
    mean = total / max(count, 1)
    if not with_stats:
        return mean
    var = max(total_sq / max(count, 1) - mean * mean, 0.0)
    stderr = math.sqrt(var / max(count, 1))
    return mean, count, stderr


def fit_latent_stats(
    backbone: NFBackbone, flow_params, formater, tcfg: DiffusionTrainConfig,
    loader: Loader, *, n_batches: int = 8, seed: int = 0,
):
    """Fit channelwise latent-standardization stats from the data stream.

    Pushes `n_batches` batches through the (pre/de-quantized, exactly as in
    training) flow forward and accumulates per-channel moments of the
    formater's PROCESSED parts (models/formaters.fit_formater_stats) — the
    real implementation of the per-part scaling the reference stubbed out
    as identity (latent_formaters.py:68-86). Deterministic given (seed,
    loader): resume/eval can refit identically, but callers should persist
    the stats in diffusion_architecture.json and reload instead."""
    from ..models.formaters import fit_formater_stats

    fwd = jax.jit(lambda fp, x, k: backbone.transform(
        fp, q.dequantize(k, q.preprocess(x, tcfg.n_bits), tcfg.n_bits))[0])
    key = jax.random.PRNGKey(seed)

    def gen():
        for i, (imgs, _labels, n_valid) in enumerate(loader.padded_batches()):
            if i >= n_batches:
                break
            latents = fwd(flow_params, jnp.asarray(imgs),
                          jax.random.fold_in(key, i))
            yield [np.asarray(z)[:n_valid] for z in latents]

    return fit_formater_stats(formater, gen())


def train(
    *,
    backbone: NFBackbone,
    flow_params,
    dp: DiffusionPrior,
    tcfg: DiffusionTrainConfig,
    loaders: DatasetLoaders,
    run_dir: str,
    logger,
    seed: int = 42,
    resume_dir: Optional[str] = None,
    resume_epoch: Optional[int] = None,
    resume_batch: Optional[int] = None,
    evaluate_fn=None,
    mesh=None,
    fsdp: bool = False,
    spatial: bool = False,
) -> Dict[str, Any]:
    """Diffusion-prior training driver. Resume semantics match
    nf_trainer.train: `resume_batch=None` continues after the completed
    epoch `resume_epoch`; `resume_batch=k` re-enters the interrupted epoch
    `resume_epoch` at batch k (recorded in `checkpoints/mid_epoch.json` by
    the interrupt path). Either way the data stream replays bit-exactly —
    `Loader.iter_epoch` makes each epoch's order a pure function of
    (seed, epoch)."""
    key = jax.random.PRNGKey(seed)
    tx = make_two_group_optimizer(tcfg, backbone.frozen)
    mesh = mesh or mesh_m.make_mesh()
    tracker = Tracker(run_dir)
    loss_name = dp.parts[0].cfg.loss_type + ("" if backbone.frozen else "_plus_bpd")

    with mesh:
        state = init_train_state(seed, backbone, flow_params, dp, tx,
                                 ema=tcfg.ema_decay is not None)
        start_epoch, current_iter = 0, 0
        if resume_dir is not None and resume_epoch is not None:
            from .checkpoint import checkpoint_keys

            has_ema = "ema" in checkpoint_keys(resume_dir, "diffusion",
                                               resume_epoch)
            want_ema = "ema" in state
            if has_ema and not want_ema:  # restore through an ema-ful
                # template, then drop the shadow (ema_decay turned off)
                template = dict(
                    state, ema=_ema_subtree(state["params"], backbone.frozen))
                state = restore_state(resume_dir, "diffusion", resume_epoch,
                                      template)
                state.pop("ema")
            elif want_ema and not has_ema:  # ema newly enabled: seed the
                # shadow from the restored live params
                template = {k: v for k, v in state.items() if k != "ema"}
                state = restore_state(resume_dir, "diffusion", resume_epoch,
                                      template)
                state["ema"] = jax.tree.map(
                    jnp.copy, _ema_subtree(state["params"], backbone.frozen))
            else:
                state = restore_state(resume_dir, "diffusion", resume_epoch,
                                      state)
            # normalize to host arrays: Orbax re-creates leaves with the
            # SAVED shardings, which may disagree with this run's mesh —
            # host leaves re-place cleanly under any topology
            state = jax.tree.map(np.asarray, state)
            start_epoch = (resume_epoch - 1 if resume_batch is not None
                           else resume_epoch)
            current_iter = int(state["step"])
            logger.info(
                f"Resumed from {resume_dir} @ epoch {resume_epoch}"
                + (f" batch {resume_batch}" if resume_batch is not None else ""))

        n_model = mesh.shape.get("model", 1)
        if n_model > 1 or fsdp:
            state = shard_diffusion_state(mesh, tx, state, fsdp=fsdp)
            logger.info(
                f"Param shardings applied: model axis={n_model}"
                f"{', FSDP over data axis' if fsdp else ''}")

        spatial_s = None
        if spatial:
            if n_model > 1:
                spatial_s = mesh_m.checked_spatial_sharding(
                    mesh, backbone.img_size, backbone.cfg.levels)
                logger.info(f"Spatial partitioning: H over model={n_model}")
            else:
                logger.warning(
                    "parallel.spatial=true has no effect without a model "
                    "axis — set parallel.n_model>1")
        train_step = make_train_step(backbone, dp, tcfg, tx,
                                     spatial_sharding=spatial_s)
        ema_fn = (make_ema_update(backbone, tcfg)
                  if tcfg.ema_decay is not None and tcfg.ema_update_every > 1
                  else None)
        sample_fn = make_sample_fn(backbone, dp, tcfg, mesh=mesh)

        import os as _os

        from ..data.pipeline import prefetch_to_device
        from ..utils.profiling import EpochProfiler, StepTimer
        from ..utils.watchdog import StepWatchdog

        data_sharding = mesh_m.data_sharding(mesh)
        wd = StepWatchdog(tcfg.watchdog_timeout_s, run_dir=run_dir,
                          logger=logger)
        profiler = EpochProfiler(_os.path.join(run_dir, "tb"),
                                 tcfg.profile_epoch, tcfg.profile_steps)
        log_count = 0
        epoch = start_epoch
        iters_this_epoch = 0
        try:
            for epoch in range(start_epoch + 1, start_epoch + tcfg.epochs + 1):
                t0 = time.time()
                timer = StepTimer()
                pending = []  # device scalars; fetched only at print_freq
                skip = (resume_batch or 0) if (
                    resume_batch is not None and epoch == resume_epoch) else 0
                iters_this_epoch = skip
                wd.start()  # monitors the step loop; per-checkpoint eval and
                # saves run un-monitored (nf_trainer rationale)
                profiler.start_epoch(epoch)
                for batch, _labels in prefetch_to_device(
                        loaders.train.iter_epoch(epoch - 1, start_batch=skip),
                        sharding=data_sharding):
                    with timer.step():
                        state, metrics = train_step(state, batch, key)
                    wd.beat()
                    profiler.step()
                    current_iter += 1
                    iters_this_epoch += 1
                    if ema_fn is not None and (
                            current_iter % tcfg.ema_update_every == 0):
                        state = ema_fn(state)
                    pending.append(metrics["loss"])

                    if current_iter % tcfg.print_freq == 0:
                        avg = float(jnp.mean(jnp.stack(pending)))
                        wd.beat_sync()  # fetch completed => steps truly ran
                        pending = []
                        tracker.track(avg, loss_name, step=current_iter, epoch=epoch,
                                      context={"subset": "train"})
                        logger.info(f"epoch {epoch} iter {current_iter}: {loss_name} {avg:.4f}")
                        log_count += 1
                        if log_count % tcfg.log_gen_images_per_iter == 0:
                            samples = sample_fn(ema_eval_params(state), key,
                                                tcfg.n_samples_log,
                                                tcfg.temperature, np.int32(-current_iter))
                            tracker.track_images(np.asarray(samples), "generated",
                                                 step=current_iter, epoch=epoch)

                wd.stop()
                profiler.end_epoch()
                dt = time.time() - t0
                ts = timer.summary()
                logger.info(f"epoch {epoch} done in {dt:.1f}s "
                            f"(step p50 {ts.get('p50_ms', 0):.1f}ms "
                            f"p95 {ts.get('p95_ms', 0):.1f}ms)")
                if tcfg.log_param_distribution:
                    tracker.track_param_distributions(state["params"],
                                                      step=current_iter, epoch=epoch)

                if epoch % tcfg.save_checkpoint_freq == 0:
                    if evaluate_fn is not None:
                        evaluate_fn(sample_fn, ema_eval_params(state), epoch)
                    save_state(run_dir, "diffusion", epoch, state,
                               block=False)  # commits on a writer thread
                    samples = sample_fn(ema_eval_params(state), key, 64,
                                        tcfg.temperature, np.int32(epoch))
                    tracker.track_images(np.asarray(samples), "checkpoint_samples",
                                         step=current_iter, epoch=epoch)
        except KeyboardInterrupt:
            from .checkpoint import save_mid_epoch_marker

            wd.stop()
            wait_for_saves()  # an async save may target this same epoch path
            save_state(run_dir, "diffusion", epoch, state)
            save_mid_epoch_marker(run_dir, "diffusion", epoch, iters_this_epoch)
            logger.warning(
                ("Watchdog stall — " if wd.fired else "Interrupted — ")
                + f"emergency checkpoint at epoch {epoch} batch "
                f"{iters_this_epoch}; resume bit-exactly with "
                f"load.load_epoch={epoch} load.load_batch={iters_this_epoch}")
            raise

        final_epoch = start_epoch + tcfg.epochs
        # wait first: the last loop epoch may have queued an async save to
        # this same path (final_epoch % save_checkpoint_freq == 0)
        wait_for_saves()
        save_state(run_dir, "diffusion", final_epoch, state)
        from .checkpoint import clear_mid_epoch_marker

        clear_mid_epoch_marker(run_dir)  # the run completed normally

        results = {}
        if evaluate_fn is not None:
            results["metrics"] = evaluate_fn(sample_fn, ema_eval_params(state),
                                             final_epoch, full=True)
        tracker.close()
        return {"state": state, "results": results, "sample_fn": sample_fn}
