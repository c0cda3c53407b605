"""Normalizing-flow (Glow + Gaussian prior) training loop, TPU-first.

Capability-parity re-design of /root/reference/normalizing_flow/trainer.py:

  * ONE jitted, mesh-sharded `train_step` carries the whole hot path —
    5-bit preprocess, uniform dequantization, flow forward, prior logp, BPD
    loss, grads, value-clip(1)+global-norm-clip(1) (trainer.py:165-166),
    adam update — donated state, so each step is a single XLA executable
    with no host round-trips besides the metric scalar.
  * Data parallelism: batches are sharded P("data") over the mesh;
    gradients reduce automatically via jit-under-mesh (the reference is
    single-device, SURVEY.md §2.9b).
  * Data-dependent actnorm init is the explicit `glow.ddinit` pass on one
    preprocessed+dequantized batch (trainer.py:138 semantics).
  * Checkpoints: Orbax state trees every `save_checkpoint_freq` epochs plus
    a final save (trainer.py:198-237); resume restores flow/prior/opt_state
    and `current_iter` (trainer.py:111-122).
  * Eval: `calculate_bpd` over a loader with single-sample dequantization
    (trainer.py:21-55); FID/KID via metrics.evaluate_model per checkpoint
    epoch and at the end (trainer.py:202-263).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import DatasetLoaders, Loader
from ..models import glow as glow_m
from ..models import prior as prior_m
from ..ops import quantize as q
from ..parallel import mesh as mesh_m
from .checkpoint import (restore_state, save_architecture, save_state,
                         wait_for_saves)
from .optim import make_optimizer
from .tracking import Tracker


@dataclasses.dataclass(frozen=True)
class NFTrainConfig:
    epochs: int = 10
    lr: float = 1e-3
    optimizer: str = "adam"
    # LR schedule (capability extension; reference is flat-LR):
    # "constant" (+ optional warmup) or "cosine" (training/optim.py)
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 0
    lr_decay_steps: Optional[int] = None  # cosine: total steps incl. warmup
    lr_end_factor: float = 0.0            # cosine: end LR = lr * factor
    n_bits: int = 5
    temperature: float = 1.0
    print_freq: int = 50
    save_checkpoint_freq: int = 5
    log_gen_images_per_iter: int = 2
    n_samples_log: int = 8
    log_param_distribution: bool = False  # per-epoch param histograms
    compat_three_channel_bpd: bool = True  # reference n_pixel bug, SURVEY §2
    compat_fixed_prior: bool = True  # reference optimizes/clips flow params
    # only (trainer.py:109,165-166): the Gaussian prior stays standard normal.
    # Set False to also train the prior (capability extension).
    profile_epoch: Optional[int] = None  # capture this epoch's first
    # `profile_steps` steps as a profiler trace under <run_dir>/tb —
    # viewable in TensorBoard's Profile tab (utils/profiling.EpochProfiler)
    profile_steps: int = 50
    watchdog_timeout_s: Optional[float] = None  # hung-step detection: when
    # no train step completes for this many seconds, dump all-thread stacks
    # to <run_dir>/watchdog_stall.txt and raise KeyboardInterrupt into the
    # emergency-checkpoint path (utils/watchdog.py; 10x compile allowance
    # until the first metric fetch; size the timeout > print_freq x step
    # time — the fetch is the loop's only sync point). None = off.
    grad_accum: int = 1  # microbatches per optimizer step (TPU memory knob):
    # the batch is split into `grad_accum` slices scanned inside the SAME
    # jitted step, gradients averaged, ONE optimizer update. Activation
    # memory scales with the microbatch, so large-image configs (CelebA-128)
    # can trade remat's recompute for microbatching (BENCH.md).


def make_train_step(cfg: glow_m.GlowConfig, tcfg: NFTrainConfig, tx,
                    inject_noise: bool = False, spatial_sharding=None,
                    pp=None):
    """Build the jitted train step: (state, batch, base_key) -> (state, metrics).

    The per-step dequantization key is folded from (base_key, state.step)
    INSIDE the jit — over a tunneled TPU every host-side key op is a slow
    RPC, so the hot loop performs zero device ops outside the step itself.

    `inject_noise=True` swaps the in-jit PRNG draw for a caller-supplied
    U(0,1) noise tensor (third arg becomes `noise` instead of `base_key`) —
    used by the trained-trajectory parity harness to feed bit-identical
    dequantization noise to this step and the PyTorch reference
    (/root/reference/normalizing_flow/trainer.py:155).

    `spatial_sharding` (a NamedSharding, see mesh.spatial_sharding) constrains
    the dequantized NHWC batch to P("data", "model") so the flow forward AND
    backward run spatially partitioned — GSPMD inserts halo exchanges for the
    3x3 coupling convs and per-device activation memory scales ~1/n_model.

    `pp` = (mesh, microbatches) routes the flow forward through the
    pipeline-parallel GPipe schedule (parallel/pipeline.py): the K-step
    stacks shard over the "model" axis and microbatches flow through the
    stages via ppermute. Mutually exclusive with spatial_sharding (both
    claim the "model" axis)."""
    n_bins = q.n_bins_of(tcfg.n_bits)
    if pp is not None and spatial_sharding is not None:
        raise ValueError("pipeline and spatial partitioning both use the "
                         "\"model\" axis — enable at most one")

    def loss_fn(params, batch, key_or_noise):
        x = q.preprocess(batch, tcfg.n_bits)
        if inject_noise:
            x = x + key_or_noise / n_bins
        else:
            x = q.dequantize(key_or_noise, x, tcfg.n_bits)
        if spatial_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, spatial_sharding)
        if pp is not None:
            from ..parallel import pipeline as pl

            latents, ldj, logp = pl.pp_forward(params["flow"], cfg, x,
                                               pp[0], pp[1])
        else:
            latents, ldj, logp = glow_m.forward(params["flow"], cfg, x)
        logp = logp + prior_m.gaussian_prior_logp(params["prior"], latents[-1])
        ll = ldj + logp
        n_pixel = prior_m.n_pixels(
            batch.shape[1], batch.shape[-1], tcfg.compat_three_channel_bpd
        )
        bpd = prior_m.bits_per_dim(ll, n_bins, n_pixel)
        return bpd, ll

    accum = max(1, int(tcfg.grad_accum))
    assert accum == 1 or not inject_noise, (
        "grad_accum>1 uses per-microbatch in-jit RNG; injected-noise parity "
        "runs must keep grad_accum=1"
    )

    def accum_grads(params, batch, step_key):
        """Scan `accum` microbatches; per-microbatch dequant key =
        fold_in(step_key, i). Returns averaged (bpd, ll_mean, grads)."""
        b = batch.shape[0]
        micro = batch.reshape(accum, b // accum, *batch.shape[1:])

        def body(carry, inp):
            g_acc, bpd_acc, ll_acc = carry
            i, mb = inp
            (bpd, ll), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb, jax.random.fold_in(step_key, i)
            )
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            return (g_acc, bpd_acc + bpd, ll_acc + jnp.mean(ll)), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (g_sum, bpd_sum, ll_sum), _ = jax.lax.scan(
            body, (zeros, jnp.zeros(()), jnp.zeros(())),
            (jnp.arange(accum), micro),
        )
        grads = jax.tree.map(lambda g: g / accum, g_sum)
        return bpd_sum / accum, ll_sum / accum, grads

    def train_step(state, batch, base_key):
        step_key = base_key if inject_noise else jax.random.fold_in(
            base_key, state["step"])
        if accum == 1:
            (bpd, ll), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"], batch, step_key
            )
            ll_mean = jnp.mean(ll)
        else:
            bpd, ll_mean, grads = accum_grads(state["params"], batch, step_key)
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = jax.tree.map(lambda p, u: p + u, state["params"], updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, {"bpd": bpd, "ll_mean": ll_mean}

    return jax.jit(train_step, donate_argnums=(0,))


def shard_nf_state(mesh, tx, state, *, fsdp: bool = False,
                   pipeline: bool = False):
    """Re-place a full train state under the mesh's parallelism plan:
    tensor-parallel coupling-width shardings over "model" (when the mesh has
    a model axis) plus, with `fsdp=True`, ZeRO-style partitioning of params
    AND Adam moments over "data" (parallel/sharding_rules.py). Works on
    freshly-initialized and checkpoint-restored states alike — optimizer
    moments are re-placed, never re-initialized.

    `pipeline=True` lays the flow out for pipeline parallelism instead of
    TP: every K-step stack's leading (step) axis shards over "model"
    (parallel/pipeline.py), so per-stage flow params + Adam moments hold
    K/S steps."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding_rules import (
        generic_param_specs, glow_param_specs, shard_opt_state)

    n_data = mesh.shape["data"] if fsdp else 1
    if pipeline:
        if fsdp:
            raise ValueError("pipeline + fsdp both repartition the flow "
                             "params — enable at most one")
        from ..parallel.pipeline import glow_pp_param_specs

        flow_specs = glow_pp_param_specs(state["params"]["flow"])
    else:
        flow_specs = glow_param_specs(state["params"]["flow"],
                                      fsdp_data=n_data)
    specs = {
        "flow": flow_specs,
        "prior": generic_param_specs(state["params"]["prior"],
                                     fsdp_data=n_data),
    }
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state["params"], specs)
    opt_state = shard_opt_state(mesh, tx, state["opt_state"], specs)
    return {"params": params, "opt_state": opt_state,
            "step": jax.device_put(state["step"], NamedSharding(mesh, P()))}


def make_eval_step(cfg: glow_m.GlowConfig, tcfg: NFTrainConfig):
    """Jitted per-batch eval: returns per-example BPD [B] (single-sample
    dequantization, matching reference calculate_bpd). The log-likelihood
    is exposed as `eval_step.ll` for multi-draw IWAE combination."""
    n_bins = q.n_bins_of(tcfg.n_bits)

    @jax.jit
    def ll_step(params, batch, base_key, salt):
        key = jax.random.fold_in(base_key, salt)
        x = q.preprocess(batch, tcfg.n_bits)
        x = q.dequantize(key, x, tcfg.n_bits)
        latents, ldj, logp = glow_m.forward(params["flow"], cfg, x)
        logp = logp + prior_m.gaussian_prior_logp(params["prior"], latents[-1])
        return ldj + logp

    def eval_step(params, batch, base_key, salt):
        ll = ll_step(params, batch, base_key, salt)
        n_pixel = prior_m.n_pixels(
            batch.shape[1], batch.shape[-1], tcfg.compat_three_channel_bpd
        )
        return (np.log(n_bins) * n_pixel - ll) * (np.log2(np.e) / n_pixel)

    eval_step.ll = ll_step
    eval_step.n_bins = n_bins
    eval_step.compat = tcfg.compat_three_channel_bpd
    return eval_step


def make_sample_fn(cfg: glow_m.GlowConfig, tcfg: NFTrainConfig, img_size: int,
                   mesh=None):
    """Jitted sampler: prior sample -> Glow inverse (missing parts drawn from
    split priors) -> 5-bit postprocess to uint8 (glow.py:230-246 semantics).

    With `mesh`, the prior draw is batch-sharded (P("data")) so the whole
    inverse chain runs data-parallel over the mesh — multi-chip FID-scale
    generation; the reference samples on one GPU only."""
    shapes = glow_m.latent_shapes_nhwc(cfg, img_size)
    batch_s = mesh_m.data_sharding(mesh) if mesh is not None else None
    # NOTE: constraint, not out_shardings — with_sharding_constraint handles
    # sample counts that don't divide the data axis (last shard padded),
    # while out_shardings would reject them (small eval grids, n=15 etc.)

    @functools.partial(jax.jit, static_argnums=(2,))
    def sample(params, key, n: int, temperature: float, salt=0):
        k1, k2 = jax.random.split(jax.random.fold_in(key, salt))
        h, w, c = shapes[-1]
        z_last = prior_m.gaussian_prior_sample(
            params["prior"], k1, (n, h, w, c), temperature
        )
        if batch_s is not None:
            z_last = jax.lax.with_sharding_constraint(z_last, batch_s)
        x = glow_m.inverse(params["flow"], cfg, [z_last], key=k2, temperature=temperature)
        return q.postprocess(x, tcfg.n_bits)

    return sample


def init_train_state(
    key, cfg: glow_m.GlowConfig, tcfg: NFTrainConfig, tx
) -> Dict[str, Any]:
    """`key` may be a jax PRNG key, an int seed (preferred on TPU — the
    model build then never touches the device), or a numpy Generator."""
    flow_params = glow_m.init_glow(key, cfg)
    prior_params = prior_m.init_gaussian_prior(
        (2 ** (cfg.levels + 1)) * cfg.in_channels, cfg.learn_prior
    )
    params = {"flow": flow_params, "prior": prior_params}
    return {"params": params, "opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}


def calculate_bpd(eval_step, params, loader: Loader, key: jax.Array,
                  n_dequant_samples: int = 1, iwae: bool = False) -> float:
    """Mean BPD over a loader (reference calculate_bpd, trainer.py:21-55),
    with padded static-shape batches (pad examples masked out). The per-batch
    key salt is a traced arg — no host-side key ops in the loop.

    `n_dequant_samples > 1` tightens the dequantization bound with multiple
    uniform draws: `iwae=False` averages the per-draw BPD bounds (mean of
    bounds); `iwae=True` uses the importance-weighted estimator
    log (1/K) sum_k p(x + u_k) = logsumexp(ll_k) - log K, the tighter bound
    (the reference's docstring promises importance sampling but draws once)."""
    total, count = 0.0, 0
    for i, (imgs, _labels, n_valid) in enumerate(loader.padded_batches()):
        batch = jnp.asarray(imgs)
        n_pixel = prior_m.n_pixels(batch.shape[1], batch.shape[-1], eval_step.compat)
        bpd_of_ll = lambda ll: (np.log(eval_step.n_bins) * n_pixel - ll) * (
            np.log2(np.e) / n_pixel
        )
        if iwae and n_dequant_samples > 1:
            lls = jnp.stack([
                eval_step.ll(params, batch, key, np.int32(i * 131 + r))
                for r in range(n_dequant_samples)
            ])
            ll = jax.scipy.special.logsumexp(lls, axis=0) - np.log(n_dequant_samples)
            total += float(jnp.sum(bpd_of_ll(ll)[:n_valid]))
        else:
            acc = 0.0
            for r in range(n_dequant_samples):
                bpds = eval_step(params, batch, key, np.int32(i * 131 + r))
                acc = acc + jnp.sum(bpds[:n_valid])
            total += float(acc) / n_dequant_samples
        count += n_valid
    return total / max(count, 1)


def train(
    *,
    cfg: glow_m.GlowConfig,
    tcfg: NFTrainConfig,
    loaders: DatasetLoaders,
    run_dir: str,
    logger,
    seed: int = 42,
    img_size: int = 32,
    resume_dir: Optional[str] = None,
    resume_epoch: Optional[int] = None,
    resume_batch: Optional[int] = None,
    evaluate_fn=None,
    mesh=None,
    fsdp: bool = False,
    spatial: bool = False,
    pipeline_microbatches: int = 0,
) -> Dict[str, Any]:
    """Full training driver. `evaluate_fn(sample_fn, params, epoch)` is an
    optional hook for FID/KID evaluation (metrics engine).

    Resume: `resume_epoch=E` (with `resume_batch=None`) means E epochs are
    complete — training continues at epoch E+1 and, because each epoch's
    data order is a pure function of (seed, epoch) (`Loader.iter_epoch`),
    replays exactly the stream the uninterrupted run would have seen.
    `resume_batch=k` means the checkpoint was written MID-epoch E after k
    batches (the interrupt path records this in `checkpoints/mid_epoch.json`):
    epoch E is re-entered at batch k and counts as the first of
    `tcfg.epochs`. Both paths are bit-exact continuations.

    `fsdp=True`
    partitions params + Adam moments over the mesh "data" axis (ZeRO).
    `spatial=True` additionally shards image HEIGHT over the "model" axis in
    the train step (spatial partitioning — activation-memory lever for very
    large images; requires img_size/2^L divisible by the model-axis size).
    `pipeline_microbatches > 0` instead pipelines the K-step stacks over the
    "model" axis with that many microbatches per data shard
    (parallel/pipeline.py; requires K divisible by the model-axis size)."""
    key = jax.random.PRNGKey(seed)
    from .optim import make_lr_schedule

    tx = make_optimizer(
        tcfg.optimizer, tcfg.lr, fixed_prior=tcfg.compat_fixed_prior,
        lr_schedule=make_lr_schedule(
            tcfg.lr, tcfg.lr_schedule, tcfg.lr_warmup_steps,
            tcfg.lr_decay_steps, tcfg.lr_end_factor))
    mesh = mesh or mesh_m.make_mesh()
    tracker = Tracker(run_dir)

    with mesh:
        state = init_train_state(seed, cfg, tcfg, tx)
        start_epoch, current_iter = 0, 0

        if resume_dir is not None and resume_epoch is not None:
            state = restore_state(resume_dir, "gaussian", resume_epoch, state)
            # normalize to host arrays: Orbax re-creates leaves with the
            # SAVED shardings (file metadata), which may disagree with this
            # run's mesh/template placement — host leaves re-place cleanly
            # under any topology (cross-topology restore, tests/test_parallel)
            state = jax.tree.map(np.asarray, state)
            # resume_batch=k: the checkpoint is mid-epoch `resume_epoch` —
            # re-enter that epoch at batch k (see docstring)
            start_epoch = (resume_epoch - 1 if resume_batch is not None
                           else resume_epoch)
            current_iter = int(state["step"])
            logger.info(
                f"Resumed from {resume_dir} @ epoch {resume_epoch}"
                + (f" batch {resume_batch}" if resume_batch is not None else ""))
        else:
            # data-dependent actnorm init on one preprocessed batch
            init_imgs, _ = next(iter(loaders.train))

            @jax.jit
            def _ddinit(p, b, k):
                x0 = q.preprocess(b, tcfg.n_bits)
                x0 = q.dequantize(jax.random.fold_in(k, 999), x0, tcfg.n_bits)
                return glow_m.ddinit(p, cfg, x0)

            flow_init = _ddinit(state["params"]["flow"], jnp.asarray(init_imgs), key)
            params = {"flow": flow_init, "prior": state["params"]["prior"]}
            state = {"params": params, "opt_state": tx.init(params), "step": state["step"]}
            logger.info("Data-dependent actnorm initialization done")

        n_model = mesh.shape.get("model", 1)
        pp = None
        if pipeline_microbatches > 0:
            if n_model > 1:
                from ..parallel.pipeline import check_pipeline_config

                local_batch = (loaders.train.batch_size
                               // mesh.shape.get("data", 1))
                check_pipeline_config(cfg, n_model, pipeline_microbatches,
                                      local_batch)
                pp = (mesh, pipeline_microbatches)
                logger.info(f"Pipeline parallelism: K={cfg.steps} over "
                            f"{n_model} stages, "
                            f"{pipeline_microbatches} microbatches")
            else:
                logger.warning(
                    "parallel.pipeline has no effect without a model axis "
                    "— set parallel.n_model>1")
        if n_model > 1 or fsdp:
            state = shard_nf_state(mesh, tx, state, fsdp=fsdp,
                                   pipeline=pp is not None)
            logger.info(
                f"Param shardings applied: model axis={n_model}"
                f"{', FSDP over data axis' if fsdp else ''}"
                f"{' (pipeline layout)' if pp is not None else ''}")

        save_architecture(
            run_dir,
            {
                "L": cfg.levels,
                "K": cfg.steps,
                "in_channels": cfg.in_channels,
                "img_size": img_size,
                "coupling_width": cfg.coupling_width,
                "learn_prior": cfg.learn_prior,
                "n_bits": tcfg.n_bits,
                "fixed_prior": tcfg.compat_fixed_prior,
                "temperature": tcfg.temperature,
                "optimizer": tcfg.optimizer,
                "invconv_param": cfg.invconv_param,
            },
        )

        spatial_s = None
        if spatial:
            if n_model > 1:
                spatial_s = mesh_m.checked_spatial_sharding(
                    mesh, img_size, cfg.levels)
                logger.info(f"Spatial partitioning: H over model={n_model}")
            else:
                logger.warning(
                    "parallel.spatial=true has no effect without a model "
                    "axis — set parallel.n_model>1")
        train_step = make_train_step(cfg, tcfg, tx, spatial_sharding=spatial_s,
                                     pp=pp)
        eval_step = make_eval_step(cfg, tcfg)
        sample_fn = make_sample_fn(cfg, tcfg, img_size, mesh=mesh)

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
                # data order is a pure function of (loader seed, epoch) so
                # resumed runs replay the uninterrupted stream exactly
                skip = (resume_batch or 0) if (
                    resume_batch is not None and epoch == resume_epoch) else 0
                iters_this_epoch = skip
                wd.start()  # monitors the step loop only — per-checkpoint
                # eval/save below run un-monitored (they legitimately take
                # longer than a step timeout)
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
                    pending.append(metrics["bpd"])

                    if current_iter % tcfg.print_freq == 0:
                        avg = float(jnp.mean(jnp.stack(pending)))
                        wd.beat_sync()  # fetch completed => steps truly ran
                        pending = []
                        tracker.track(avg, "bpd", step=current_iter, epoch=epoch,
                                      context={"subset": "train"})
                        logger.info(f"epoch {epoch} iter {current_iter}: bpd {avg:.4f}")
                        log_count += 1
                        if (log_count % tcfg.log_gen_images_per_iter == 0) and epoch % 5 == 0:
                            samples = sample_fn(state["params"], key,
                                                tcfg.n_samples_log, tcfg.temperature,
                                                np.int32(-current_iter))
                            tracker.track_images(np.asarray(samples), "generated",
                                                 step=current_iter, epoch=epoch)

                wd.stop()
                profiler.end_epoch()
                dt = time.time() - t0
                ts = timer.summary()
                logger.info(f"epoch {epoch} done in {dt:.1f}s "
                            f"({len(loaders.train)/max(dt,1e-9):.2f} it/s, "
                            f"step p50 {ts.get('p50_ms', 0):.1f}ms "
                            f"p95 {ts.get('p95_ms', 0):.1f}ms)")
                if tcfg.log_param_distribution:
                    tracker.track_param_distributions(state["params"],
                                                      step=current_iter, epoch=epoch)

                if epoch % tcfg.save_checkpoint_freq == 0:
                    if evaluate_fn is not None:
                        evaluate_fn(sample_fn, state["params"], epoch)
                    save_state(run_dir, "gaussian", epoch, state,
                               block=False)  # commits on a writer thread
                    samples = sample_fn(state["params"], key, 64, tcfg.temperature,
                                        np.int32(epoch))
                    tracker.track_images(np.asarray(samples), "checkpoint_samples",
                                         step=current_iter, epoch=epoch)

        except KeyboardInterrupt:
            from .checkpoint import save_mid_epoch_marker

            wd.stop()
            wait_for_saves()  # an async save may target this same epoch path
            save_state(run_dir, "gaussian", epoch, state)
            save_mid_epoch_marker(run_dir, "gaussian", epoch, iters_this_epoch)
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
        save_state(run_dir, "gaussian", final_epoch, state)
        from .checkpoint import clear_mid_epoch_marker

        clear_mid_epoch_marker(run_dir)  # the run completed normally

        results = {}
        for fold, (split, loader) in enumerate(
            (("test", loaders.test), ("train", loaders.eval))
        ):
            bpd = calculate_bpd(eval_step, state["params"], loader,
                                jax.random.fold_in(key, 10_000 + fold))  # one-off fold
            results[f"bpd_{split}"] = bpd
            tracker.track(bpd, "bpd", epoch=final_epoch, context={"subset": split, "final": True})
            logger.info(f"final {split} bpd: {bpd:.4f}")
        if evaluate_fn is not None:
            results["metrics"] = evaluate_fn(sample_fn, state["params"], final_epoch,
                                             full=True)

        tracker.close()
        return {"state": state, "results": results, "sample_fn": sample_fn}
