#!/usr/bin/env python
"""Diffusion-prior experiment entry point (NFBackbone + DiffusionPrior).

TPU-native counterpart of /root/reference/run_diffusion_prior_experiment.py:
    python run_diffusion_prior_experiment.py \
        model.normalizing_flow.init_nf.pretrain.dir=glow_MNIST_2026-.. \
        model.normalizing_flow.init_nf.pretrain.epoch=10 data.name=MNIST ...

The flow is loaded from a baseline run's architecture.json + Orbax
checkpoint (pretrain mode, reference :45-58) or built from scratch
(:60-65); the diffusion prior gets one UNet+GaussianDiffusion per latent
part defined by the chosen formater (:73-96).
"""

import os
import sys
import time

import jax
import numpy as np


def main(argv):
    cfg_path = os.path.join(os.path.dirname(__file__), "configs", "nf_diffusion.yaml")
    overrides = [a for a in argv if "=" in a]

    from nfdpm_tpu.data.pipeline import read_dataset
    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.models.diffusion_prior import DiffusionPrior
    from nfdpm_tpu.models.formaters import get_formater
    from nfdpm_tpu.models.nf_backbone import NFBackbone, load_pretrained_flow
    from nfdpm_tpu.parallel import mesh as mesh_m
    from nfdpm_tpu.training import diffusion_trainer as dt
    from nfdpm_tpu.utils.config import load_config, make_run_dir, parse_metric
    from nfdpm_tpu.utils.env import (
        enable_compilation_cache,
        log_environment,
        parse_train_eval_mode,
        set_seeds,
        setup_logger,
    )

    enable_compilation_cache()
    cfg = load_config(cfg_path, overrides)
    # 'default' (bf16 MXU passes) | 'high' | 'highest' (fp32 parity runs)
    prec = cfg.select("model.training.matmul_precision", "default")
    if prec != "default":
        jax.config.update("jax_default_matmul_precision", prec)
    run_dir = make_run_dir(cfg)
    logger = setup_logger("base", os.path.join(run_dir, "train.log"))
    logger.info("Configuration:\n" + cfg.to_yaml())
    log_environment(logger)
    set_seeds(int(cfg.seed))

    nf_cfg = cfg.model.normalizing_flow
    img_size = int(cfg.data.img_size)
    in_channels = 1 if cfg.data.name == "MNIST" else 3
    frozen = bool(nf_cfg.freeze)

    use_pallas = bool(nf_cfg.get("use_pallas", False))
    # model.normalizing_flow.coupling_dtype=bfloat16: run the flow's
    # coupling CNNs in bf16 regardless of what the stage-1 run used — a
    # measured 1.32x on the stage-2 train step at the MNIST recipe
    # (tools/bench_stage2_step.py; the frozen flow is inference-only there,
    # so the latents only move at bf16 rounding scale)
    coupling_dtype = nf_cfg.get("coupling_dtype", None)
    if nf_cfg.init_nf.mode == "pretrain":
        pretrain_dir = os.path.join("outputs", nf_cfg.init_nf.pretrain.dir)
        backbone, flow_params = load_pretrained_flow(
            pretrain_dir, int(nf_cfg.init_nf.pretrain.epoch), frozen
        )
        if use_pallas or coupling_dtype:
            import dataclasses as _dc

            repl = {"use_pallas": True} if use_pallas else {}
            if coupling_dtype:
                repl["coupling_dtype"] = str(coupling_dtype)
            backbone = _dc.replace(
                backbone, cfg=_dc.replace(backbone.cfg, **repl))
        logger.info(f"Loaded pretrained flow from {pretrain_dir}")
    else:
        sc = nf_cfg.init_nf.scratch
        gcfg = glow_m.GlowConfig(
            in_channels=in_channels, levels=int(sc.L), steps=int(sc.K),
            coupling_width=int(sc.get("coupling_width", 512)),
            scan_unroll=int(sc.get("scan_unroll", 4)),
            use_pallas=use_pallas,
            coupling_dtype=str(coupling_dtype or "float32"),
        )
        backbone = NFBackbone(cfg=gcfg, img_size=img_size, frozen=frozen)
        flow_params = glow_m.init_glow(int(cfg.seed), gcfg)
        logger.info("Initialized flow from scratch")

    formater = get_formater(nf_cfg.latent_formater)(
        L=backbone.cfg.levels, in_channels=backbone.cfg.in_channels,
        size=backbone.img_size,
    )
    unet_kwargs = dict(
        dim=int(cfg.model.unet.dim),
        dim_mults=tuple(cfg.model.unet.dim_mults),
        resnet_block_groups=int(cfg.model.unet.resnet_block_groups),
        learned_sinusoidal_cond=bool(cfg.model.unet.learned_sinusoidal_cond),
        random_fourier_features=bool(cfg.model.unet.random_fourier_features),
        learned_sinusoidal_dim=int(cfg.model.unet.learned_sinusoidal_dim),
        learned_variance=bool(cfg.select("model.diffusion.learned_variance",
                                         False)),
        # mixed-precision UNet compute (fp32 master weights; norms, time
        # embeddings, attention softmax and residual adds stay fp32) —
        # travels as a string so diffusion_architecture.json round-trips
        dtype=str(cfg.select("model.diffusion.unet_dtype",
                             cfg.select("model.unet.dtype", "float32"))),
    )
    diffusion_kwargs = dict(
        timesteps=int(cfg.model.diffusion.timesteps),
        sampling_timesteps=int(cfg.model.diffusion.sampling_timesteps),
        loss_type=cfg.model.diffusion.loss_type,
        beta_schedule=cfg.model.diffusion.beta_schedule,
        ddim_sampling_eta=float(cfg.model.diffusion.ddim_sampling_eta),
        scan_unroll=int(cfg.select("model.diffusion.scan_unroll", 1)),
        sampling_method=str(cfg.select("model.diffusion.sampling_method",
                                       "auto")),
        vlb_time_chunk=int(cfg.select("model.diffusion.vlb_time_chunk", 4)),
        vlb_decoder=str(cfg.select("model.diffusion.vlb_decoder",
                                   "discretized")),
        vlb_clip_denoised=bool(cfg.select("model.diffusion.vlb_clip_denoised",
                                          True)),
        learned_variance=bool(cfg.select("model.diffusion.learned_variance",
                                         False)),
        vlb_loss_weight=float(cfg.select("model.diffusion.vlb_loss_weight",
                                         1.0)),
    )
    # mesh first: the prior's sampler chains batch-shard over it (diffusion
    # FID-scale generation runs data-parallel; single device => no-op)
    mesh = mesh_m.make_mesh(n_model=int(cfg.select("parallel.n_model", 1)),
                            n_slices=int(cfg.select("parallel.n_slices", 1)))
    fsdp = bool(cfg.select("parallel.fsdp", False))

    tr = cfg.model.training
    tcfg = dt.DiffusionTrainConfig(
        epochs=int(tr.epochs),
        lr_diffusion=float(cfg.model.optimizer.lr),
        lr_nf=float(nf_cfg.lr) if nf_cfg.lr else None,
        optimizer=cfg.model.optimizer.type,
        n_bits=int(tr.n_bits),
        temperature=float(tr.temperature),
        print_freq=int(tr.print_freq),
        save_checkpoint_freq=int(tr.save_checkpoint_freq),
        log_gen_images_per_iter=int(cfg.model.logging.log_gen_images_per_iter),
        log_param_distribution=bool(cfg.model.logging.get("log_param_distribution", False)),
        compat_three_channel_bpd=bool(cfg.select("compat.three_channel_bpd", True)),
        ema_decay=(float(ema) if (ema := cfg.select(
            "model.training.ema_decay")) else None),
        ema_update_every=int(cfg.select("model.training.ema_update_every",
                                        10)),
        watchdog_timeout_s=(float(w) if (w := cfg.select(
            "model.training.watchdog_timeout_s")) else None),
        profile_epoch=(int(p) if (p := cfg.select(
            "model.training.profile_epoch")) else None),
        profile_steps=int(cfg.select("model.training.profile_steps", 50)),
        lr_schedule=str(cfg.select("model.optimizer.schedule", "constant")),
        lr_warmup_steps=int(cfg.select("model.optimizer.warmup_steps", 0)),
        lr_decay_steps=(int(d) if (d := cfg.select(
            "model.optimizer.decay_steps")) else None),
        lr_end_factor=float(cfg.select("model.optimizer.end_lr_factor", 0.0)),
    )

    loaders = read_dataset(
        cfg.data.name, cfg.data.root, digits=cfg.data.digits,
        batch_size=int(cfg.data.batch_size), img_size=img_size,
        transformations=list(cfg.data.transformations or []),
        seed=int(cfg.seed),
        synthetic_fallback=bool(cfg.data.get("synthetic_fallback", False)),
        synthetic_n=int(cfg.data.get("synthetic_n", 512)),
    )

    resume_dir = cfg.load.load_exp_dir
    resume_epoch = int(cfg.load.load_epoch) if resume_dir else None
    # load.load_batch=k: mid-epoch resume (see run_baseline_experiment.py)
    resume_batch = (int(rb) if resume_dir and (
        rb := cfg.select("load.load_batch")) is not None else None)
    if resume_dir:
        resume_dir = os.path.join("outputs", resume_dir)

    # Latent standardization (model.normalizing_flow.standardize_latents):
    # real per-processed-part channelwise (z - mean)/std scaling — the
    # capability the reference stubbed out as identity hooks
    # (latent_formaters.py:68-86). Stats fit once from the training stream
    # through the flow and persist in diffusion_architecture.json; a
    # resumed or eval'd run ALWAYS reloads the original run's stats (the
    # diffusion models must keep seeing the space they were trained in).
    from nfdpm_tpu.models.formaters import stats_from_json
    from nfdpm_tpu.training.checkpoint import load_architecture

    formater_stats = None
    if resume_dir:
        try:
            formater_stats = stats_from_json(load_architecture(
                resume_dir, "diffusion_architecture.json"
            ).get("formater_stats"))
        except FileNotFoundError:
            formater_stats = None
        if formater_stats is not None:
            logger.info("Loaded latent standardization stats from "
                        f"{resume_dir}")
        elif bool(cfg.select(
                "model.normalizing_flow.standardize_latents", False)):
            # ADVICE r4: the resumed run's architecture has NO stats, so its
            # diffusion params were trained on UNstandardized latents —
            # refitting fresh stats here would feed them a space they never
            # saw. Ignore the config flag instead (restored params win).
            logger.warning(
                "standardize_latents=true requested but the resumed run at "
                f"{resume_dir} was trained WITHOUT standardization stats — "
                "ignoring the flag to keep the restored diffusion params in "
                "their trained latent space.")
    if (formater_stats is None and resume_dir is None and bool(cfg.select(
            "model.normalizing_flow.standardize_latents", False))):
        formater_stats = dt.fit_latent_stats(
            backbone, flow_params, formater, tcfg, loaders.train,
            n_batches=int(cfg.select(
                "model.normalizing_flow.standardize_batches", 8)),
            seed=int(cfg.seed))
    if formater_stats is not None:
        formater = formater.with_stats(formater_stats)
        logger.info(
            "Latent standardization ON: sum(log std) over dims = "
            f"{formater.stats_log_sigma_total():.1f} nats "
            "(added back to every VLB NLL)")

    dp = DiffusionPrior(formater=formater, unet_kwargs=unet_kwargs,
                        diffusion_kwargs=diffusion_kwargs,
                        batch_sharding=mesh_m.data_sharding(mesh))

    # Persist everything a standalone consumer (tools/generate_samples.py,
    # later eval runs) needs to rebuild this prior from the run dir alone —
    # the flow's GlowConfig, formater (incl. standardization stats), UNet +
    # diffusion kwargs. The baseline runs get the analogous
    # architecture.json from nf_trainer.train.
    from nfdpm_tpu.training.checkpoint import save_architecture

    save_architecture(run_dir, {
        "kind": "diffusion_prior",
        "flow": {
            "L": backbone.cfg.levels, "K": backbone.cfg.steps,
            "in_channels": backbone.cfg.in_channels,
            "coupling_width": backbone.cfg.coupling_width,
            "learn_prior": backbone.cfg.learn_prior,
            "invconv_param": backbone.cfg.invconv_param,
            "img_size": img_size,
        },
        "formater": str(nf_cfg.latent_formater),
        "formater_stats": formater_stats,
        "unet_kwargs": {k: (list(v) if isinstance(v, tuple) else v)
                        for k, v in unet_kwargs.items()},
        "diffusion_kwargs": diffusion_kwargs,
        "frozen": frozen,
        "n_bits": int(tr.n_bits),
        "temperature": float(tr.temperature),
    }, filename="diffusion_architecture.json")

    fid_cfgs = parse_metric(cfg.select("model.evaluation.metrics.FID"))
    kid_cfgs = parse_metric(cfg.select("model.evaluation.metrics.KID"))
    ssim_cfg = cfg.select("model.evaluation.metrics.SSIM_and_PSNR")
    evaluate_fn = None
    if fid_cfgs or kid_cfgs or ssim_cfg:
        from nfdpm_tpu.metrics.compute import make_nf_evaluate_fn

        evaluate_fn = make_nf_evaluate_fn(
            data_name=cfg.data.name, loaders=loaders, fid_configs=fid_cfgs,
            kid_configs=kid_cfgs, img_size=img_size,
            temperature=float(tr.temperature), logger=logger,
            ssim_psnr=dict(ssim_cfg) if ssim_cfg else None,
            quick_num_gen=int(cfg.select("model.evaluation.quick_num_gen", 2000)),
            dataset_split=str(cfg.select("model.evaluation.dataset_split", "train")),
            gen_batch_size=int(cfg.select("model.evaluation.gen_batch_size", 256)),
            mesh=mesh,  # feature-net forward shards P("data") over it
        )

    # Final VLB budget: 'full' (default, apples-to-apples with nf_trainer's
    # full-test-set Gaussian BPD; reference scores the full set too,
    # diffusion_prior/trainer.py:250-260) or an int batch count for quick runs.
    vlb_batches = cfg.select("model.evaluation.vlb_batches", "full")
    vlb_batches = None if str(vlb_batches) == "full" else int(vlb_batches)

    def _report_vlb(params):
        bpd, n, stderr = dt.calculate_bpd_with_diff_prior(
            backbone, dp, tcfg, params, loaders.test,
            jax.random.PRNGKey(int(cfg.seed)), max_batches=vlb_batches,
            with_stats=True,
        )
        logger.info(
            f"VLB test bpd (diffusion prior): {bpd:.4f} "
            f"(N={n}, stderr={stderr:.4f})"
        )
        return bpd

    if parse_train_eval_mode(cfg.phase):
        if bool(cfg.select("parallel.part_parallel", False)):
            # MPMD part-parallel stage 2: each diffusion part on its own
            # disjoint device group (parallel/part_parallel.py). Composes
            # with in-group TP (parallel.n_model); FSDP/spatial address the
            # joint step's memory and don't apply here.
            if not frozen:
                raise ValueError("parallel.part_parallel requires a frozen "
                                 "flow (unfrozen gradients couple the parts)")
            if fsdp or bool(cfg.select("parallel.spatial", False)):
                raise ValueError("parallel.part_parallel composes with "
                                 "n_model (in-group TP) only — disable "
                                 "parallel.fsdp/parallel.spatial")
            if resume_batch is not None:
                raise ValueError(
                    "load.load_batch (mid-epoch resume) is not supported "
                    "with parallel.part_parallel — its checkpoints are "
                    "epoch-level (per-group states); resume with "
                    "load.load_epoch only")
            from nfdpm_tpu.parallel import part_parallel as pp

            out = pp.train_part_parallel(
                backbone=backbone, flow_params=flow_params, dp=dp, tcfg=tcfg,
                loaders=loaders, run_dir=run_dir, logger=logger,
                seed=int(cfg.seed), resume_dir=resume_dir,
                resume_epoch=resume_epoch, evaluate_fn=evaluate_fn,
                sample_mesh=mesh,
                n_model=int(cfg.select("parallel.n_model", 1)),
            )
        else:
            out = dt.train(
                backbone=backbone, flow_params=flow_params, dp=dp, tcfg=tcfg,
                loaders=loaders, run_dir=run_dir, logger=logger, seed=int(cfg.seed),
                resume_dir=resume_dir, resume_epoch=resume_epoch,
                resume_batch=resume_batch,
                evaluate_fn=evaluate_fn, mesh=mesh, fsdp=fsdp,
                spatial=bool(cfg.select("parallel.spatial", False)),
            )
        _report_vlb(dt.ema_eval_params(out["state"]))
    elif cfg.phase == "eval":
        if not resume_dir:
            raise ValueError("phase=eval requires load.load_exp_dir/load_epoch")
        from nfdpm_tpu.training.checkpoint import restore_params

        # params-only restore, templated from the checkpoint's own metadata:
        # optimizer- and topology-agnostic (adamw / FSDP-sharded /
        # part-parallel joint-view checkpoints all load), and it substitutes
        # the EMA weights whenever the run tracked them.
        eval_params = jax.device_put(jax.tree.map(np.asarray, restore_params(
            resume_dir, "diffusion", resume_epoch, prefer_ema=True)))
        sample_fn = dt.make_sample_fn(backbone, dp, tcfg, mesh=mesh)
        _report_vlb(eval_params)
        if evaluate_fn is not None:
            evaluate_fn(sample_fn, eval_params, resume_epoch, full=True)
    else:
        raise ValueError(f"Unknown phase: {cfg.phase}")


if __name__ == "__main__":
    t0 = time.time()
    main(sys.argv[1:])
    print(f"Experiment duration: {time.time() - t0:.1f}s")
