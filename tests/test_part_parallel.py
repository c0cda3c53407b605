"""Part-parallel (expert-parallel analogue) stage-2 training: each
diffusion part trains on its own device group with zero cross-group
communication (parallel/part_parallel.py — greenfield; the reference
trains all parts jointly on one GPU, diffusion_prior/trainer.py:140-141).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpm_tpu.models import glow as glow_m
from nfdpm_tpu.models.diffusion_prior import DiffusionPrior
from nfdpm_tpu.models.formaters import IdentityFormater
from nfdpm_tpu.models.nf_backbone import NFBackbone
from nfdpm_tpu.parallel import part_parallel as pp
from nfdpm_tpu.training import diffusion_trainer as dt

GCFG = glow_m.GlowConfig(in_channels=3, levels=2, steps=1, coupling_width=16)
UNET_KW = dict(dim=8, dim_mults=(1, 2), resnet_block_groups=2)
DIFF_KW = dict(timesteps=8, sampling_timesteps=4, loss_type="l2",
               beta_schedule="cosine", ddim_sampling_eta=1.0)


@pytest.fixture(scope="module")
def setup():
    backbone = NFBackbone(cfg=GCFG, img_size=8, frozen=True)
    flow_params = glow_m.init_glow(0, GCFG)
    formater = IdentityFormater(L=GCFG.levels, in_channels=GCFG.in_channels,
                                size=8)
    dp = DiffusionPrior(formater=formater, unet_kwargs=UNET_KW,
                        diffusion_kwargs=DIFF_KW)
    return backbone, flow_params, dp


def test_group_meshes_disjoint():
    """8 devices / 2 parts -> two disjoint 4-device groups."""
    meshes = pp.part_group_meshes(2)
    assert len(meshes) == 2
    sets = [set(d.id for d in m.devices.flat) for m in meshes]
    assert sets[0].isdisjoint(sets[1])
    assert len(sets[0]) == len(sets[1]) == 4

    # fewer devices than parts: round-robin sharing, one device per group
    meshes = pp.part_group_meshes(3, devices=jax.devices()[:2])
    assert [len(set(d.id for d in m.devices.flat)) for m in meshes] == [1, 1, 1]

    with pytest.raises(ValueError, match="not divisible"):
        pp.part_group_meshes(2, devices=jax.devices(), n_model=3)


def _joint_trajectory(backbone, flow_params, dp, tcfg, batches, base_key):
    tx = dt.make_two_group_optimizer(tcfg, frozen=True)
    jstate = dt.init_train_state(0, backbone, flow_params, dp, tx, ema=True)
    jstep = dt.make_train_step(backbone, dp, tcfg, tx)
    jlosses = []
    for b in batches:
        jstate, m = jstep(jstate, b, base_key)
        jlosses.append(np.asarray(m["part_losses"]))
    return jstate, jlosses


def test_part_parallel_bit_matches_joint_trainer(setup):
    """Three part-parallel steps on IDENTICAL batches reproduce the joint
    trainer's per-part trajectories BIT-EXACTLY when both run on the same
    device (frozen flow => the joint loss is separable; key threading is
    mirrored by construction, so the per-part programs compute the same
    math in the same order)."""
    backbone, flow_params, dp = setup
    tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2,
                                   ema_decay=0.5, ema_update_every=1)
    base_key = jax.random.PRNGKey(7)
    batches = [jax.random.uniform(jax.random.PRNGKey(i), (8, 8, 8, 3))
               for i in range(3)]
    jstate, jlosses = _joint_trajectory(backbone, flow_params, dp, tcfg,
                                        batches, base_key)

    # both groups share device 0 -> no cross-partitioning reduction-order
    # noise; the trajectories must be bit-identical
    plan = pp.PartParallelPlan.build(0, backbone, flow_params, dp, tcfg,
                                     devices=jax.devices()[:1])
    plosses = []
    for b in batches:
        plosses.append(plan.step_all([b, b], base_key))

    for t, (jl, pl) in enumerate(zip(jlosses, plosses)):
        np.testing.assert_array_equal(
            jl, np.asarray([float(x) for x in pl]),
            err_msg=f"per-part losses diverged at step {t}")
    merged = plan.joint_params(prefer_ema=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        jax.tree.map(np.asarray, jstate["params"]["diffusion"]),
        merged["diffusion"])
    # EMA shadows match the joint trainer's too
    merged_ema = plan.joint_params(prefer_ema=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        jax.tree.map(np.asarray, jstate["ema"]["diffusion"]),
        merged_ema["diffusion"])


def test_part_parallel_multi_device_groups_match_losses(setup):
    """On disjoint 4-device groups the per-step losses still match the
    joint trainer at fp32 tolerance. (Params are compared loosely only:
    the 4-way gradient all-reduce changes fp32 summation order, and Adam's
    sqrt-normalization amplifies those LSB differences to O(lr) in the
    first steps — same reason test_parallel.py's DP tests compare metrics,
    not weights.)"""
    backbone, flow_params, dp = setup
    tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2)
    base_key = jax.random.PRNGKey(7)
    batches = [jax.random.uniform(jax.random.PRNGKey(i), (8, 8, 8, 3))
               for i in range(3)]
    jstate, jlosses = _joint_trajectory(backbone, flow_params, dp, tcfg,
                                        batches, base_key)

    plan = pp.PartParallelPlan.build(0, backbone, flow_params, dp, tcfg)
    plosses = []
    for b in batches:
        plosses.append(plan.step_all(
            [plan.shard_group_batch(g, b) for g in range(dp.num_parts)],
            base_key))

    for t, (jl, pl) in enumerate(zip(jlosses, plosses)):
        np.testing.assert_allclose(
            jl, np.asarray([float(x) for x in pl]), rtol=1e-5, atol=1e-6,
            err_msg=f"per-part losses diverged at step {t}")
    merged = plan.joint_params(prefer_ema=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, atol=3e-2),
        jax.tree.map(np.asarray, jstate["params"]["diffusion"]),
        merged["diffusion"])


def test_part_parallel_tp_inside_group(setup):
    """n_model=2 inside each 4-device group: UNet params take the TP
    shardings, the step runs, and the loss matches the unsharded one."""
    backbone, flow_params, dp = setup
    tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))
    key = jax.random.PRNGKey(3)

    plain = pp.PartParallelPlan.build(0, backbone, flow_params, dp, tcfg)
    l_plain = plain.step_all(
        [plain.shard_group_batch(g, batch) for g in range(2)], key)

    tp = pp.PartParallelPlan.build(0, backbone, flow_params, dp, tcfg,
                                   n_model=2)
    for mesh in tp.meshes:
        assert mesh.shape == {"data": 2, "model": 2}
    l_tp = tp.step_all(
        [tp.shard_group_batch(g, batch) for g in range(2)], key)
    np.testing.assert_allclose([float(x) for x in l_plain],
                               [float(x) for x in l_tp], rtol=1e-4)


def test_merged_params_drive_the_sampler(setup):
    """plan.joint_params() feeds make_sample_fn unchanged — the merge is
    layout-compatible with every downstream consumer."""
    backbone, flow_params, dp = setup
    tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2)
    plan = pp.PartParallelPlan.build(0, backbone, flow_params, dp, tcfg)
    batch = jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 3))
    plan.step_all([plan.shard_group_batch(g, batch) for g in range(2)],
                  jax.random.PRNGKey(0))
    sample_fn = dt.make_sample_fn(backbone, dp, tcfg)
    imgs = sample_fn(plan.joint_params(), jax.random.PRNGKey(5), 4, 1.0)
    assert imgs.shape == (4, 8, 8, 3)
    assert imgs.dtype == jnp.uint8


def test_unfrozen_flow_rejected(setup):
    _, flow_params, dp = setup
    backbone = NFBackbone(cfg=GCFG, img_size=8, frozen=False)
    tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2)
    with pytest.raises(ValueError, match="frozen"):
        pp.make_part_train_step(backbone, dp, 0, tcfg,
                                pp.make_part_optimizer(tcfg))


def test_part_parallel_periodic_ema_matches_joint(setup):
    """ema_update_every=2 on both trainers (same device, identical batches):
    the part-parallel per-group EMA cadence reproduces the joint trainer's
    shadow bit-exactly."""
    backbone, flow_params, dp = setup
    tcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2,
                                   ema_decay=0.5, ema_update_every=2)
    base_key = jax.random.PRNGKey(7)
    batches = [jax.random.uniform(jax.random.PRNGKey(i), (8, 8, 8, 3))
               for i in range(4)]

    tx = dt.make_two_group_optimizer(tcfg, frozen=True)
    jstate = dt.init_train_state(0, backbone, flow_params, dp, tx, ema=True)
    jstep = dt.make_train_step(backbone, dp, tcfg, tx)
    ema_fn = dt.make_ema_update(backbone, tcfg)
    for i, b in enumerate(batches, start=1):
        jstate, _ = jstep(jstate, b, base_key)
        if i % 2 == 0:
            jstate = ema_fn(jstate)

    plan = pp.PartParallelPlan.build(0, backbone, flow_params, dp, tcfg,
                                     devices=jax.devices()[:1])
    for b in batches:
        plan.step_all([b, b], base_key)
    merged = plan.joint_params(prefer_ema=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        jax.tree.map(np.asarray, jstate["ema"]["diffusion"]),
        merged["diffusion"])


def test_train_part_parallel_driver(setup, tmp_path):
    """The full part-parallel trainer: epochs loop, round-robin dispatch,
    dual checkpoints (exact per-group resume source + merged joint view
    every downstream consumer reads), resume continuation."""
    import logging

    from nfdpm_tpu.data.pipeline import read_dataset
    from nfdpm_tpu.training.checkpoint import restore_params

    backbone, flow_params, dp = setup
    loaders = read_dataset("synthetic", root="", batch_size=8, img_size=8,
                           synthetic_n=48)
    tcfg = dt.DiffusionTrainConfig(epochs=2, lr_diffusion=1e-2,
                                   save_checkpoint_freq=1, print_freq=4,
                                   ema_decay=0.5, ema_update_every=1)
    run_dir = str(tmp_path / "run")
    logger = logging.getLogger("pp_test")
    out = pp.train_part_parallel(
        backbone=backbone, flow_params=flow_params, dp=dp, tcfg=tcfg,
        loaders=loaders, run_dir=run_dir, logger=logger, seed=0)

    ckpts = os.listdir(os.path.join(run_dir, "checkpoints"))
    assert "model_diffusion_002" in ckpts          # joint view
    assert "model_diffusion_parts_002" in ckpts    # exact resume source

    # the joint-view checkpoint feeds every params-only consumer, EMA first
    p_ema = restore_params(run_dir, "diffusion", 2, prefer_ema=True)
    merged = out["plan"].joint_params(prefer_ema=True)
    for a, b in zip(jax.tree.leaves(p_ema["diffusion"]),
                    jax.tree.leaves(merged["diffusion"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ema_eval_params consumes the returned joint-view state
    ev = dt.ema_eval_params(out["state"])
    for a, b in zip(jax.tree.leaves(ev["diffusion"]),
                    jax.tree.leaves(merged["diffusion"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the sampler runs off it
    imgs = out["sample_fn"](ev, jax.random.PRNGKey(1), 4, 1.0)
    assert imgs.shape == (4, 8, 8, 3)

    # resume: per-group states restore exactly and training continues
    out2 = pp.train_part_parallel(
        backbone=backbone, flow_params=flow_params, dp=dp,
        tcfg=dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-2,
                                     save_checkpoint_freq=1, print_freq=4,
                                     ema_decay=0.5, ema_update_every=1),
        loaders=loaders, run_dir=run_dir, logger=logger, seed=0,
        resume_dir=run_dir, resume_epoch=2)
    assert int(out2["state"]["step"]) > int(out["state"]["step"])
    assert "model_diffusion_003" in os.listdir(
        os.path.join(run_dir, "checkpoints"))


def test_part_parallel_cli(tmp_path, monkeypatch):
    """parallel.part_parallel=true end-to-end through the stage-2 CLI, then
    phase=eval and the generation tool consume the joint-view checkpoint."""
    import sys

    monkeypatch.chdir(tmp_path)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import run_baseline_experiment as base_exp
    import run_diffusion_prior_experiment as diff_exp

    data_args = ["data.name=synthetic", "data.synthetic_fallback=true",
                 "data.batch_size=8", "data.img_size=8", "data.synthetic_n=48"]
    base_exp.main([
        "experiment_name=nf_pp", *data_args,
        "model.architecture.L=2", "model.architecture.K=1",
        "model.architecture.coupling_width=16",
        "model.training.epochs=1", "model.training.save_checkpoint_freq=1",
        "model.training.print_freq=4",
    ])
    nf_run = [r for r in os.listdir("outputs") if r.startswith("nf_pp")][0]

    diff_args = [
        *data_args,
        f"model.normalizing_flow.init_nf.pretrain.dir={nf_run}",
        "model.normalizing_flow.init_nf.pretrain.epoch=1",
        "model.unet.dim=8", "model.unet.dim_mults=[1,2]",
        "model.unet.resnet_block_groups=2",
        "model.diffusion.timesteps=8", "model.diffusion.sampling_timesteps=4",
    ]
    diff_exp.main([
        "experiment_name=diff_pp", "parallel.part_parallel=true",
        "model.training.ema_decay=0.9", *diff_args,
        "model.training.epochs=1", "model.training.save_checkpoint_freq=1",
        "model.training.print_freq=4",
    ])
    diff_run = [r for r in os.listdir("outputs") if r.startswith("diff_pp")][0]
    ckpts = os.listdir(os.path.join("outputs", diff_run, "checkpoints"))
    assert "model_diffusion_001" in ckpts
    assert "model_diffusion_parts_001" in ckpts

    # eval phase reads the joint-view (opt-state-free) checkpoint
    diff_exp.main([
        "experiment_name=diff_pp_eval", "phase=eval",
        f"load.load_exp_dir={diff_run}", "load.load_epoch=1", *diff_args,
    ])

    # generation CLI consumes the same run dir (EMA weights by default)
    from tools.generate_samples import main as gen_main

    gen_main(["--run-dir", os.path.join("outputs", diff_run),
              "--n", "4", "--batch", "4", "--ddim", "2"])
    samples = np.load(os.path.join(
        "outputs", diff_run, "generated", "samples.npz"))["samples"]
    assert samples.shape == (4, 8, 8, 3) and samples.dtype == np.uint8

    # guard rails: unfrozen / fsdp are rejected
    with pytest.raises(ValueError, match="frozen"):
        diff_exp.main([
            "experiment_name=diff_pp_bad", "parallel.part_parallel=true",
            "model.normalizing_flow.freeze=false",
            "model.normalizing_flow.lr=1e-4", *diff_args,
            "model.training.epochs=1",
        ])
    with pytest.raises(ValueError, match="composes"):
        diff_exp.main([
            "experiment_name=diff_pp_bad2", "parallel.part_parallel=true",
            "parallel.fsdp=true", *diff_args, "model.training.epochs=1",
        ])
