"""Part-parallel (expert-parallel analogue) stage-2 training: each
diffusion part trains on its own device group with zero cross-group
communication (parallel/part_parallel.py — greenfield; the reference
trains all parts jointly on one GPU, diffusion_prior/trainer.py:140-141).
"""

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
                                   ema_decay=0.5)
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
