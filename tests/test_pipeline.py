"""Pipeline parallelism (parallel/pipeline.py): the K-step stacks shard
over the "model" axis and microbatches flow through the stages via a GPipe
ppermute schedule inside shard_map. Greenfield — the reference is
single-GPU (/root/reference/normalizing_flow/trainer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpm_tpu.models import glow as glow_m
from nfdpm_tpu.parallel import mesh as mesh_m
from nfdpm_tpu.parallel import pipeline as pl
from nfdpm_tpu.training import nf_trainer as nft
from nfdpm_tpu.training.optim import make_optimizer

CFG = glow_m.GlowConfig(in_channels=3, levels=2, steps=4, coupling_width=16)
TCFG = nft.NFTrainConfig(epochs=1, lr=1e-3)


def test_pp_forward_matches_plain():
    """pp_forward on a (data=2, model=4) mesh == glow.forward on one device:
    identical latents, logdet, and split-prior logp — the pipeline changes
    device placement and batch slicing only."""
    params = glow_m.init_glow(0, CFG)
    x = np.random.default_rng(0).normal(size=(16, 8, 8, 3)).astype(np.float32)
    lat0, ldj0, logp0 = jax.jit(
        lambda p, x: glow_m.forward(p, CFG, x))(params, x)

    mesh = mesh_m.make_mesh(n_data=2, n_model=4)
    with mesh:
        sp = pl.shard_flow_params_pp(mesh, params)
        xb = jax.device_put(x, mesh_m.data_sharding(mesh))
        lat1, ldj1, logp1 = jax.jit(
            lambda p, x: pl.pp_forward(p, CFG, x, mesh, microbatches=4))(sp, xb)

    for a, b in zip(lat0, lat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj0), np.asarray(ldj1),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logp0), np.asarray(logp1),
                               rtol=1e-5, atol=1e-4)


def test_pp_single_stage_and_single_microbatch():
    """Degenerate schedules — S=1 (no permutes) and M=1 (one full-batch
    microbatch) — still reproduce the plain forward."""
    params = glow_m.init_glow(0, CFG)
    x = np.random.default_rng(1).normal(size=(8, 8, 8, 3)).astype(np.float32)
    _, ldj0, _ = jax.jit(lambda p, x: glow_m.forward(p, CFG, x))(params, x)

    for n_data, n_model, m in ((2, 1, 2), (2, 4, 1)):
        mesh = mesh_m.make_mesh(n_data=n_data, n_model=n_model)
        with mesh:
            sp = pl.shard_flow_params_pp(mesh, params)
            xb = jax.device_put(x, mesh_m.data_sharding(mesh))
            _, ldj1, _ = jax.jit(
                lambda p, x: pl.pp_forward(p, CFG, x, mesh, m))(sp, xb)
        np.testing.assert_allclose(np.asarray(ldj0), np.asarray(ldj1),
                                   rtol=1e-5, atol=1e-4)


def test_pp_train_step_matches_single_device():
    """Two pipelined train steps on the (data=2, model=4) mesh follow the
    single-device trajectory (losses + updated params)."""
    tx = make_optimizer("adam", 1e-3)
    key = jax.random.PRNGKey(0)
    state = nft.init_train_state(0, CFG, TCFG, tx)
    plain_step = nft.make_train_step(CFG, TCFG, tx)
    batches = [jax.random.uniform(jax.random.PRNGKey(i), (16, 8, 8, 3))
               for i in range(2)]

    s1 = jax.tree.map(jnp.copy, state)
    losses1 = []
    for b in batches:
        s1, m1 = plain_step(s1, b, key)
        losses1.append(float(m1["bpd"]))

    mesh = mesh_m.make_mesh(n_data=2, n_model=4)
    with mesh:
        s2 = nft.shard_nf_state(mesh, tx, nft.init_train_state(0, CFG, TCFG, tx),
                                pipeline=True)
        # flow stacks landed on the pipeline layout: leading K axis sharded
        stack = s2["params"]["flow"]["final_steps"]
        leaf = jax.tree.leaves(stack)[0]
        assert "model" in jax.tree_util.tree_leaves(
            tuple(leaf.sharding.spec))
        pp_step = nft.make_train_step(CFG, TCFG, tx, pp=(mesh, 4))
        losses2 = []
        for b in batches:
            s2, m2 = pp_step(s2, mesh_m.shard_batch(mesh, b), key)
            losses2.append(float(m2["bpd"]))

    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-5),
        s1["params"], s2["params"])


def test_pipeline_config_guards():
    mesh = mesh_m.make_mesh(n_data=2, n_model=4)
    bad_k = glow_m.GlowConfig(in_channels=3, levels=2, steps=3,
                              coupling_width=16)
    with pytest.raises(ValueError, match="divisible by the"):
        pl.check_pipeline_config(bad_k, 4, 4, 8)
    with pytest.raises(ValueError, match="pipeline_microbatches"):
        pl.check_pipeline_config(CFG, 4, 0, 8)
    with pytest.raises(ValueError, match="divisible by"):
        pl.check_pipeline_config(CFG, 4, 3, 8)
    pallas_cfg = glow_m.GlowConfig(in_channels=3, levels=2, steps=4,
                                   coupling_width=16, use_pallas=True)
    with pytest.raises(ValueError, match="pallas"):
        pl.check_pipeline_config(pallas_cfg, 4, 4, 8)
    # spatial and pipeline both claim the model axis
    tx = make_optimizer("adam", 1e-3)
    with pytest.raises(ValueError, match="at most one"):
        nft.make_train_step(CFG, TCFG, tx, pp=(mesh, 4),
                            spatial_sharding=mesh_m.spatial_sharding(mesh))
    # fsdp and pipeline both repartition the flow
    state = nft.init_train_state(0, CFG, TCFG, tx)
    with pytest.raises(ValueError, match="at most one"):
        nft.shard_nf_state(mesh, tx, state, fsdp=True, pipeline=True)


def test_pipeline_partitions_flow_memory():
    """Quantitative pipeline evidence: device-0's addressable bytes for the
    flow params + Adam moments drop to ~1/S of the replicated layout (every
    K-step stack shards its leading axis; only the tiny split priors stay
    replicated)."""
    tx = make_optimizer("adam", 1e-3)
    mesh = mesh_m.make_mesh(n_data=2, n_model=4)

    def dev0_bytes(tree):
        return sum(x.addressable_shards[0].data.nbytes
                   for x in jax.tree_util.tree_leaves(tree)
                   if isinstance(x, jax.Array))

    with mesh:
        state_r = nft.shard_nf_state(
            mesh, tx, nft.init_train_state(0, CFG, TCFG, tx))
        state_p = nft.shard_nf_state(
            mesh, tx, nft.init_train_state(0, CFG, TCFG, tx), pipeline=True)
        # TP layout shards coupling width; compare against a replicated
        # placement for the clean 1/S statement
        rep_params = jax.device_put(nft.init_train_state(0, CFG, TCFG, tx),
                                    mesh_m.replicated(mesh))
        rep = dev0_bytes(rep_params["params"]["flow"]) + dev0_bytes(
            rep_params["opt_state"])
        pp = dev0_bytes(state_p["params"]["flow"]) + dev0_bytes(
            state_p["opt_state"])
    # K=4 over 4 stages: the stacks shard fully; Adam moments follow.
    assert pp < rep / 3.0, (pp, rep)
    del state_r


def test_pipeline_cli(tmp_path, monkeypatch):
    """parallel.pipeline=true end-to-end through the stage-1 CLI on the
    (4, 2) virtual mesh."""
    import os
    import sys

    monkeypatch.chdir(tmp_path)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import run_baseline_experiment as base_exp

    base_exp.main([
        "experiment_name=nf_pipe",
        "data.name=synthetic", "data.synthetic_fallback=true",
        "data.batch_size=8", "data.img_size=8", "data.synthetic_n=48",
        "model.architecture.L=2", "model.architecture.K=2",
        "model.architecture.coupling_width=16",
        "model.training.epochs=1", "model.training.save_checkpoint_freq=1",
        "model.training.print_freq=4",
        "parallel.n_model=2", "parallel.pipeline=true",
    ])
    run = [r for r in os.listdir("outputs") if r.startswith("nf_pipe")][0]
    ckpts = os.listdir(os.path.join("outputs", run, "checkpoints"))
    assert "model_gaussian_001" in ckpts
    # the final bpd logged is finite (metrics stream)
    with open(os.path.join("outputs", run, "metrics.jsonl")) as f:
        assert "bpd" in f.read()
