"""End-to-end NF training smoke tests on synthetic data (CPU, 8 virtual
devices): loss decreases, checkpoints round-trip, sampling works, and the
data-parallel mesh produces the same loss as single-device."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpm_tpu.data.pipeline import read_dataset
from nfdpm_tpu.models import glow as glow_m
from nfdpm_tpu.parallel import mesh as mesh_m
from nfdpm_tpu.training import nf_trainer as nft
from nfdpm_tpu.training.optim import make_optimizer
from nfdpm_tpu.utils.env import setup_logger

CFG = glow_m.GlowConfig(in_channels=3, levels=2, steps=2, coupling_width=32)
TCFG = nft.NFTrainConfig(epochs=1, lr=1e-3, print_freq=100, save_checkpoint_freq=50)


def test_train_step_descends(tmp_path):
    loaders = read_dataset("synthetic", root="", batch_size=16, img_size=8,
                           synthetic_fallback=True, synthetic_n=64)
    tx = make_optimizer("adam", 1e-3)
    key = jax.random.PRNGKey(0)
    state = nft.init_train_state(key, CFG, TCFG, tx)
    train_step = nft.make_train_step(CFG, TCFG, tx)
    imgs, _ = next(iter(loaders.train))
    batch = jnp.asarray(imgs)
    losses = []
    for i in range(12):
        state, m = train_step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(m["bpd"]))
    assert losses[-1] < losses[0], f"bpd did not decrease: {losses[0]} -> {losses[-1]}"
    assert np.isfinite(losses).all()


def test_grad_accum_matches_manual_microbatching():
    """grad_accum=2 must equal the hand-computed average of per-microbatch
    grads with the documented key convention (dequant key for microbatch i =
    fold_in(fold_in(base_key, step), i)), followed by one optimizer update."""
    import optax

    tcfg2 = nft.NFTrainConfig(epochs=1, lr=1e-3, grad_accum=2)
    tx = make_optimizer("adam", 1e-3)
    base_key = jax.random.PRNGKey(7)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))

    state = nft.init_train_state(0, CFG, tcfg2, tx)
    params0 = jax.tree.map(jnp.copy, state["params"])
    opt0 = jax.tree.map(jnp.copy, state["opt_state"])
    step2 = nft.make_train_step(CFG, tcfg2, tx)
    s2, m2 = step2(state, batch, base_key)

    # manual: two half-batches through the single-batch loss, averaged
    from nfdpm_tpu.models import prior as prior_m
    from nfdpm_tpu.ops import quantize as q

    def loss_fn(params, mb, key):
        x = q.dequantize(key, q.preprocess(mb, tcfg2.n_bits), tcfg2.n_bits)
        latents, ldj, logp = glow_m.forward(params["flow"], CFG, x)
        logp = logp + prior_m.gaussian_prior_logp(params["prior"], latents[-1])
        n_pixel = prior_m.n_pixels(8, 3, tcfg2.compat_three_channel_bpd)
        return prior_m.bits_per_dim(ldj + logp, q.n_bins_of(tcfg2.n_bits), n_pixel)

    step_key = jax.random.fold_in(base_key, 0)  # state["step"] == 0
    grads, bpds = [], []
    for i, mb in enumerate((batch[:4], batch[4:])):
        bpd, g = jax.value_and_grad(loss_fn)(
            params0, mb, jax.random.fold_in(step_key, i))
        grads.append(g)
        bpds.append(float(bpd))
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    updates, _ = tx.update(g_mean, opt0, params0)
    params_manual = optax.apply_updates(params0, updates)

    np.testing.assert_allclose(float(m2["bpd"]), np.mean(bpds), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s2["params"], params_manual,
    )


def test_full_train_loop_and_checkpoint(tmp_path):
    loaders = read_dataset("synthetic", root="", batch_size=16, img_size=8,
                           synthetic_fallback=True, synthetic_n=64)
    logger = setup_logger("test_nf")
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir, exist_ok=True)
    out = nft.train(cfg=CFG, tcfg=TCFG, loaders=loaders, run_dir=run_dir,
                    logger=logger, img_size=8)
    assert np.isfinite(out["results"]["bpd_test"])

    # resume restores exactly (template must match the trainer's opt_state
    # structure, which depends on compat_fixed_prior)
    from nfdpm_tpu.training.checkpoint import restore_state

    tx = make_optimizer("adam", 1e-3, fixed_prior=TCFG.compat_fixed_prior)
    template = nft.init_train_state(jax.random.PRNGKey(0), CFG, TCFG, tx)
    restored = restore_state(run_dir, "gaussian", 1, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        restored["params"], out["state"]["params"],
    )

    # sampling from the trained model produces valid uint8 images
    sample_fn = out["sample_fn"]
    samples = sample_fn(out["state"]["params"], jax.random.PRNGKey(7), 4, 0.7)
    assert samples.shape == (4, 8, 8, 3)
    assert samples.dtype == jnp.uint8


def test_data_parallel_matches_single_device():
    """Same params+batch+key => same loss and grads whether the batch lives
    on 1 device or is sharded over 8 (SURVEY.md §7 step 4)."""
    tx = make_optimizer("adam", 1e-3)
    key = jax.random.PRNGKey(0)
    state = nft.init_train_state(key, CFG, TCFG, tx)
    train_step = nft.make_train_step(CFG, TCFG, tx)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 3))

    s1, m1 = train_step(jax.tree.map(jnp.copy, state), batch, key)

    mesh = mesh_m.make_mesh()
    assert mesh.shape["data"] == 8
    with mesh:
        sharded = mesh_m.shard_batch(mesh, batch)
        s8, m8 = train_step(jax.tree.map(jnp.copy, state), sharded, key)

    np.testing.assert_allclose(float(m1["bpd"]), float(m8["bpd"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        s1["params"], s8["params"],
    )


def test_iwae_bpd_tighter_or_equal():
    """The IWAE multi-draw bound is never worse (higher) than the mean of
    single-draw bounds, up to noise."""
    from nfdpm_tpu.data.pipeline import read_dataset

    loaders = read_dataset("synthetic", root="", batch_size=8, img_size=8,
                           synthetic_fallback=True, synthetic_n=16)
    tx = make_optimizer("adam", 1e-3)
    state = nft.init_train_state(0, CFG, TCFG, tx)
    eval_step = nft.make_eval_step(CFG, TCFG)
    key = jax.random.PRNGKey(0)
    mean_bpd = nft.calculate_bpd(eval_step, state["params"], loaders.test, key,
                                 n_dequant_samples=4, iwae=False)
    iwae_bpd = nft.calculate_bpd(eval_step, state["params"], loaders.test, key,
                                 n_dequant_samples=4, iwae=True)
    assert np.isfinite(mean_bpd) and np.isfinite(iwae_bpd)
    assert iwae_bpd <= mean_bpd + 1e-3


def test_fixed_prior_never_updates():
    """Reference parity: the optimizer contains flow.parameters() only
    (normalizing_flow/trainer.py:109), so with compat_fixed_prior=True the
    Gaussian prior must stay exactly standard normal while flow params move."""
    tcfg = nft.NFTrainConfig(epochs=1, lr=1e-2, compat_fixed_prior=True)
    tx = make_optimizer("adam", 1e-2, fixed_prior=True)
    key = jax.random.PRNGKey(0)
    state = nft.init_train_state(key, CFG, tcfg, tx)
    prior0 = jax.tree.map(jnp.copy, state["params"]["prior"])
    flow0 = jax.tree.map(jnp.copy, state["params"]["flow"])
    train_step = nft.make_train_step(CFG, tcfg, tx)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))
    for i in range(3):
        state, _ = train_step(state, batch, jax.random.fold_in(key, i))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state["params"]["prior"], prior0,
    )
    moved = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(x),
        jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                     state["params"]["flow"], flow0),
        0.0,
    )
    assert moved > 0.0


def test_fixed_prior_excluded_from_clip_norm():
    """With fixed_prior=True the global-norm clip must see flow grads only:
    a huge prior gradient must not shrink the flow update."""
    import optax

    params = {"flow": {"w": jnp.ones((4,))}, "prior": {"bias": jnp.ones((4,))}}
    grads_small_prior = {"flow": {"w": jnp.full((4,), 0.1)},
                         "prior": {"bias": jnp.zeros((4,))}}
    grads_huge_prior = {"flow": {"w": jnp.full((4,), 0.1)},
                        "prior": {"bias": jnp.full((4,), 1e6)}}

    tx = make_optimizer("adam", 1e-3, fixed_prior=True)
    s1 = tx.init(params)
    u1, _ = tx.update(grads_small_prior, s1, params)
    s2 = tx.init(params)
    u2, _ = tx.update(grads_huge_prior, s2, params)
    np.testing.assert_allclose(np.asarray(u1["flow"]["w"]),
                               np.asarray(u2["flow"]["w"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(u2["prior"]["bias"]), 0.0)


def test_async_checkpoint_save_restore(tmp_path):
    """save_state(block=False) commits on the Orbax writer thread;
    wait_for_saves()/restore_state see the full committed state, including
    an immediate same-path overwrite race (async save -> blocking save to
    the same epoch path, the final-epoch pattern in the trainers)."""
    import numpy as np

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.training.checkpoint import (restore_state, save_state,
                                               wait_for_saves)

    cfg = glow_m.GlowConfig(in_channels=3, levels=2, steps=1,
                            coupling_width=16)
    params = glow_m.init_glow(0, cfg)
    state = {"params": {"flow": params}, "step": jnp.ones((), jnp.int32)}

    save_state(str(tmp_path), "nf", 1, state, block=False)
    wait_for_saves()
    template = jax.tree.map(jnp.zeros_like, state)
    restored = restore_state(str(tmp_path), "nf", 1, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state, restored)

    # async save immediately followed by a blocking overwrite of the SAME
    # path (trainer final-epoch pattern: wait_for_saves() then save_state)
    state2 = jax.tree.map(lambda x: x + 1, state)
    save_state(str(tmp_path), "nf", 2, state, block=False)
    wait_for_saves()
    save_state(str(tmp_path), "nf", 2, state2)
    restored2 = restore_state(str(tmp_path), "nf", 2, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state2, restored2)


def test_restore_params_is_optimizer_agnostic(tmp_path):
    """restore_params must recover the params subtree from the checkpoint's
    own metadata — with NO optimizer reconstruction. A state saved under an
    optimizer whose opt_state structure is not derivable from
    architecture.json (adamw here, vs the adam that templates assumed) must
    still load (inference-only consumers: runload/generation/interpolation)."""
    import optax

    from nfdpm_tpu.training.checkpoint import restore_params, save_state

    params = {"flow": {"w": jnp.arange(4.0)}, "prior": {"b": jnp.ones(2)}}
    tx = optax.adamw(1e-3)  # extra weight-decay state vs adam
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32)}
    save_state(str(tmp_path), "gaussian", 3, state)
    out = restore_params(str(tmp_path), "gaussian", 3)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), out, params))


def test_lr_schedules():
    """make_lr_schedule: constant passthrough, warmup ramp (0 -> lr, held),
    cosine peak at warmup end and lr*end_factor at decay_steps. Schedules
    index off the optimizer's own step count, so resume continues exactly."""
    from nfdpm_tpu.training.optim import make_lr_schedule

    assert make_lr_schedule(1e-3) == 1e-3  # plain float: zero overhead

    warm = make_lr_schedule(1e-3, "constant", warmup_steps=10)
    assert float(warm(0)) == 0.0
    assert np.isclose(float(warm(10)), 1e-3)
    assert np.isclose(float(warm(1000)), 1e-3)  # held after warmup

    cos = make_lr_schedule(1e-3, "cosine", warmup_steps=10, decay_steps=100,
                           end_lr_factor=0.1)
    assert float(cos(0)) == 0.0
    assert np.isclose(float(cos(10)), 1e-3)
    assert np.isclose(float(cos(100)), 1e-4)
    assert float(cos(50)) < 1e-3

    with pytest.raises(ValueError):
        make_lr_schedule(1e-3, "cosine")  # needs decay_steps
    with pytest.raises(ValueError):
        make_lr_schedule(1e-3, "linear")


def test_warmup_first_update_is_zero():
    """With warmup the first optimizer update is exactly zero (LR 0 at step
    0) while later steps move the params — wired through make_optimizer and
    both trainers' config plumbing."""
    from nfdpm_tpu.training.optim import make_lr_schedule

    tx = make_optimizer("adam", 1e-3, lr_schedule=make_lr_schedule(
        1e-3, "constant", warmup_steps=5))
    params = {"flow": {"w": jnp.ones(3)}, "prior": {"b": jnp.ones(2)}}
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd0, opt_state = tx.update(grads, opt_state, params)
    assert float(jnp.abs(upd0["flow"]["w"]).max()) == 0.0
    for _ in range(5):
        upd, opt_state = tx.update(grads, opt_state, params)
    assert float(jnp.abs(upd["flow"]["w"]).max()) > 0.0
