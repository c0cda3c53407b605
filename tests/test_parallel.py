"""Parallelism tests on the 8-device virtual CPU mesh: DP+TP train step
equivalence, sharding-rule specs, collectives correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from nfdpm_tpu.models import glow as glow_m
from nfdpm_tpu.parallel import mesh as mesh_m
from nfdpm_tpu.parallel.sharding_rules import glow_param_specs, shard_glow_params
from nfdpm_tpu.training import nf_trainer as nft
from nfdpm_tpu.training.optim import make_optimizer

CFG = glow_m.GlowConfig(in_channels=3, levels=2, steps=2, coupling_width=32)
TCFG = nft.NFTrainConfig(epochs=1, lr=1e-3)


def test_param_specs_shapes():
    params = glow_m.init_glow(0, CFG)
    specs = glow_param_specs(params)
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    )
    assert len(flat_p) == len(flat_s)
    # at least the coupling conv1 kernels are model-sharded
    n_model_sharded = sum(1 for s in flat_s if "model" in jax.tree_util.tree_leaves(tuple(s)))
    assert n_model_sharded > 0


def test_dp_tp_train_step_matches_single_device():
    """Same math on a (data=4, model=2) mesh as on one device."""
    tx = make_optimizer("adam", 1e-3)
    key = jax.random.PRNGKey(0)
    state = nft.init_train_state(0, CFG, TCFG, tx)
    train_step = nft.make_train_step(CFG, TCFG, tx)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 3))

    s1, m1 = train_step(jax.tree.map(jnp.copy, state), batch, key)

    mesh = mesh_m.make_mesh(n_data=4, n_model=2)
    with mesh:
        params = shard_glow_params(mesh, glow_m.init_glow(0, CFG))
        from nfdpm_tpu.models import prior as prior_m

        full_params = {
            "flow": params,
            "prior": jax.device_put(
                prior_m.init_gaussian_prior((2 ** (CFG.levels + 1)) * CFG.in_channels),
                mesh_m.replicated(mesh),
            ),
        }
        opt_state = jax.jit(tx.init)(full_params)
        sharded_state = {
            "params": full_params,
            "opt_state": opt_state,
            "step": jax.device_put(jnp.zeros((), jnp.int32), mesh_m.replicated(mesh)),
        }
        sbatch = mesh_m.shard_batch(mesh, batch)
        s2, m2 = train_step(sharded_state, sbatch, key)

    np.testing.assert_allclose(float(m1["bpd"]), float(m2["bpd"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-5
        ),
        s1["params"], s2["params"],
    )


def test_inverse_under_tp_mesh():
    """Sampling path works with TP-sharded params."""
    mesh = mesh_m.make_mesh(n_data=4, n_model=2)
    with mesh:
        params = shard_glow_params(mesh, glow_m.init_glow(0, CFG))
        x = mesh_m.shard_batch(
            mesh, jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 3)) * 0.1
        )
        fwd = jax.jit(lambda p, x: glow_m.forward(p, CFG, x))
        latents, ldj, logp = fwd(params, x)
        inv = jax.jit(lambda p, l: glow_m.inverse(p, CFG, l))(params, latents)
        np.testing.assert_allclose(np.asarray(inv), np.asarray(x), atol=2e-3)


def test_unet_tp_matches_single_device():
    """UNet forward + diffusion loss identical whether params are replicated
    on 1 device or TP-sharded on a (data=4, model=2) mesh."""
    from nfdpm_tpu.models.diffusion import DiffusionConfig, GaussianDiffusion
    from nfdpm_tpu.models.unet import Unet
    from nfdpm_tpu.parallel.sharding_rules import shard_unet_params

    unet = Unet(dim=16, dim_mults=(1, 2), channels=3, resnet_block_groups=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 3))
    t = jnp.zeros((8,), jnp.int32)
    variables = unet.init(jax.random.PRNGKey(1), x, t, None)
    params = variables["params"]

    def apply_fn(p, x, t, sc):
        return unet.apply({"params": p}, x, t, sc)

    cfg = DiffusionConfig(image_size=8, channels=3, timesteps=10,
                          beta_schedule="cosine", auto_normalize=False,
                          loss_type="l2")
    diff = GaussianDiffusion(apply_fn, cfg)
    loss_fn = jax.jit(lambda p, x: diff.loss(p, jax.random.PRNGKey(2), x))

    l1 = float(loss_fn(params, x))

    mesh = mesh_m.make_mesh(n_data=4, n_model=2)
    with mesh:
        sp = shard_unet_params(mesh, params)
        sx = mesh_m.shard_batch(mesh, x)
        l2 = float(loss_fn(sp, sx))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
