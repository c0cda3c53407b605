"""Diffusion-TRAINING trajectory parity vs the PyTorch reference.

Extends the single-step loss/formula parity (test_parity_diffusion.py) to
optimizer DYNAMICS: co-train the SAME tiny UNet diffusion model in both
frameworks — identical imported initial weights, identical injected
(x_start, t, noise) per step, Adam lr=1e-3 with NO gradient clipping
(the reference diffusion trainer uses none,
/root/reference/diffusion_prior/trainer.py:148-150) — and assert the loss
curves track step-by-step.

Both `p_losses` implementations accept injected t/noise
(gaussian_diffusion.py:823-825; models/diffusion.py), so no RNG patching is
needed; the only stochastic inputs are the precomputed arrays fed to both.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "diffusion_prior")),
    reason="reference repo not mounted",
)
torch = pytest.importorskip("torch")

DIM, MULTS, C, SIZE, GROUPS = 8, (1, 2), 3, 16, 2
T, B, N_STEPS, LR = 50, 8, 60, 1e-3
TRACK_STEPS = 20


@pytest.fixture(scope="module")
def ref_mod():
    import importlib.util

    for name in ("tqdm", "tqdm.auto"):
        m = types.ModuleType(name)
        m.tqdm = lambda x, **k: x
        sys.modules.setdefault(name, m)
    spec = importlib.util.spec_from_file_location(
        "ref_gd3", os.path.join(REF, "diffusion_prior", "gaussian_diffusion.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_gd3"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def trajectories(ref_mod):
    rng = np.random.default_rng(11)
    xs = rng.normal(size=(N_STEPS, B, C, SIZE, SIZE)).astype(np.float32)
    ts = rng.integers(0, T, (N_STEPS, B)).astype(np.int64)
    noises = rng.normal(size=(N_STEPS, B, C, SIZE, SIZE)).astype(np.float32)

    # ---- reference: UNet + GaussianDiffusion, Adam, no clipping ----
    torch.manual_seed(0)
    tmodel = ref_mod.Unet(dim=DIM, dim_mults=MULTS, channels=C,
                          resnet_block_groups=GROUPS)
    tdiff = ref_mod.GaussianDiffusion(
        tmodel, image_size=SIZE, timesteps=T, loss_type="l2",
        beta_schedule="cosine", auto_normalize=False,
    )
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    opt = torch.optim.Adam(tdiff.parameters(), lr=LR)
    tdiff.train()
    loss_ref = []
    for i in range(N_STEPS):
        loss = tdiff.p_losses(
            torch.from_numpy(xs[i]), torch.from_numpy(ts[i]),
            noise=torch.from_numpy(noises[i]),
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        loss_ref.append(float(loss.detach()))

    # ---- nfdpm_tpu: imported weights, same injected draws ----
    import jax
    import jax.numpy as jnp
    import optax

    from nfdpm_tpu.models.diffusion import DiffusionConfig, GaussianDiffusion
    from nfdpm_tpu.models.unet import Unet
    from nfdpm_tpu.utils.unet_import import import_unet_state_dict

    junet = Unet(dim=DIM, dim_mults=MULTS, channels=C, resnet_block_groups=GROUPS)
    params = import_unet_state_dict(sd, len(MULTS))
    jdiff = GaussianDiffusion(
        lambda p, x, t, sc: junet.apply({"params": p}, x, t, sc),
        DiffusionConfig(image_size=SIZE, channels=C, timesteps=T,
                        loss_type="l2", beta_schedule="cosine",
                        auto_normalize=False),
    )
    tx = optax.adam(LR)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, t, noise):
        def loss_fn(p):
            return jdiff.p_losses(p, jax.random.PRNGKey(0), x, t, noise=noise)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss_jax = []
    for i in range(N_STEPS):
        x = jnp.asarray(xs[i].transpose(0, 2, 3, 1))
        noise = jnp.asarray(noises[i].transpose(0, 2, 3, 1))
        params, opt_state, loss = step(params, opt_state, x,
                                       jnp.asarray(ts[i]), noise)
        loss_jax.append(float(loss))

    return np.asarray(loss_ref), np.asarray(loss_jax)


def test_loss_curve_tracks_stepwise(trajectories):
    loss_ref, loss_jax = trajectories
    err = np.abs(loss_ref[:TRACK_STEPS] - loss_jax[:TRACK_STEPS])
    rel = err / np.maximum(np.abs(loss_ref[:TRACK_STEPS]), 1e-3)
    assert rel.max() < 1e-2, (
        f"per-step loss rel-error {rel.max():.2e} at step {rel.argmax()}"
    )


def test_loss_curve_end_within_noise(trajectories):
    loss_ref, loss_jax = trajectories
    tail_ref, tail_jax = loss_ref[-10:].mean(), loss_jax[-10:].mean()
    assert abs(tail_ref - tail_jax) / tail_ref < 5e-2, (
        f"final loss diverged: ref {tail_ref:.5f} vs jax {tail_jax:.5f}"
    )
    # both optimized: loss dropped the same way
    drop_ref = loss_ref[0] - tail_ref
    drop_jax = loss_jax[0] - tail_jax
    assert drop_ref > 0 and drop_jax > 0
    assert abs(drop_ref - drop_jax) / max(drop_ref, 1e-6) < 0.1
