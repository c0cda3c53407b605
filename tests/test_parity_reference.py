"""Numerical parity vs the PyTorch reference on identical weights+inputs.

Loads the reference Glow from /root/reference (read-only), imports its
state into nfdpm_tpu trees via utils.reference_import, and checks:
  * latent parts match elementwise,
  * total log-likelihood (ldj + split logp + final-prior logp) matches
    within the SURVEY §6 target (bits/dim within 1e-3),
  * inverse reconstruction matches.
Skipped when /root/reference or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "normalizing_flow")),
    reason="reference repo not mounted",
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from measure_reference_baseline import _load_reference_glow, _stub_external_modules

    _stub_external_modules()
    glow_mod = _load_reference_glow(REF)
    prior_mod = sys.modules["nf_ref.prior"]
    return glow_mod, prior_mod


@pytest.fixture(scope="module")
def parity_setup(ref_modules):
    glow_ref, prior_ref = ref_modules
    torch.manual_seed(0)
    L, K, C, size, B = 3, 2, 3, 16, 4
    model = glow_ref.Glow(in_channel=C, L=L, K=K)
    model.eval()
    gp = prior_ref.GaussianPrior(2 ** (L + 1) * C)
    # nontrivial prior params
    with torch.no_grad():
        for name, p in gp.state_dict().items():
            if name.endswith("bias") or name.endswith("logs"):
                p.add_(torch.randn_like(p) * 0.05)

    x = torch.rand(B, C, size, size) - 0.5
    with torch.no_grad():
        model.transform(x, torch.zeros(B), torch.zeros(B))  # actnorm ddinit
        latents_t, ldj_t, logp_t = model.transform(
            x, torch.zeros(B, dtype=torch.float64), torch.zeros(B, dtype=torch.float64)
        )
        logp_t = logp_t + gp.compute_log_prob(latents_t[-1]).double()
        inv_t = model.invert(latents_t)

    return {
        "model": model, "gp": gp, "L": L, "K": K, "C": C, "size": size,
        "x": x, "latents_t": latents_t, "ldj_t": ldj_t, "logp_t": logp_t,
        "inv_t": inv_t,
    }


def _to_nhwc(t):
    return np.asarray(t.detach().numpy()).transpose(0, 2, 3, 1)


def test_forward_parity(parity_setup):
    import jax.numpy as jnp

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.models import prior as prior_m
    from nfdpm_tpu.utils.reference_import import (
        import_gaussian_prior_state_dict,
        import_glow_state_dict,
    )

    s = parity_setup
    cfg = glow_m.GlowConfig(in_channels=s["C"], levels=s["L"], steps=s["K"])
    params = import_glow_state_dict(s["model"].state_dict(), s["L"], s["K"])
    prior_params = import_gaussian_prior_state_dict(s["gp"].state_dict())

    x = jnp.asarray(_to_nhwc(s["x"]))
    latents, ldj, logp = glow_m.forward(params, cfg, x)
    logp = logp + prior_m.gaussian_prior_logp(prior_params, latents[-1])

    # latent parts match elementwise
    for z_j, z_t in zip(latents, s["latents_t"]):
        np.testing.assert_allclose(
            np.asarray(z_j), _to_nhwc(z_t), atol=2e-4, rtol=1e-4
        )

    # total log-likelihood parity: tolerance scaled to bits/dim 1e-3
    ll_ref = (s["ldj_t"] + s["logp_t"]).numpy()
    ll_jax = np.asarray(ldj + logp, np.float64)
    n_pixel = s["size"] * s["size"] * 3.0
    bpd_err = np.abs(ll_jax - ll_ref) * np.log2(np.e) / n_pixel
    assert bpd_err.max() < 1e-3, f"bits/dim error {bpd_err.max()}"


def test_inverse_parity(parity_setup):
    import jax.numpy as jnp

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.utils.reference_import import import_glow_state_dict

    s = parity_setup
    cfg = glow_m.GlowConfig(in_channels=s["C"], levels=s["L"], steps=s["K"])
    params = import_glow_state_dict(s["model"].state_dict(), s["L"], s["K"])
    latents = [jnp.asarray(_to_nhwc(z)) for z in s["latents_t"]]
    inv = glow_m.inverse(params, cfg, latents)
    np.testing.assert_allclose(np.asarray(inv), _to_nhwc(s["inv_t"]),
                               atol=5e-4, rtol=1e-3)
    # and we reconstruct the original input
    np.testing.assert_allclose(np.asarray(inv), _to_nhwc(s["x"]), atol=2e-3)


def test_preprocess_parity(parity_setup, ref_modules):
    """5-bit preprocess/postprocess matches the reference formulas on a
    shared random batch."""
    import jax.numpy as jnp

    from nfdpm_tpu.ops import quantize as q

    utils_ref = sys.modules["nf_ref.utils"]
    img = torch.rand(2, 3, 8, 8)
    ref_pre = utils_ref.preprocess_batch(img, 5, 32.0)
    jax_pre = q.preprocess(jnp.asarray(img.numpy().transpose(0, 2, 3, 1)), 5)
    np.testing.assert_allclose(
        np.asarray(jax_pre), ref_pre.numpy().transpose(0, 2, 3, 1), atol=1e-6
    )
    ref_post = utils_ref.postprocess_batch(ref_pre, 32.0)
    jax_post = q.postprocess(jax_pre, 5)
    np.testing.assert_array_equal(
        np.asarray(jax_post), ref_post.numpy().transpose(0, 2, 3, 1)
    )


def test_gradient_parity(parity_setup):
    """d(BPD)/d(theta) matches torch autograd on identical weights+input for
    the shared parameterization leaves (actnorm, coupling convs, split/prior
    zero-convs). PLU leaves are excluded (different parameterization of the
    same function)."""
    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.models import prior as prior_m
    from nfdpm_tpu.utils.reference_import import (
        import_gaussian_prior_state_dict,
        import_glow_state_dict,
    )

    s = parity_setup
    model, gp = s["model"], s["gp"]
    n_pixel = s["size"] * s["size"] * 3.0
    n_bins = 32.0

    # torch grads
    model.zero_grad()
    for p in gp.parameters():
        if p.grad is not None:
            p.grad = None
    B = s["x"].shape[0]
    latents_t, ldj_t, logp_t = model.transform(
        s["x"], torch.zeros(B), torch.zeros(B)
    )
    logp_t = logp_t + gp.compute_log_prob(latents_t[-1])
    ll = ldj_t + logp_t
    bpd_t = ((np.log(n_bins) * n_pixel - ll) * (np.log2(np.e) / n_pixel)).mean()
    bpd_t.backward()

    # jax grads
    cfg = glow_m.GlowConfig(in_channels=s["C"], levels=s["L"], steps=s["K"])
    params = {
        "flow": import_glow_state_dict(model.state_dict(), s["L"], s["K"]),
        "prior": import_gaussian_prior_state_dict(gp.state_dict()),
    }
    x = jnp.asarray(_to_nhwc(s["x"]))

    def loss_fn(params):
        latents, ldj, logp = glow_m.forward(params["flow"], cfg, x)
        logp = logp + prior_m.gaussian_prior_logp(params["prior"], latents[-1])
        return prior_m.bits_per_dim(ldj + logp, n_bins, n_pixel)

    bpd_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(bpd_j), float(bpd_t.detach()), rtol=1e-4)

    named_t = dict(model.named_parameters())

    def tgrad(name):
        return named_t[name].grad.detach().numpy()

    # actnorm of first step in first block (stacked axis 0 -> step k)
    an = grads["flow"]["blocks"][0]["steps"]["actnorm"]
    for k in range(s["K"]):
        np.testing.assert_allclose(
            np.asarray(an["scale"])[k],
            tgrad(f"blocks.0.flows.{k}.actnorm.scale").reshape(-1),
            rtol=2e-2, atol=1e-5,
        )
    # coupling conv1 kernel of final step 0 (OIHW -> HWIO)
    cw = np.asarray(grads["flow"]["final_steps"]["coupling"]["net"]["conv1"]["w"])[0]
    ref_g = tgrad("final_flows.0.affcoupling.net.0._Conv2dActNorm__conv.weight")
    np.testing.assert_allclose(cw, ref_g.transpose(2, 3, 1, 0), rtol=2e-2, atol=1e-5)
    # split zero-conv logs of block 0
    zl = np.asarray(grads["flow"]["blocks"][0]["split"]["conv"]["logs"])
    np.testing.assert_allclose(
        zl, tgrad("blocks.0.split.conv.logs").reshape(-1), rtol=2e-2, atol=1e-5
    )
    # final-prior (bias, logs): the reference conv's bias/logs
    gp_named = dict(gp.named_parameters())
    gb = [v for k, v in gp_named.items() if k.endswith("bias")][0].grad.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(grads["prior"]["bias"]), gb.reshape(-1), rtol=2e-2, atol=1e-5
    )


def test_split_prior_sampling_parity(parity_setup):
    """Glow.invert given ONLY the final latent: per-level split priors supply
    the missing parts. With noise patched to zero on both sides the sampled
    parts equal the learned prior means, exercising the full sample-on-invert
    plumbing (transforms.py:305-307). Split convs are randomized first so the
    means are nontrivial.

    NOTE: mutates the module-scoped fixture's split convs — keep this the
    LAST test in the file."""
    import unittest.mock as mock

    import jax
    import jax.numpy as jnp

    from nfdpm_tpu.models import glow as glow_m
    from nfdpm_tpu.utils.reference_import import import_glow_state_dict

    s = parity_setup
    model = s["model"]
    # randomize split-prior convs (zero-init by default => trivial means)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if ".split.conv." in name:
                p.add_(torch.randn_like(p) * 0.1)

    cfg = glow_m.GlowConfig(in_channels=s["C"], levels=s["L"], steps=s["K"])
    params = import_glow_state_dict(model.state_dict(), s["L"], s["K"])
    z_last_t = s["latents_t"][-1]

    with mock.patch.object(torch.Tensor, "normal_", lambda self, *a, **k: self.zero_()):
        with torch.no_grad():
            ref = model.invert([z_last_t], temperature=0.7)

    with mock.patch.object(jax.random, "normal",
                           lambda key, shape=(), dtype=jnp.float32:
                           jnp.zeros(shape, dtype)):
        got = glow_m.inverse(params, cfg, [jnp.asarray(_to_nhwc(z_last_t))],
                             key=jax.random.PRNGKey(0), temperature=0.7)

    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref),
                               rtol=1e-3, atol=5e-4)
