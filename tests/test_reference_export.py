"""Export direction: nfdpm_tpu weights -> reference torch checkpoints.

utils/reference_export.py must be (a) the exact inverse of
utils/reference_import.py and (b) strict-loadable + numerically identical
inside the unmodified reference modules (/root/reference) — the handoff
guarantee in BOTH directions. The CLI (tools/export_reference_checkpoint.py)
is smoke-tested against a real run directory.
"""

import os
import sys

import jax
import numpy as np
import pytest

from nfdpm_tpu.models import glow as glow_m
from nfdpm_tpu.ops.bijectors import invconv_weight
from nfdpm_tpu.utils.reference_export import (
    adam_skeleton,
    export_gaussian_prior_state_dict,
    export_glow_state_dict,
)
from nfdpm_tpu.utils.reference_import import (
    import_gaussian_prior_state_dict,
    import_glow_state_dict,
)

REF = "/root/reference"


def _perturbed_params(cfg, seed=0):
    """Random-ish Glow params: init then perturb every leaf EXCEPT the PLU
    sign (+-1 constraint) so the export exercises nontrivial values."""
    params = glow_m.init_glow(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)

    def bump(path, a):
        a = np.asarray(a, np.float32)
        if any(getattr(p, "key", None) == "sign" for p in path):
            return a
        return a + rng.normal(scale=0.05, size=a.shape).astype(np.float32)

    return jax.tree_util.tree_map_with_path(bump, params)


class TestRoundTrip:
    @pytest.mark.parametrize("invconv_param", ["plu", "full"])
    def test_export_import_identity(self, invconv_param):
        cfg = glow_m.GlowConfig(in_channels=3, levels=3, steps=2,
                                coupling_width=24,
                                invconv_param=invconv_param)
        params = _perturbed_params(cfg)
        sd = export_glow_state_dict(params["flow"] if "flow" in params
                                    else params, cfg.levels, cfg.steps)
        back = import_glow_state_dict(sd, cfg.levels, cfg.steps,
                                      invconv_param=invconv_param)

        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
        # PLU factors may re-permute through the W -> PLU -> W cycle; the
        # invariant is the reassembled weight. Compare invconv via weight,
        # everything else leafwise.
        for path, a in flat_a:
            keystr = jax.tree_util.keystr(path)
            if "invconv" in keystr:
                continue
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(flat_b[path]), atol=1e-6,
                err_msg=keystr)

        def each_invconv(tree):
            for b in tree["blocks"]:
                yield b["steps"]["invconv"]
            yield tree["final_steps"]["invconv"]

        for inv_a, inv_b in zip(each_invconv(params), each_invconv(back)):
            for k in range(cfg.steps):
                wa = invconv_weight(jax.tree.map(lambda x: x[k], inv_a))
                wb = invconv_weight(jax.tree.map(lambda x: x[k], inv_b))
                np.testing.assert_allclose(np.asarray(wa), np.asarray(wb),
                                           atol=1e-5)

    def test_prior_roundtrip(self):
        prior = {
            "bias": np.random.default_rng(1).normal(size=32).astype(np.float32),
            "logs": np.random.default_rng(2).normal(size=32).astype(np.float32),
        }
        sd = export_gaussian_prior_state_dict(prior)
        back = import_gaussian_prior_state_dict(sd)
        np.testing.assert_allclose(back["bias"], prior["bias"], atol=0)
        np.testing.assert_allclose(back["logs"], prior["logs"], atol=0)

    def test_learn_prior_false_refuses(self):
        cfg = glow_m.GlowConfig(in_channels=3, levels=2, steps=1,
                                coupling_width=8, learn_prior=False)
        params = glow_m.init_glow(jax.random.PRNGKey(0), cfg)
        if params["blocks"][0]["split"]["conv"] is not None:
            pytest.skip("learn_prior=False keeps a split conv in this build")
        with pytest.raises(ValueError):
            export_glow_state_dict(params, cfg.levels, cfg.steps)


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "normalizing_flow")),
                    reason="reference repo not mounted")
class TestLoadsIntoReference:
    @pytest.fixture(scope="class")
    def ref_modules(self):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"))
        from measure_reference_baseline import (
            _load_reference_glow,
            _stub_external_modules,
        )

        _stub_external_modules()
        glow_mod = _load_reference_glow(REF)
        return torch, glow_mod, sys.modules["nf_ref.prior"]

    def test_strict_load_and_forward_parity(self, ref_modules):
        torch, glow_ref, prior_ref = ref_modules
        L, K, C, size, B = 3, 2, 3, 16, 4
        cfg = glow_m.GlowConfig(in_channels=C, levels=L, steps=K,
                                invconv_param="full")
        params = _perturbed_params(cfg, seed=3)
        flow_sd = export_glow_state_dict(params, L, K)
        prior_np = {
            "bias": np.random.default_rng(4).normal(
                scale=0.05, size=2 * 2 ** (L + 1) * C).astype(np.float32),
            "logs": np.random.default_rng(5).normal(
                scale=0.05, size=2 * 2 ** (L + 1) * C).astype(np.float32),
        }
        prior_sd = export_gaussian_prior_state_dict(prior_np)

        model = glow_ref.Glow(in_channel=C, L=L, K=K)
        model.load_state_dict(  # strict=True is the default — key-exact
            {k: torch.from_numpy(v.copy()) for k, v in flow_sd.items()})
        model.eval()
        gp = prior_ref.GaussianPrior(2 ** (L + 1) * C)
        gp.load_state_dict(
            {k: torch.from_numpy(v.copy()) for k, v in prior_sd.items()})

        # optimizer skeleton loads over flow.parameters() (trainer.py:109)
        opt = torch.optim.Adam(model.parameters(), lr=1e-4)
        opt.load_state_dict(adam_skeleton(flow_sd, 1e-4))

        x_t = torch.rand(B, C, size, size) - 0.5
        with torch.no_grad():
            # is_initialized was exported as 1 => the reference must NOT
            # re-run actnorm ddinit on this first forward
            latents_t, ldj_t, logp_t = model.transform(
                x_t, torch.zeros(B, dtype=torch.float64),
                torch.zeros(B, dtype=torch.float64))
            logp_t = logp_t + gp.compute_log_prob(latents_t[-1]).double()

        import jax.numpy as jnp

        from nfdpm_tpu.models import prior as prior_m

        x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
        latents, ldj, logp = glow_m.forward(params, cfg, x_j)
        logp = logp + prior_m.gaussian_prior_logp(prior_np, latents[-1])

        for z_j, z_t in zip(latents, latents_t):
            np.testing.assert_allclose(
                np.asarray(z_j), z_t.numpy().transpose(0, 2, 3, 1),
                atol=2e-4, rtol=1e-4)
        ll_ref = (ldj_t + logp_t).numpy()
        ll_jax = np.asarray(ldj + logp, np.float64)
        bpd_err = np.abs(ll_jax - ll_ref) * np.log2(np.e) / (size * size * 3.0)
        assert bpd_err.max() < 1e-3, f"bits/dim error {bpd_err.max()}"


def test_cli_smoke(tmp_path):
    torch = pytest.importorskip("torch")
    from nfdpm_tpu.training import nf_trainer as nft
    from nfdpm_tpu.training.checkpoint import save_architecture, save_state
    from nfdpm_tpu.training.optim import make_optimizer

    cfg = glow_m.GlowConfig(in_channels=3, levels=2, steps=1,
                            coupling_width=16)
    tcfg = nft.NFTrainConfig()
    tx = make_optimizer("adam", 1e-3, fixed_prior=tcfg.compat_fixed_prior)
    state = nft.init_train_state(0, cfg, tcfg, tx)
    save_state(str(tmp_path), "gaussian", 1, state)
    save_architecture(str(tmp_path), {
        "L": 2, "K": 1, "in_channels": 3, "img_size": 8,
        "coupling_width": 16, "learn_prior": True, "n_bits": 5,
        "fixed_prior": True, "temperature": 0.7, "optimizer": "adam",
        "invconv_param": "plu",
    })
    from tools.export_reference_checkpoint import main

    out = os.path.join(str(tmp_path), "exp")
    main(["--run-dir", str(tmp_path), "--out", out])
    ckpt = torch.load(os.path.join(out, "model_gaussian_001.pt"),
                      map_location="cpu", weights_only=False)
    assert set(ckpt) == {"flow", "prior_dist", "optimizer", "current_iter"}
    assert any(k.startswith("blocks.0.flows.0.") for k in ckpt["flow"])
