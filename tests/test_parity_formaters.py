"""CatFormater parity vs the reference implementation: identical
process_latents output (channel ordering of the squeezed/unsqueezed concat)
on the same latent parts."""

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


@pytest.fixture(scope="module")
def ref_formaters():
    import importlib.util

    # the reference module imports calculate_output_shapes from its own
    # package (which pulls aim etc.); provide an equivalent stub
    from nfdpm_tpu.models.glow import GlowConfig, latent_shapes_chw

    nf_stub = types.ModuleType("normalizing_flow")
    nf_stub.calculate_output_shapes = lambda L, in_channels, size: [
        list(t) for t in latent_shapes_chw(
            GlowConfig(in_channels=in_channels, levels=L, steps=1), size)
    ]
    sys.modules.setdefault("normalizing_flow", nf_stub)

    spec = importlib.util.spec_from_file_location(
        "ref_formaters", os.path.join(REF, "diffusion_prior", "latent_formaters.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_formaters"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("L,size", [(2, 32), (3, 32), (4, 64), (5, 128)])
def test_cat_formater_process_matches_reference(ref_formaters, L, size):
    import jax.numpy as jnp

    from nfdpm_tpu.models.formaters import CatFormater

    C = 3
    ref_f = ref_formaters.CatFormater(L, C, size)
    my_f = CatFormater(L=L, in_channels=C, size=size)

    rng = np.random.default_rng(L)
    # reference latent_dims are CHW lists
    parts_chw = [rng.normal(size=(2, c, h, w)).astype(np.float32)
                 for (c, h, w) in [tuple(d) for d in ref_f.latent_dims]]

    ref_out = ref_f.process_latents([torch.from_numpy(p) for p in parts_chw])
    assert len(ref_out) == 1
    ref_cat = ref_out[0].numpy()  # [B, C_cat, H, W]

    parts_nhwc = [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in parts_chw]
    my_out = my_f.process_latents(parts_nhwc)
    assert len(my_out) == 1
    my_cat = np.asarray(my_out[0]).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(my_cat, ref_cat, atol=1e-6)

    # and our postprocess inverts the REFERENCE's concat too
    back = my_f.postprocess([jnp.asarray(ref_cat.transpose(0, 2, 3, 1))])
    for b, orig in zip(back, parts_chw):
        np.testing.assert_allclose(
            np.asarray(b).transpose(0, 3, 1, 2), orig, atol=1e-6
        )
