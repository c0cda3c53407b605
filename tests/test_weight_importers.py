"""Weight-importer validation against the canonical torch key inventories
(VERDICT round-1 item #2a).

No real weights exist in this zero-egress environment, so the riskiest part
of the FID pipeline — the ~60-line name/layout mapping from clean-fid's
pt_inception .pth and OpenAI CLIP's state dict into our flax trees — is
validated structurally: synthesize a state dict with EXACTLY the canonical
key names (hand-written module inventory below, independently transcribed
from pytorch-fid's FIDInceptionV3 / torchvision inception_v3 and OpenAI
CLIP's VisionTransformer), fill every tensor with a unique fingerprint value,
run the strict importer, and assert

  * every flax leaf received its fingerprint (nothing silently skipped and
    nothing mis-routed),
  * every canonical torch key was consumed or is in the documented unused
    set (fc / AuxLogits / num_batches_tracked / text tower),
  * a misnamed or missing key makes the strict importer raise.

Once real weights are supplied, tools/validate_fid_weights.py bit-compares
features against clean-fid's published protocol (VERDICT item #2b).
"""

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Canonical pt_inception module inventory (pytorch-fid FIDInceptionV3 ==
# torchvision inception_v3 naming; clean-fid downloads the same .pth).
# ---------------------------------------------------------------------------

_A = ["branch1x1", "branch5x5_1", "branch5x5_2",
      "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
_B = ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]
_C = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
      "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3", "branch7x7dbl_4",
      "branch7x7dbl_5", "branch_pool"]
_D = ["branch3x3_1", "branch3x3_2",
      "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"]
_E = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
      "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a", "branch3x3dbl_3b",
      "branch_pool"]

INCEPTION_CONV_UNITS = (
    ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
     "Conv2d_3b_1x1", "Conv2d_4a_3x3"]
    + [f"{m}.{b}" for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d") for b in _A]
    + [f"Mixed_6a.{b}" for b in _B]
    + [f"{m}.{b}" for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e")
       for b in _C]
    + [f"Mixed_7a.{b}" for b in _D]
    + [f"{m}.{b}" for m in ("Mixed_7b", "Mixed_7c") for b in _E]
)

# present in the .pth but legitimately unused by the pooled-feature extractor
INCEPTION_UNUSED_UNITS = ["AuxLogits.conv0", "AuxLogits.conv1"]


def _inception_fake_sd():
    """Canonical-key state dict; every tensor filled with a distinct value.
    Shapes for mapped tensors are taken from the flax tree via the inverse
    layout map (the importer itself asserts shape equality on assignment)."""
    from nfdpm_tpu.metrics import inception

    flax = inception.random_params()

    def leaf(dotted_unit, *names):
        node = flax
        for p in list(dotted_unit.split(".")) + list(names):
            node = node[p]
        return np.asarray(node)

    sd = {}
    fp = [1.0]

    def add(key, shape):
        fp[0] += 1.0
        sd[key] = np.full(shape, fp[0], np.float32)

    for unit in INCEPTION_CONV_UNITS:
        hwio = leaf(unit, "conv", "kernel").shape
        add(f"{unit}.conv.weight", (hwio[3], hwio[2], hwio[0], hwio[1]))
        c = leaf(unit, "bn_gamma").shape
        for tname in ("weight", "bias", "running_mean", "running_var"):
            add(f"{unit}.bn.{tname}", c)
        sd[f"{unit}.bn.num_batches_tracked"] = np.zeros((), np.int64)
    for unit in INCEPTION_UNUSED_UNITS:
        add(f"{unit}.conv.weight", (8, 8, 1, 1))
        for tname in ("weight", "bias", "running_mean", "running_var"):
            add(f"{unit}.bn.{tname}", (8,))
        sd[f"{unit}.bn.num_batches_tracked"] = np.zeros((), np.int64)
    add("AuxLogits.fc.weight", (1008, 768))
    add("AuxLogits.fc.bias", (1008,))
    add("fc.weight", (1008, 2048))
    add("fc.bias", (1008,))
    return sd


class TestInceptionImporter:
    def test_every_leaf_assigned_and_every_key_consumed(self):
        from nfdpm_tpu.metrics import inception

        sd = _inception_fake_sd()
        params = inception.import_state_dict(sd, strict=True)

        # every flax leaf carries a fingerprint (constant-filled), i.e. was
        # overwritten by exactly the right torch tensor
        import jax

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            dotted = ".".join(getattr(p, "key", str(p)) for p in path)
            u = np.unique(np.asarray(leaf))
            assert u.size == 1 and u[0] > 1.0, (
                f"leaf {dotted} not overwritten by the importer (values {u[:3]})"
            )

        # conv layout: torch OIHW -> flax HWIO round-trips elementwise
        w = sd["Conv2d_1a_3x3.conv.weight"]
        np.testing.assert_array_equal(
            np.asarray(params["Conv2d_1a_3x3"]["conv"]["kernel"]),
            w.transpose(2, 3, 1, 0),
        )

    def test_strict_raises_on_missing_unit(self):
        from nfdpm_tpu.metrics import inception

        sd = _inception_fake_sd()
        for k in list(sd):
            if k.startswith("Mixed_7c.branch_pool."):
                del sd[k]
        with pytest.raises(ValueError, match="never assigned"):
            inception.import_state_dict(sd, strict=True)

    def test_strict_raises_on_unknown_key(self):
        from nfdpm_tpu.metrics import inception

        sd = _inception_fake_sd()
        sd["Mixed_9z.branchZ.weight"] = np.zeros((3, 3), np.float32)
        with pytest.raises(ValueError, match="unmapped"):
            inception.import_state_dict(sd, strict=True)

    def test_non_strict_tolerates_feature_only_checkpoints(self):
        from nfdpm_tpu.metrics import inception

        sd = _inception_fake_sd()
        del sd["fc.weight"], sd["fc.bias"]
        inception.import_state_dict(sd, strict=False)  # no raise


class TestInceptionOracleCrossCheck:
    """Executable-torch-semantics validation of the importer's layout mapping
    (VERDICT r2 item 9 dry run): randomize the bundled pure-torch FID
    Inception mirror, import its state_dict into the flax tree, and demand
    numerically identical features. Once real weights exist,
    tools/validate_fid_weights.py runs this exact comparison against them
    with no cleanfid/pytorch_fid installed."""

    def test_random_weight_feature_parity(self):
        torch = pytest.importorskip("torch")

        from nfdpm_tpu.metrics import inception, torch_inception

        net = torch_inception.build_feature_model()
        gen = torch.Generator().manual_seed(0)
        sd = net.state_dict()
        with torch.no_grad():
            for k, v in sd.items():
                if k.endswith("num_batches_tracked"):
                    continue
                if k.endswith("running_var"):
                    v.uniform_(0.5, 1.5, generator=gen)
                elif k.endswith((".bn.weight",)):
                    v.uniform_(0.8, 1.2, generator=gen)
                elif k.endswith(("running_mean", ".bn.bias")):
                    v.normal_(0.0, 0.05, generator=gen)
                else:  # conv kernels
                    v.normal_(0.0, 0.05, generator=gen)
        net.load_state_dict(sd)

        params = inception.import_state_dict(
            {k: v.numpy() for k, v in sd.items()}, strict=True)
        feature_fn = inception.make_feature_fn(params)

        imgs = np.random.default_rng(0).integers(
            0, 256, (2, 299, 299, 3)).astype(np.uint8)
        ours = np.asarray(feature_fn(imgs))
        theirs = torch_inception.features_u8(net, imgs)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# OpenAI CLIP ViT-B/32 canonical keys (CLIP.visual VisionTransformer)
# ---------------------------------------------------------------------------

def _clip_fake_sd():
    width, out_dim, layers, grid = 768, 512, 12, 7 * 7

    sd = {}
    fp = [1.0]

    def add(key, shape):
        fp[0] += 1.0
        sd[key] = np.full(shape, fp[0], np.float32)

    add("visual.conv1.weight", (width, 3, 32, 32))
    add("visual.class_embedding", (width,))
    add("visual.positional_embedding", (grid + 1, width))
    add("visual.ln_pre.weight", (width,))
    add("visual.ln_pre.bias", (width,))
    for i in range(layers):
        pre = f"visual.transformer.resblocks.{i}"
        add(f"{pre}.attn.in_proj_weight", (3 * width, width))
        add(f"{pre}.attn.in_proj_bias", (3 * width,))
        add(f"{pre}.attn.out_proj.weight", (width, width))
        add(f"{pre}.attn.out_proj.bias", (width,))
        add(f"{pre}.ln_1.weight", (width,))
        add(f"{pre}.ln_1.bias", (width,))
        add(f"{pre}.mlp.c_fc.weight", (4 * width, width))
        add(f"{pre}.mlp.c_fc.bias", (4 * width,))
        add(f"{pre}.mlp.c_proj.weight", (width, 4 * width))
        add(f"{pre}.mlp.c_proj.bias", (width,))
        add(f"{pre}.ln_2.weight", (width,))
        add(f"{pre}.ln_2.bias", (width,))
    add("visual.ln_post.weight", (width,))
    add("visual.ln_post.bias", (width,))
    add("visual.proj", (width, out_dim))
    # text tower (ignored by the visual importer, present in the real file)
    add("token_embedding.weight", (49408, 512))
    add("positional_embedding", (77, 512))
    add("ln_final.weight", (512,))
    add("ln_final.bias", (512,))
    add("text_projection", (512, 512))
    add("logit_scale", ())
    return sd


class TestClipImporter:
    def test_every_leaf_assigned_and_every_visual_key_consumed(self):
        import jax

        from nfdpm_tpu.metrics import clip_features

        sd = _clip_fake_sd()
        params = clip_features.import_state_dict(sd, strict=True)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            dotted = ".".join(getattr(p, "key", str(p)) for p in path)
            u = np.unique(np.asarray(leaf))
            assert u.size == 1 and u[0] > 1.0, f"leaf {dotted} not overwritten"

        # linear layout: torch [out, in] -> flax [in, out]
        np.testing.assert_array_equal(
            np.asarray(params["block_0"]["mlp_fc"]["kernel"]),
            sd["visual.transformer.resblocks.0.mlp.c_fc.weight"].T,
        )

    def test_strict_raises_on_leftover_visual_key(self):
        from nfdpm_tpu.metrics import clip_features

        sd = _clip_fake_sd()
        sd["visual.unexpected_thing"] = np.zeros((3,), np.float32)
        with pytest.raises(ValueError, match="unconsumed"):
            clip_features.import_state_dict(sd, strict=True)

    def test_strict_raises_on_missing_block(self):
        from nfdpm_tpu.metrics import clip_features

        sd = _clip_fake_sd()
        # drop block 11 entirely -> resblock count mismatch
        sd = {k: v for k, v in sd.items()
              if not k.startswith("visual.transformer.resblocks.11.")}
        with pytest.raises(ValueError, match="resblocks"):
            clip_features.import_state_dict(sd, strict=True)


class TestClipOracleCrossCheck:
    """Executable-torch validation of the CLIP importer's qkv in_proj /
    out_proj / projection transposes (VERDICT r2 item 9 dry run): randomize
    the bundled pure-torch ViT visual tower, import its state_dict, demand
    identical L2-normalized features. A 2-layer width-64 tower keeps the
    1-core CPU run fast; the mapping code paths are identical at B/32 scale."""

    def test_random_weight_feature_parity(self):
        torch = pytest.importorskip("torch")
        import jax

        from nfdpm_tpu.metrics import clip_features, torch_clip

        net = torch_clip.build_visual_model(
            patch=16, width=64, layers=2, heads=4, out_dim=32, image_size=64)
        torch.manual_seed(0)
        sd = {"visual." + k: v for k, v in net.state_dict().items()}

        model = clip_features.CLIPVisual(
            patch=16, width=64, layers=2, heads=4, out_dim=32, image_size=64)
        template = model.init(jax.random.PRNGKey(0),
                              np.zeros((1, 64, 64, 3), np.float32))["params"]
        params = clip_features.import_state_dict(
            {k: v.numpy() for k, v in sd.items()}, strict=True,
            model=model, template=template)

        imgs = np.random.default_rng(1).integers(
            0, 256, (2, 64, 64, 3)).astype(np.uint8)

        @jax.jit
        def feature_fn(imgs_u8):
            import jax.numpy as jnp

            x = imgs_u8.astype(jnp.float32) / 255.0
            x = (x - clip_features.CLIP_MEAN) / clip_features.CLIP_STD
            f = model.apply({"params": params}, x)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        ours = np.asarray(feature_fn(imgs))
        theirs = torch_clip.features_u8(net, imgs)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)
