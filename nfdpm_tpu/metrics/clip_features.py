"""CLIP ViT-B/32 image-feature extractor, NHWC flax.

On-device JAX counterpart of clean-fid's "clip_vit_b_32" feature model
(reference usage: /root/reference/metrics/compute.py:47,117-127,219-222 —
CelebA images are resized to 224 for CLIP features). Architecture: the CLIP
visual transformer (patch 32, width 768, 12 layers, 12 heads, 512-d
projection) with pre-LN blocks and quick-GELU, matching OpenAI CLIP.

Input: uint8 [B, 224, 224, 3]; pipeline applies the CLIP normalization
(mean 0.48145466/0.4578275/0.40821073, std 0.26862954/0.26130258/0.27577711).
Output: L2-normalized 512-d embeddings (cleanfid's CLIP_fx behavior).

Weights: `load_torch_weights(path)` imports an OpenAI CLIP / HF state dict
when available locally; otherwise deterministic random init (pipeline-exact,
values comparable only with real weights — no network in this environment).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MHA(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        qkv = nn.Dense(3 * C, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = C // self.heads

        def split_heads(t):
            return t.reshape(B, N, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(dh), axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        x = x + MHA(self.width, self.heads, name="attn")(nn.LayerNorm(name="ln_1")(x))
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_fc")(h)
        h = nn.Dense(self.width, name="mlp_proj")(quick_gelu(h))
        return x + h


class CLIPVisual(nn.Module):
    patch: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    out_dim: int = 512
    image_size: int = 224

    @nn.compact
    def __call__(self, x):
        # x: [B, 224, 224, 3] normalized
        B = x.shape[0]
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), use_bias=False,
                    padding="VALID", name="conv1")(x)
        grid = x.shape[1] * x.shape[2]
        x = x.reshape(B, grid, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (grid + 1, self.width))
        x = x + pos
        x = nn.LayerNorm(name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02), (self.width, self.out_dim))
        return x @ proj


@functools.lru_cache(maxsize=1)
def _model() -> CLIPVisual:
    return CLIPVisual()


def random_params(seed: int = 0):
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    return _model().init(jax.random.PRNGKey(seed), x)["params"]


def import_state_dict(sd, strict: bool = False, model: "CLIPVisual" = None,
                      template=None):
    """Map an OpenAI CLIP state dict (name -> ndarray; 'visual.'-prefixed
    keys; text-side keys ignored) onto the flax tree.

    `strict=True` (VERDICT round-1 item #2a) raises unless every 'visual.*'
    key was consumed and every flax leaf was assigned — no silently-skipped
    weights. `model`/`template` default to the ViT-B/32 production config;
    tests pass smaller towers to exercise the same mapping cheaply."""
    model = model if model is not None else _model()
    visual = {k[len("visual."):]: np.asarray(v) for k, v in sd.items()
              if k.startswith("visual.")}
    p = jax.tree.map(
        np.asarray, template if template is not None else random_params())
    consumed = set()

    def take(key):
        consumed.add(key)
        return visual[key]

    p["conv1"]["kernel"] = take("conv1.weight").transpose(2, 3, 1, 0)
    p["class_embedding"] = take("class_embedding")
    p["positional_embedding"] = take("positional_embedding")
    p["proj"] = take("proj")
    for ln in ("ln_pre", "ln_post"):
        p[ln]["scale"] = take(f"{ln}.weight")
        p[ln]["bias"] = take(f"{ln}.bias")
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in visual:
        blk = p[f"block_{i}"]
        pre = f"transformer.resblocks.{i}"
        blk["ln_1"]["scale"] = take(f"{pre}.ln_1.weight")
        blk["ln_1"]["bias"] = take(f"{pre}.ln_1.bias")
        blk["ln_2"]["scale"] = take(f"{pre}.ln_2.weight")
        blk["ln_2"]["bias"] = take(f"{pre}.ln_2.bias")
        blk["attn"]["in_proj"]["kernel"] = take(f"{pre}.attn.in_proj_weight").T
        blk["attn"]["in_proj"]["bias"] = take(f"{pre}.attn.in_proj_bias")
        blk["attn"]["out_proj"]["kernel"] = take(f"{pre}.attn.out_proj.weight").T
        blk["attn"]["out_proj"]["bias"] = take(f"{pre}.attn.out_proj.bias")
        blk["mlp_fc"]["kernel"] = take(f"{pre}.mlp.c_fc.weight").T
        blk["mlp_fc"]["bias"] = take(f"{pre}.mlp.c_fc.bias")
        blk["mlp_proj"]["kernel"] = take(f"{pre}.mlp.c_proj.weight").T
        blk["mlp_proj"]["bias"] = take(f"{pre}.mlp.c_proj.bias")
        i += 1

    if strict:
        if i != model.layers:
            raise ValueError(f"imported {i} resblocks, model has {model.layers}")
        leftover = set(visual) - consumed
        if leftover:
            raise ValueError(f"unconsumed visual.* keys: {sorted(leftover)[:10]}")
        # every assignment above writes a distinct flax leaf; count them
        n_leaves = len(jax.tree_util.tree_leaves(p))
        if len(consumed) != n_leaves:
            raise ValueError(f"assigned {len(consumed)} leaves, tree has {n_leaves}")
    return p


def load_torch_weights(path: str, strict: bool = True):
    """Import OpenAI CLIP 'visual.*' weights (jit archive or plain state
    dict) from a file into the flax tree."""
    import torch

    obj = torch.load(path, map_location="cpu")
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return import_state_dict(
        {k: v.float().numpy() for k, v in sd.items()}, strict=strict
    )


def make_feature_fn(params=None):
    """Returns a jitted fn: uint8-or-float [0,255] [B, 224, 224, 3] -> normalized [B, 512]."""
    if params is None:
        params = random_params()
    model = _model()

    @jax.jit
    def features(imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        x = (x - CLIP_MEAN) / CLIP_STD
        f = model.apply({"params": params}, x)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    return features
