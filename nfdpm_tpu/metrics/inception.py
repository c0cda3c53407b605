"""Inception-v3 feature extractor (clean-fid compatible), NHWC flax.

On-device JAX re-implementation of the FID Inception network clean-fid uses
(the TF "pt_inception-2015-12-05" port; reference integration at
/root/reference/metrics/compute.py:117-127 via cleanfid's feature extractor).
Architecture is torchvision InceptionV3 with the FID-specific pooling
variants (InceptionA/C/E_1 use count-exclude-pad average pooling; the final
InceptionE_2 uses max pooling in its pool branch).

Features: 2048-d global-average pool ("pool3"), computed from uint8 images
scaled to [-1, 1] ((x - 128) / 128, the TF-port convention).

Weights: `load_torch_weights(path)` imports the pt_inception .pth file into
the flax param tree when present (this environment has no network access and
ships no weights); otherwise `random_params` provides a deterministic
random-init network — the FID/KID *pipeline* is exact, absolute values are
only clean-fid-comparable once real weights are supplied.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv(nn.Module):
    """conv(bias-free) + BN(eps 1e-3, inference constants) + relu."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        x = nn.Conv(self.features, self.kernel, self.strides, padding=pad,
                    use_bias=False, name="conv")(x)
        # inference-only BN: y = (x - mean) * rsqrt(var + eps) * gamma + beta
        c = x.shape[-1]
        gamma = self.param("bn_gamma", nn.initializers.ones, (c,))
        beta = self.param("bn_beta", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
        return nn.relu(x)


def _avg_pool_nocountpad(x, window: int = 3):
    """3x3 stride-1 average pool, pad=1, count_include_pad=False (the FID
    Inception variant)."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return sum_ / cnt


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nocountpad(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nocountpad(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (E_1) or 'max' (E_2, the last block)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_nocountpad(x)
        else:
            bp = _max_pool(x, 3, 1, pad=1)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Full network up to the 2048-d pool3 features."""

    @nn.compact
    def __call__(self, x):
        # x: [B, 299, 299, 3] in [-1, 1]
        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # [B, 2048]


@functools.lru_cache(maxsize=1)
def _model() -> InceptionV3Features:
    return InceptionV3Features()


def random_params(seed: int = 0):
    """Deterministic random-init params (weights unavailable offline)."""
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    return _model().init(jax.random.PRNGKey(seed), x)["params"]


# Torch keys the feature extractor legitimately does not consume: the
# classifier head, the aux classifier (absent from the pooled-feature path),
# and BN bookkeeping counters.
_UNUSED_KEY_PREFIXES = ("fc.", "AuxLogits.")
_UNUSED_KEY_SUFFIXES = (".num_batches_tracked",)


def import_state_dict(sd, strict: bool = False):
    """Map a clean-fid pt_inception state dict (name -> ndarray) onto the
    flax tree.

    Mapping: torchvision module names match our flax module names; torch conv
    weights [O,I,kh,kw] -> HWIO; BN {weight,bias,running_mean,running_var} ->
    {bn_gamma, bn_beta, bn_mean, bn_var}.

    `strict=True` (VERDICT round-1 item #2a) raises unless EVERY flax leaf
    was assigned exactly once and every torch key was either consumed or in
    the documented unused set — no silently-skipped weights."""
    params = jax.tree.map(np.asarray, random_params())
    assigned = set()

    def assign(tree, dotted, value):
        node = tree
        parts = dotted.split("/")
        for p in parts[:-1]:
            node = node[p]
        if parts[-1] not in node:
            raise KeyError(f"no flax leaf for mapped torch key -> {dotted}")
        expected = node[parts[-1]].shape
        assert value.shape == expected, f"{dotted}: {value.shape} vs {expected}"
        node[parts[-1]] = value
        assigned.add(dotted)

    unconsumed = []
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        if len(parts) >= 2 and parts[-2] == "conv" and parts[-1] == "weight" \
                and not k.startswith(_UNUSED_KEY_PREFIXES):
            assign(params, "/".join(parts[:-2]) + "/conv/kernel",
                   v.transpose(2, 3, 1, 0))
        elif len(parts) >= 2 and parts[-2] == "bn" \
                and not k.startswith(_UNUSED_KEY_PREFIXES):
            name = {"weight": "bn_gamma", "bias": "bn_beta",
                    "running_mean": "bn_mean", "running_var": "bn_var"}.get(parts[-1])
            if name is None:
                unconsumed.append(k)
                continue
            assign(params, "/".join(parts[:-2]) + f"/{name}", v)
        else:
            unconsumed.append(k)

    if strict:
        unexpected = [
            k for k in unconsumed
            if not (k.startswith(_UNUSED_KEY_PREFIXES)
                    or k.endswith(_UNUSED_KEY_SUFFIXES))
        ]
        if unexpected:
            raise ValueError(f"unmapped torch keys: {sorted(unexpected)[:10]}"
                             f" (+{max(0, len(unexpected) - 10)} more)")
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        all_leaves = {
            "/".join(getattr(p, "key", str(p)) for p in path) for path, _ in flat
        }
        missing = all_leaves - assigned
        if missing:
            raise ValueError(f"flax leaves never assigned: {sorted(missing)[:10]}"
                             f" (+{max(0, len(missing) - 10)} more)")
    return params


def load_torch_weights(path: str, strict: bool = True):
    """Import the clean-fid pt_inception .pth file into the flax tree."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_state_dict({k: v.numpy() for k, v in sd.items()}, strict=strict)


def make_feature_fn(params=None):
    """Returns a jitted fn: uint8-or-float [0,255] [B, 299, 299, 3] -> [B, 2048]."""
    if params is None:
        params = random_params()
    model = _model()

    @jax.jit
    def features(imgs_u8):
        x = (imgs_u8.astype(jnp.float32) - 128.0) / 128.0  # TF-port scaling
        return model.apply({"params": params}, x)

    return features
