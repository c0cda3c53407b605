"""Latent formaters: adapters between the flow's L latent parts and the
diffusion prior's input tensors.

Capability parity with /root/reference/diffusion_prior/latent_formaters.py:

  * IdentityFormater (:89-132): L parts pass through -> L diffusion models.
  * CatFormater (:135-244): every part is squeezed/unsqueezed (factor-2
    space-to-depth, same channel order as the flow's squeeze) to the MIDDLE
    part's resolution and concatenated channel-wise into ONE tensor;
    `postprocess` is the exact inverse.
  * `standardize_latents` / `inv_standardize_latents` hooks: identity by
    default, matching the reference's current behavior (:68-86, scaling
    commented out there). With `stats` set (per-processed-part channelwise
    mean/std, fitted by `fit_formater_stats`), they apply real
    z' = (z - mean)/std scaling — the capability the reference stubbed
    out. Standardizing changes the latent density by a constant Jacobian,
    -log p_z(z) = -log p_z'(z') + sum(log std) over dims; consumers add
    `stats_log_sigma_total()` to any NLL computed in standardized space
    (DiffusionPrior.neg_log_likelihood_nats does this).

Unlike the reference's stateful implementation (which records shapes seen at
process time in mutable dicts, :155,182-233), these formaters are stateless
pure functions: every shape is derived from (L, in_channels, size) at
construction, so process/postprocess are jit-safe and trivially invertible.
Shapes are NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..ops.bijectors import squeeze_forward, squeeze_inverse

jnp_Array = jax.Array


def _latent_shapes(L: int, in_channels: int, size: int) -> List[Tuple[int, int, int]]:
    """NHWC latent shapes — single source of truth is glow.latent_shapes_nhwc
    (same channel schedule; avoids silent drift if it ever changes)."""
    from .glow import GlowConfig, latent_shapes_nhwc

    return latent_shapes_nhwc(GlowConfig(in_channels=in_channels, levels=L), size)


# per-processed-part ((mean_c, ...), (std_c, ...)) channelwise stats; plain
# float tuples keep the frozen dataclass hashable + JSON-serializable
StatsT = Tuple[Tuple[Tuple[float, ...], Tuple[float, ...]], ...]


@dataclasses.dataclass(frozen=True)
class BaseFormater:
    """Common interface (latent_formaters.py:13-86)."""

    L: int
    in_channels: int
    size: int
    stats: Optional[StatsT] = None  # None => identity hooks (reference behavior)

    @property
    def latent_shapes(self) -> List[Tuple[int, int, int]]:
        return _latent_shapes(self.L, self.in_channels, self.size)

    # standardization hooks: identity without stats (the reference's no-op
    # behavior); channelwise (z - mean)/std over the PROCESSED parts with
    def standardize_latents(self, latents: Sequence[jnp_Array]) -> List[jnp_Array]:
        if self.stats is None:
            return list(latents)
        assert len(latents) == len(self.stats), (len(latents), len(self.stats))
        out = []
        for z, (mean, std) in zip(latents, self.stats):
            m = jax.numpy.asarray(mean, z.dtype)
            s = jax.numpy.asarray(std, z.dtype)
            out.append((z - m) / s)
        return out

    def inv_standardize_latents(self, latents: Sequence[jnp_Array]) -> List[jnp_Array]:
        if self.stats is None:
            return list(latents)
        assert len(latents) == len(self.stats), (len(latents), len(self.stats))
        out = []
        for z, (mean, std) in zip(latents, self.stats):
            m = jax.numpy.asarray(mean, z.dtype)
            s = jax.numpy.asarray(std, z.dtype)
            out.append(z * s + m)
        return out

    def stats_log_sigma_total(self) -> float:
        """Total sum(log std) over ALL standardized dims — the constant
        change-of-variables term relating an NLL computed in standardized
        space to the raw-latent NLL: NLL_z = NLL_z' + this. 0.0 without
        stats (identity hooks have unit Jacobian)."""
        if self.stats is None:
            return 0.0
        total = 0.0
        for (h, w, c), (_mean, std) in zip(self.input_shapes, self.stats):
            assert len(std) == c, (len(std), c)
            total += float(h) * float(w) * float(np.sum(np.log(np.asarray(std, np.float64))))
        return total

    def with_stats(self, stats: StatsT) -> "BaseFormater":
        return dataclasses.replace(self, stats=stats)


@dataclasses.dataclass(frozen=True)
class IdentityFormater(BaseFormater):
    """L parts straight through -> L separate diffusion models (:89-132)."""

    def process_latents(self, latents: Sequence[jnp_Array]) -> List[jnp_Array]:
        return self.standardize_latents(latents)

    def postprocess(self, latents: Sequence[jnp_Array]) -> List[jnp_Array]:
        return self.inv_standardize_latents(latents)

    @property
    def num_parts(self) -> int:
        return self.L

    @property
    def input_shapes(self) -> List[Tuple[int, int, int]]:
        return self.latent_shapes


@dataclasses.dataclass(frozen=True)
class CatFormater(BaseFormater):
    """All parts rescaled to the middle part's resolution and concatenated
    channel-wise into ONE tensor (:135-180); exact inverse split (:182-233)."""

    @property
    def target_idx(self) -> int:
        return (self.L - 1) // 2

    def _degrees(self) -> List[int]:
        """+d => squeeze d times (finer parts), -d => unsqueeze (coarser)."""
        return [self.target_idx - i for i in range(self.L)]

    @property
    def _cat_channels(self) -> List[int]:
        """Per-part channel counts after rescaling to the target resolution."""
        out = []
        for (h, w, c), d in zip(self.latent_shapes, self._degrees()):
            out.append(c * (4 ** d) if d >= 0 else c // (4 ** (-d)))
        return out

    def process_latents(self, latents: Sequence[jnp_Array]) -> List[jnp_Array]:
        parts = []
        for z, d in zip(latents, self._degrees()):
            for _ in range(d):
                z = squeeze_forward(z)
            for _ in range(-d):
                z = squeeze_inverse(z)
            parts.append(z)
        cat = jax.numpy.concatenate(parts, axis=-1)
        return self.standardize_latents([cat])

    def postprocess(self, latents: Sequence[jnp_Array]) -> List[jnp_Array]:
        assert len(latents) == 1, "CatFormater expects a single latent tensor."
        cat = self.inv_standardize_latents(latents)[0]
        splits = np.cumsum(self._cat_channels)[:-1]
        parts = jax.numpy.split(cat, splits, axis=-1)
        out = []
        for z, d in zip(parts, self._degrees()):
            for _ in range(d):  # invert the squeezes
                z = squeeze_inverse(z)
            for _ in range(-d):
                z = squeeze_forward(z)
            out.append(z)
        return out

    @property
    def num_parts(self) -> int:
        return 1

    @property
    def input_shapes(self) -> List[Tuple[int, int, int]]:
        h, w, _ = self.latent_shapes[self.target_idx]
        return [(h, w, sum(self._cat_channels))]


def get_formater(name: str):
    """Registry (latent_formaters.py:247-262)."""
    if name == "IdentityFormater":
        return IdentityFormater
    if name == "CatFormater":
        return CatFormater
    raise ValueError("Invalid formater name")


def stats_from_json(obj) -> Optional[StatsT]:
    """Rehydrate stats persisted in diffusion_architecture.json (tuples
    serialize as lists). None/empty -> None (identity hooks)."""
    if not obj:
        return None
    return tuple((tuple(float(x) for x in mean), tuple(float(x) for x in std))
                 for mean, std in obj)


def fit_formater_stats(formater: BaseFormater, latent_batches,
                       eps: float = 1e-6) -> StatsT:
    """Channelwise mean/std of the formater's PROCESSED parts.

    `latent_batches` iterates over lists of raw flow-latent parts (one list
    per batch, NHWC). Geometry (squeeze/cat) is applied WITHOUT any
    existing standardization, then first/second moments accumulate per
    channel in float64 on host. Std is floored at `eps` so degenerate
    channels can't blow up the inverse. Returns the plain-float stats
    tuple for `formater.with_stats(...)` — the real implementation of the
    scaling the reference commented out (latent_formaters.py:68-86)."""
    base = dataclasses.replace(formater, stats=None)
    sums = sumsqs = counts = None
    for latents in latent_batches:
        parts = base.process_latents([jax.numpy.asarray(z) for z in latents])
        parts = [np.asarray(z, np.float64) for z in parts]
        if sums is None:
            sums = [np.zeros(z.shape[-1]) for z in parts]
            sumsqs = [np.zeros(z.shape[-1]) for z in parts]
            counts = [0.0] * len(parts)
        for i, z in enumerate(parts):
            sums[i] += z.sum(axis=(0, 1, 2))
            sumsqs[i] += (z * z).sum(axis=(0, 1, 2))
            counts[i] += float(np.prod(z.shape[:-1]))
    if sums is None:
        raise ValueError("fit_formater_stats: empty latent_batches")
    stats = []
    for s, ss, c in zip(sums, sumsqs, counts):
        mean = s / c
        var = np.maximum(ss / c - mean * mean, 0.0)
        std = np.maximum(np.sqrt(var), eps)
        stats.append((tuple(float(v) for v in mean),
                      tuple(float(v) for v in std)))
    return tuple(stats)
