"""Latent formaters: adapters between the flow's L latent parts and the
diffusion prior's input tensors.

Capability parity with /root/reference/diffusion_prior/latent_formaters.py:

  * IdentityFormater (:89-132): L parts pass through -> L diffusion models.
  * CatFormater (:135-244): every part is squeezed/unsqueezed (factor-2
    space-to-depth, same channel order as the flow's squeeze) to the MIDDLE
    part's resolution and concatenated channel-wise into ONE tensor;
    `postprocess` is the exact inverse.
  * `standardize_latents` / `inv_standardize_latents` hooks exist and are
    identity, matching the reference's current behavior (:68-86, scaling
    commented out there).

Unlike the reference's stateful implementation (which records shapes seen at
process time in mutable dicts, :155,182-233), these formaters are stateless
pure functions: every shape is derived from (L, in_channels, size) at
construction, so process/postprocess are jit-safe and trivially invertible.
Shapes are NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import numpy as np

from ..ops.bijectors import squeeze_forward, squeeze_inverse

jnp_Array = jax.Array


def _latent_shapes(L: int, in_channels: int, size: int) -> List[Tuple[int, int, int]]:
    """NHWC latent shapes — single source of truth is glow.latent_shapes_nhwc
    (same channel schedule; avoids silent drift if it ever changes)."""
    from .glow import GlowConfig, latent_shapes_nhwc

    return latent_shapes_nhwc(GlowConfig(in_channels=in_channels, levels=L), size)


@dataclasses.dataclass(frozen=True)
class BaseFormater:
    """Common interface (latent_formaters.py:13-86)."""

    L: int
    in_channels: int
    size: int

    @property
    def latent_shapes(self) -> List[Tuple[int, int, int]]:
        return _latent_shapes(self.L, self.in_channels, self.size)

    # identity hooks, matching the reference's current no-op behavior
    def standardize_latents(self, latents: Sequence[jnp_Array]) -> List[jnp_Array]:
        return list(latents)

    def inv_standardize_latents(self, latents: Sequence[jnp_Array]) -> List[jnp_Array]:
        return list(latents)


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
