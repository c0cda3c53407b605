"""DiffusionPrior: one diffusion model per formater-defined latent part.

Capability parity with /root/reference/diffusion_prior/model.py:

  * `DiffusionModel` (:9-76): one UNet + GaussianDiffusion with
    auto_normalize=False over a latent tensor; loss / sample /
    sample-given-start / interpolate / NLL.
  * `DiffusionPrior` (:79-159): a formater + one DiffusionModel per part;
    forward -> per-part losses; sample_latents -> per-part samples then
    formater.postprocess; per-dim NLL evaluation.

Fixes the reference's unregistered-submodule checkpoint bug (model.py:100:
`__priors` is a plain list, so UNet weights were silently missing from
`state_dict()`): here every part's params live in ONE PyTree
{"parts": (p_0, ..., p_{n-1})} that is checkpointed and optimized whole.

Heterogeneous part shapes vs jit (SURVEY.md §7 "hard parts"): each part has
its own UNet (own param shapes), so per-part compiled programs are the
natural unit; the losses of all parts are summed inside a single jitted
train step, letting XLA schedule the (independent) part subgraphs together.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion import DiffusionConfig, GaussianDiffusion
from .formaters import BaseFormater
from .unet import Unet


@dataclasses.dataclass
class DiffusionPrior:
    """Builds per-part (Unet, GaussianDiffusion) from a formater and shared
    unet/diffusion kwargs (run_diffusion_prior_experiment.py:73-96)."""

    formater: BaseFormater
    unet_kwargs: Dict[str, Any]
    diffusion_kwargs: Dict[str, Any]
    batch_sharding: Any = None  # forwarded to every part's GaussianDiffusion
    # so sampler chains run batch-sharded under a mesh (diffusion.py)

    def __post_init__(self):
        self.parts: List[GaussianDiffusion] = []
        self._unets: List[Unet] = []
        ukw = dict(self.unet_kwargs)
        if isinstance(ukw.get("dtype"), str):
            # unet_kwargs round-trip through diffusion_architecture.json, so
            # the mixed-precision knob travels as a string ("bfloat16")
            ukw["dtype"] = jnp.dtype(ukw["dtype"])
        for (h, w, c) in self.formater.input_shapes:
            unet = Unet(channels=c, **ukw)
            dcfg = DiffusionConfig(
                image_size=h,
                channels=c,
                auto_normalize=False,  # latents are not images (model.py:37-38)
                **self.diffusion_kwargs,
            )

            def apply_fn(params, x, t, sc, _unet=unet):
                return _unet.apply({"params": params}, x, t, sc)

            self.parts.append(
                GaussianDiffusion(apply_fn, dcfg,
                                  batch_sharding=self.batch_sharding))
            self._unets.append(unet)

    @property
    def num_parts(self) -> int:
        return self.formater.num_parts

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        """ALL part params in one registered tree (fixes model.py:100)."""
        parts = []
        for i, ((h, w, c), unet) in enumerate(zip(self.formater.input_shapes, self._unets)):
            x = jnp.zeros((1, h, w, c), jnp.float32)
            t = jnp.zeros((1,), jnp.int32)
            variables = unet.init(jax.random.PRNGKey(seed + i), x, t, None)
            parts.append(variables["params"])
        return {"parts": tuple(parts)}

    # -- training ---------------------------------------------------------
    def losses(self, params, key, latents: Sequence[jax.Array]) -> List[jax.Array]:
        """Per-part diffusion losses after formater processing
        (model.py:105-119)."""
        processed = self.formater.process_latents(latents)
        out = []
        for i, (diff, z) in enumerate(zip(self.parts, processed)):
            out.append(diff.loss(params["parts"][i], jax.random.fold_in(key, i), z))
        return out

    # -- sampling ---------------------------------------------------------
    def sample_latents(self, params, key, n: int) -> List[jax.Array]:
        """Per-part sample -> formater.postprocess (model.py:121-134)."""
        samples = []
        for i, diff in enumerate(self.parts):
            samples.append(diff.sample(params["parts"][i], jax.random.fold_in(key, i), n))
        return self.formater.postprocess(samples)

    def sample_latents_given_start(
        self, params, key, processed: Sequence[jax.Array]
    ) -> List[jax.Array]:
        """Noise each PROCESSED part (formater.process_latents output — i.e.
        already in the standardized space the diffusion models were trained
        in) to T-1, then run the full denoise chain back (model.py:137-138 ->
        DiffusionModel sample_latent_given_start, model.py:57-70). Returns
        processed parts; undo with formater.postprocess. Taking processed
        parts keeps exactly ONE standardize on the way in and one
        inv-standardize on the way out (ADVICE r4: the previous part-shaped
        contract double-standardized whenever formater stats were set)."""
        out = []
        for i, (diff, z) in enumerate(zip(self.parts, processed)):
            out.append(diff.sample_given_start(
                params["parts"][i], jax.random.fold_in(key, i), z
            ))
        return out

    def interpolate_latents(
        self, params, key, processed1, processed2, lam: float = 0.5
    ) -> List[jax.Array]:
        """Per-part diffusion interpolation at t=T-1 on PROCESSED parts
        (model.py:149-150). Contract as in sample_latents_given_start:
        inputs and outputs live in the trained (standardized) space."""
        out = []
        for i, diff in enumerate(self.parts):
            out.append(diff.interpolate(params["parts"][i], jax.random.fold_in(key, i),
                                        processed1[i], processed2[i], t=None, lam=lam))
        return out

    # -- evaluation -------------------------------------------------------
    def _per_part_nll_nats(
        self, params, key, latents: Sequence[jax.Array]
    ) -> List[tuple]:
        """[(total VLB nats per batch element, processed part shape), ...] over
        the FORMATER-PROCESSED parts (CatFormater has one part whose dim count
        equals the sum of all flow latent dims; IdentityFormater has L)."""
        processed = self.formater.process_latents(latents)
        out = []
        for i, (diff, z) in enumerate(zip(self.parts, processed)):
            nll = diff.neg_log_likelihood(params["parts"][i], jax.random.fold_in(key, i), z)
            out.append((nll, z.shape))
        return out

    def evaluate_neg_log_likelihood(
        self, params, key, latents: Sequence[jax.Array]
    ) -> List[jax.Array]:
        """Per-part, per-dim VLB-based NLL list (model.py:140-147:
        calc_neg_log_likelihood_loop / prod(latent dims)). NOTE: entries are
        normalized by the PROCESSED part's dims — weight them by those same
        dims (or use neg_log_likelihood_nats) when totalling."""
        return [nll / float(np.prod(shape[1:]))
                for nll, shape in self._per_part_nll_nats(params, key, latents)]

    def neg_log_likelihood_nats(
        self, params, key, latents: Sequence[jax.Array]
    ) -> jax.Array:
        """Total VLB nats per batch element, summed over all processed parts —
        the correct prior term for a flow+diffusion-prior likelihood bound
        regardless of formater.

        Units: GaussianDiffusion.neg_log_likelihood returns the reference's
        calc_neg_log_likelihood_loop value — a sum of MEAN-over-dims terms
        (gaussian_diffusion.py:869-904, i.e. per-DIM nats), so the per-image
        total is that value × the processed part's dim count. (The reference
        never combines these into a bpd — its calculate_bpd_with_diff_prior
        is dead code that subtracts the per-dim value from a per-image
        log-likelihood, diffusion_prior/trainer.py:45 — so this scaling is
        part of the greenfield corrected metric.)

        When the formater standardizes (stats set), the VLB is computed in
        standardized space; the constant change-of-variables term
        sum(log std) converts it back to a raw-latent NLL so the flow+prior
        bound stays comparable across standardization settings."""
        return sum(nll * float(np.prod(shape[1:]))
                   for nll, shape in self._per_part_nll_nats(params, key, latents)
                   ) + self.formater.stats_log_sigma_total()
