"""NFBackbone: the Glow flow wrapped for diffusion-prior training.

Capability parity with /root/reference/normalizing_flow/__init__.py:16-107:
load a pretrained flow checkpoint, optionally freeze it, expose
`transform` (log-det only — split-prior logp skipped, :70-82) and
`invert`/`sample` pass-throughs.

Functional design: freezing is not a `requires_grad` mutation but (a)
`jax.lax.stop_gradient` on the params inside the loss and (b) exclusion
from the optimizer param tree (training/diffusion_trainer.py) — the
reference's `set_train_mode` eval/train juggling (:58-65) has no JAX
analogue because the forward is always pure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax

from . import glow as glow_m


@dataclasses.dataclass(frozen=True)
class NFBackbone:
    cfg: glow_m.GlowConfig
    img_size: int
    frozen: bool = True

    def maybe_freeze(self, flow_params):
        return jax.lax.stop_gradient(flow_params) if self.frozen else flow_params

    def transform(self, flow_params, x, ldj=None):
        """Forward transform WITHOUT split-prior log-probs (logp=None
        semantics of the reference, __init__.py:70-82)."""
        params = self.maybe_freeze(flow_params)
        latents, ldj, _ = glow_m.forward(params, self.cfg, x, ldj=ldj, with_logp=False)
        return latents, ldj

    def invert(self, flow_params, latents, key=None, temperature: float = 1.0):
        return glow_m.inverse(flow_params, self.cfg, latents, key, temperature)

    def sample(self, flow_params, latents, key=None, temperature: float = 1.0,
               postprocess_fn=None):
        x = self.invert(flow_params, latents, key, temperature)
        return postprocess_fn(x) if postprocess_fn else x

    @property
    def latent_shapes(self) -> List[Tuple[int, int, int]]:
        return glow_m.latent_shapes_nhwc(self.cfg, self.img_size)


def load_pretrained_flow(
    run_dir: str, epoch: int, frozen: bool = True
) -> Tuple[NFBackbone, Dict[str, Any]]:
    """Rebuild a flow from a baseline run's architecture.json + checkpoint
    (run_diffusion_prior_experiment.py:45-58 semantics). Returns the backbone
    and the flow params."""
    # single source of truth for arch->config->params reconstruction
    from ..training.runload import load_glow_run

    run = load_glow_run(run_dir, epoch)
    backbone = NFBackbone(cfg=run.gcfg, img_size=run.img_size, frozen=frozen)
    # host arrays (runload normalizes placement); re-place cleanly downstream
    return backbone, run.params["flow"]
