"""Model families: Glow flow, Gaussian/diffusion priors, DDPM UNet."""

from . import glow, prior  # noqa: F401
