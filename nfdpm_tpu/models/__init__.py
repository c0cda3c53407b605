"""Model families: Glow flow, priors, DDPM UNet, diffusion prior, formaters."""

from . import diffusion, diffusion_prior, formaters, glow, nf_backbone, prior, unet  # noqa: F401
