"""nfdpm_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of NFDPM (Normalizing-Flow-with-Diffusion-Prior-Model).

Subpackages
-----------
ops       : functional bijector primitives (actnorm, PLU 1x1 conv, affine
            coupling, squeeze/split), quantization ops, Pallas kernels.
models    : Glow assembly, Gaussian priors, DDPM UNet + GaussianDiffusion,
            DiffusionPrior, latent formaters, NFBackbone.
parallel  : device-mesh construction, sharding helpers, data-parallel and
            tensor-parallel train-step builders.
data      : dataset readers (MNIST / CIFAR-10 / ImageNet32 / CelebA /
            synthetic), host-sharded batch pipeline.
metrics   : on-device FID / KID (Inception-v3, CLIP ViT-B/32 features),
            SSIM / PSNR, stats precompute.
training  : NF and diffusion-prior training loops, Orbax checkpointing,
            experiment tracking.
utils     : config system (YAML + dotted CLI overrides), RNG helpers,
            environment/seed utilities.
"""

__version__ = "0.3.0"
