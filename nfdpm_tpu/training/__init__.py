"""Training loops, optimizers, checkpointing, tracking."""

from . import checkpoint, nf_trainer, optim, tracking  # noqa: F401
