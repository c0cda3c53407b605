"""Pallas TPU kernels for the hot fused ops."""

from . import channel_mix, coupling_tail  # noqa: F401
