"""Pallas TPU kernels for the hot fused ops."""

from . import channel_mix  # noqa: F401
