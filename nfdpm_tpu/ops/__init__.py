"""Functional ops: bijectors, coupling CNN, zero-conv, quantization, Pallas."""

from . import bijectors, coupling, quantize, zeroconv  # noqa: F401
