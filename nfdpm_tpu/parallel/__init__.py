"""Parallelism: device meshes, shardings, distributed init."""

from . import mesh  # noqa: F401
