"""Device-mesh construction and sharding helpers.

The reference has NO distributed code (SURVEY.md §2.9b) — this subsystem is
greenfield TPU-native capability: batch-sharded data parallelism over ICI as
the default, with the mesh/NamedSharding machinery general enough for
tensor-parallel params (axis "model") when scaling up.

Conventions:
  * mesh axes: ("data", "model"); the default mesh is (n_devices, 1).
  * batches are sharded P("data") on their leading axis; params are
    replicated unless a model-parallel rule says otherwise.
  * RNG: per-step keys are identical on all devices (replicated); ops that
    must decorrelate across the batch shard fold in `jax.lax.axis_index`
    inside shard_map regions — plain jit-under-mesh handles dequant noise
    correctly because the batch axis itself is sharded.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    n_slices: int = 1,
) -> Mesh:
    """("data", "model") mesh over the available devices.

    `n_slices > 1` builds a multi-slice (DCN-connected) layout: data
    parallelism spans slices while every model-parallel group stays INSIDE
    one slice, so TP collectives ride ICI and only the once-per-step
    gradient all-reduce crosses DCN — the hierarchical-bandwidth recipe.
    The axis names don't change: "data" is simply laid out slice-major, so
    every existing P("data")/P("model") spec works unmodified and XLA
    derives the hierarchical collectives from the device assignment."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_slices > 1:
        return _hybrid_mesh(devices, n_data, n_model, n_slices)
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def _hybrid_mesh(devices, n_data: int, n_model: int, n_slices: int) -> Mesh:
    """Slice-major ("data", "model") mesh for multi-slice topologies.

    On real multi-slice TPU (devices carry `slice_index`) the per-slice
    ICI layout comes from mesh_utils.create_hybrid_device_mesh; elsewhere
    (virtual CPU meshes, single-slice) slices are emulated as contiguous
    equal blocks of the device list — the same slice-major order real
    hardware enumerates."""
    if n_data % n_slices:
        raise ValueError(
            f"data axis ({n_data}) must be divisible by n_slices ({n_slices})"
            " — data parallelism is what spans DCN")
    per_slice_data = n_data // n_slices
    n_per_slice = per_slice_data * n_model
    if n_slices * n_per_slice > len(devices):
        raise ValueError(
            f"need {n_slices * n_per_slice} devices for "
            f"(data={n_data}, model={n_model}) over {n_slices} slices; "
            f"have {len(devices)}")
    if all(getattr(d, "slice_index", None) is not None for d in devices):
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_slice_data, n_model),
            dcn_mesh_shape=(n_slices, 1),
            devices=devices,
        )
    else:
        dev_array = np.asarray(
            devices[: n_slices * n_per_slice]
        ).reshape(n_slices * per_slice_data, n_model)
    return Mesh(dev_array.reshape(n_data, n_model), ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over "data" AND image height over "model": spatial partitioning
    (the sequence-parallel analogue for image models, SURVEY.md §5.7). GSPMD
    partitions the coupling CNNs' 3x3 convs with automatic halo exchange, so
    per-device activation memory scales ~1/n_model — the idiomatic TPU lever
    for very large images (CelebA-128+) when batch-per-chip is already 1.

    SAFETY: XLA's spatially-partitioned conv was measured to silently
    MISCOMPILE when a shard's row count falls to ~the kernel halo (3x3
    wrong at 1 row/shard, 7x7 wrong at 2 rows/shard; exact above that —
    see tests/test_parallel.py::test_spatial_conv_halo_hazard). Callers must
    keep every spatially-sharded conv at >= 2 rows/shard for 3x3 kernels:
    for Glow that is (img_size / 2^levels) / n_model >= 2, which
    nf_trainer.train enforces. Never propagate this sharding into the UNet
    (7x7 init conv on small latents); diffusion_trainer re-constrains
    latents to P("data") before the diffusion losses for exactly this
    reason."""
    return NamedSharding(mesh, P("data", "model"))


def checked_spatial_sharding(mesh: Mesh, img_size: int, levels: int) -> NamedSharding:
    """spatial_sharding with the halo-safety guard both trainers need:
    every Glow level's spatial extent must keep >= 2 rows per "model" shard
    (see spatial_sharding's SAFETY note; the deepest level img_size/2^levels
    is the binding one). Raises ValueError outside the safe regime."""
    n_model = mesh.shape["model"]
    deepest = img_size >> levels
    if deepest % n_model or deepest // n_model < 2:
        raise ValueError(
            f"parallel.spatial needs (img_size/2^L)/n_model >= 2 and "
            f"divisible; got {img_size}/2^{levels}={deepest} over "
            f"model={n_model}")
    return spatial_sharding(mesh)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch onto the mesh, sharded along the batch axis."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
