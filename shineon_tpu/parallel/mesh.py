"""Device mesh + sharding plan (the distributed backbone).

Replaces the reference's NCCL/DDP stack (SURVEY §2.10): Lightning DDP,
DistributedSampler, and the 730-line vendored SynchronizedBatchNorm all map to
ONE ``jax.sharding.Mesh`` with a "data" axis:

  * the global batch is sharded over "data" (NamedSharding P('data'));
  * parameters/optimizer state are replicated; XLA inserts the gradient
    all-reduce (psum) automatically when the jitted step consumes sharded
    batches and produces replicated grads — the DDP allreduce, compiled;
  * batch-norm statistics computed over the sharded batch axis are global
    under GSPMD — sync-BN for free;
  * on multi-host deployments each process feeds its local shard via
    jax.make_array_from_process_local_data; intra-slice traffic rides ICI.

The mesh shape is (data,) by default. The video models keep spatial/temporal
axes on-chip (SURVEY §5.7: feature maps are small; the frame loop is a scan),
so data parallelism is the sharding the reference's capability set needs;
`extra_axes` leaves room for model-parallel axes later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put array leaves batch-sharded; drop non-array (string) entries.

    Works both single-process (device_put with a NamedSharding) and
    multi-process (make_array_from_process_local_data assembles the global
    array from each host's local shard).
    """
    sharding = data_sharding(mesh, axis_name)
    out = {}
    multiprocess = jax.process_count() > 1
    for key, value in batch.items():
        if not hasattr(value, "ndim"):
            continue  # strings/lists stay on host
        if multiprocess:
            out[key] = jax.make_array_from_process_local_data(sharding, value)
        else:
            out[key] = jax.device_put(value, sharding)
    return out


def make_mesh_2d(
    dp: int, sp: int, devices: Optional[Sequence] = None,
    axis_names=("data", "space"),
) -> Mesh:
    """2-D mesh: batch over "data", image height over "space".

    The reference has no tensor/sequence parallelism (SURVEY §2.10) — its
    spatial extents fit one chip — but at larger resolutions XLA's GSPMD
    spatially partitions the convolutions (automatic halo exchanges) when the
    height axis is sharded, so the capability costs one axis annotation.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    assert dp * sp <= len(devices), (dp, sp, len(devices))
    return Mesh(np.array(devices[: dp * sp]).reshape(dp, sp), axis_names)


def spatial_sharding_for(
    mesh: Mesh, shape, spatial_size: int, axis_name: str = "space",
    batch_axis: str = "data",
) -> NamedSharding:
    """Batch axis over "data"; the first dim equal to ``spatial_size`` (the
    image height) over "space"; everything else replicated."""
    spec = [None] * len(shape)
    if len(shape) >= 1:
        spec[0] = batch_axis
    for i in range(1, len(shape)):
        if shape[i] == spatial_size:
            spec[i] = axis_name
            break
    return NamedSharding(mesh, P(*spec))


def shard_batch_spatial(
    batch: dict, mesh: Mesh, spatial_size: int
) -> dict:
    """Like :func:`shard_batch` but also shards the height axis over "space"
    when the mesh has one."""
    if "space" not in mesh.axis_names:
        return shard_batch(batch, mesh)
    out = {}
    for key, value in batch.items():
        if not hasattr(value, "ndim"):
            continue
        sharding = spatial_sharding_for(mesh, value.shape, spatial_size)
        out[key] = jax.device_put(value, sharding)
    return out
