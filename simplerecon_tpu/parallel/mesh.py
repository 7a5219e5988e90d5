"""Device mesh helpers.

One flat `data` axis covers the reference's whole parallelism story
(DDP-only, SURVEY.md §2.6). The mesh is still constructed through
`jax.sharding.Mesh` so extra axes (e.g. a `model` axis for a future
tensor-parallel cost volume, or a DCN axis for multi-host) slot in without
touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              mesh_shape: Optional[Tuple[int, ...]] = None,
              devices=None) -> Mesh:
    """Builds a mesh over the first `num_devices` devices.

    With the default single axis the mesh is 1-D over `data`; for hybrid
    layouts pass `axis_names` plus a matching `mesh_shape` factorization.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if mesh_shape is None:
        if len(axis_names) != 1:
            raise ValueError("multi-axis meshes need an explicit mesh_shape")
        mesh_shape = (n,)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != {n} devices")
    return Mesh(np.asarray(devices).reshape(mesh_shape), tuple(axis_names))


def make_hybrid_mesh(ici_axis_size: int, dcn_axis_size: int,
                     axis_names: Sequence[str] = ("replica", "data"),
                     devices=None) -> Mesh:
    """Multi-host mesh: a DCN (between-host) axis times an ICI
    (within-host) axis, laid out so collectives on the `data` axis ride
    ICI. Uses `mesh_utils.create_hybrid_device_mesh` on real multi-host
    platforms and falls back to a reshaped mesh on single-host/virtual
    device sets (where DCN locality doesn't exist).
    """
    if devices is None:
        devices = jax.devices()
    n = ici_axis_size * dcn_axis_size
    devices = devices[:n]
    try:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            (dcn_axis_size,), (ici_axis_size,), devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(dcn_axis_size, ici_axis_size)
    return Mesh(arr.reshape(dcn_axis_size, ici_axis_size),
                tuple(axis_names))


def shard_map_nocheck(f, mesh: Mesh, in_specs, out_specs):
    """`shard_map` across jax versions, with replication checking off.

    jax >= 0.8 promotes `shard_map` to the top level (keyword-only, the
    check flag renamed `check_rep` -> `check_vma`) and emits a
    DeprecationWarning for `jax.experimental.shard_map`; older releases
    only have the experimental module. Some intermediate releases
    exposed top-level `jax.shard_map` while still taking `check_rep=`,
    so the flag name is picked from the actual signature."""
    if hasattr(jax, "shard_map"):
        import inspect
        params = inspect.signature(jax.shard_map).parameters
        flag = "check_vma" if "check_vma" in params else "check_rep"
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, **{flag: False})
    from jax.experimental.shard_map import shard_map  # pragma: no cover
    return shard_map(f, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_rep=False)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Moves a host batch (pytree of arrays) onto the mesh, splitting the
    leading axis. The global batch size must divide the mesh size."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
