"""Multi-chip SPMD partitioning of the node graph.

The TPU-native analog of the reference's MPI domain decomposition
(/root/reference/source/offline_data.h:136-169 and the SparseMatrixSIMD
ghost-row exchange, sparse_matrix_simd.h:299-420): instead of explicit
ghost layers and MPI_Isend/Irecv target lists, the node axis of the state
and of all stencil arrays is sharded over a 1D jax.sharding.Mesh and XLA
GSPMD inserts the halo collectives (collective-permute for the structured
shift stencil, all-gathers for ELL gathers) automatically.

Usage:
    mesh = make_device_mesh()                       # all local devices
    hm.stencil = shard_stencil(hm.stencil, mesh, packed.n_pad)
    U = shard_state(U, mesh)
    with mesh:
        U, tau, ok = time_integrator.step(U, t)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

NODE_AXIS = "nodes"


def make_device_mesh(n_devices: Optional[int] = None, axis_name=NODE_AXIS):
    """1D device mesh over the first n (default: all) local devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def node_sharding(device_mesh, ndim: int, axis_name=NODE_AXIS):
    """NamedSharding partitioning the LAST axis (the node axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(
        device_mesh, P(*([None] * (ndim - 1) + [axis_name]))
    )


def shard_state(X, device_mesh, axis_name=NODE_AXIS):
    """Place a state array [..., n_pad] with its node axis sharded."""
    import jax

    return jax.device_put(X, node_sharding(device_mesh, X.ndim, axis_name))


def shard_pallas_module(hm, device_mesh, axis_name=NODE_AXIS):
    """Shard a pallas-backed HyperbolicModule over a 1D device mesh.

    Requires the canvas to have been packed with
    `pack_structured(..., slabs=n_devices)` (uniform ghost-banded slabs
    of canvas axis 0, offline/structured.py slab_spec).  The fused
    kernels then run per-device under shard_map; the XLA glue between
    them (ghost refresh = slab-axis roll -> collective-permute, tau/ok
    reductions -> all-reduce, boundary fixup scatter) is GSPMD-
    partitioned.  This is the XLA-SPMD rendition of the reference's
    overlapped MPI ghost exchange (sparse_matrix_simd.h:651-771,
    openmp.h:141-175).
    """
    import dataclasses

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    ps = getattr(hm, "_pallas", None)
    if ps is None or ps.slab_spec is None:
        raise ValueError(
            "shard_pallas_module needs a pallas backend on a canvas "
            "packed with slabs=n_devices"
        )
    n_dev = device_mesh.devices.size
    if ps.slab_spec[0] != n_dev:
        raise ValueError(
            f"canvas has {ps.slab_spec[0]} slabs but the mesh has "
            f"{n_dev} devices"
        )
    ps.device_mesh = device_mesh
    ps.mesh_axis = axis_name

    zmajor = bool(getattr(ps, "slab3d", False))

    def place(x):
        if x is None:  # optional fields (separable factors)
            return None
        if x.ndim >= 2 and zmajor and x.shape[0] == 1:
            # z-independent broadcast block (g_sep2): replicate
            spec = P(*([None] * x.ndim))
        elif x.ndim >= 2 and zmajor:
            # z-major [D, planes, H, W]: the slab axis IS axis 0
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        elif x.ndim >= 2:  # [planes, *canvas]: slab axis at axis 1
            spec = P(None, axis_name, *([None] * (x.ndim - 2)))
        else:  # flat [n_pad]: row-major = slab-major, same placement
            spec = P(axis_name)
        return jax.device_put(x, NamedSharding(device_mesh, spec))

    ps.arrays = dataclasses.replace(
        ps.arrays,
        **{
            f.name: place(getattr(ps.arrays, f.name))
            for f in dataclasses.fields(ps.arrays)
        },
    )
    hm.stencil = ps.arrays
    # prepare_state_vector / postprocessing use the XLA stencil:
    hm._xla_stencil = shard_stencil(hm._xla_stencil, device_mesh, hm.n_pad)
    return hm


def shard_stencil(stencil, device_mesh, n_pad: int, axis_name=NODE_AXIS):
    """Shard every stencil array whose trailing axis is the node axis.

    Works for both the ELL `Stencil` and the `StructuredStencil` (their
    static meta fields are left untouched).  Scalars and arrays without a
    trailing node axis (e.g. measure_inv) are replicated.
    """
    import jax

    def place(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 1
            and x.shape[-1] == n_pad
        ):
            return jax.device_put(
                x, node_sharding(device_mesh, x.ndim, axis_name)
            )
        return x

    updates = {}
    for f in dataclasses.fields(stencil):
        v = getattr(stencil, f.name)
        if isinstance(v, (tuple, int, float, type(None))):
            continue  # static metadata (shape, offsets, ...)
        updates[f.name] = place(v)
    return dataclasses.replace(stencil, **updates)
