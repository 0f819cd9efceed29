"""Multi-block canvas packing (offline/multiblock.py).

The reference's block-built geometries (annulus: geometry_annulus.h, disk:
geometry_disk.h, airfoil: geometry_airfoil.h, cylinder blocks:
geometry_cylinder.h:62-144) are quilts of logically-structured patches.
These tests check that the automatic block decomposition + multi-block
canvas packing reproduces the padded-ELL reference path bit-for-bit
(cross-interface ghost refresh incl. the reader-frame slot permutation),
and that the fused Pallas kernels (interpret mode) agree on multi-block
canvases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ryujin_tpu.equations.euler import Euler
from ryujin_tpu.equations.euler_initial_states import make_initial_state
from ryujin_tpu.offline import assembly, ell, geometry, multiblock
from ryujin_tpu.postprocess.error import interpolate_nodal
from ryujin_tpu.solver.hyperbolic import HyperbolicModule
from ryujin_tpu.solver.integrator import TimeIntegrator


def _bumped_state(eq, packed, init, dtype):
    """Uniform Mach-3 flow with a density/energy bump (limiter active)."""
    U = interpolate_nodal(init, packed, eq, 0.0, dtype)
    pos = np.asarray(packed.positions)
    bump = 1.0 + 0.2 * np.exp(-10.0 * (pos**2).sum(1))
    U = U.at[0].mul(jnp.asarray(bump, dtype))
    U = U.at[3].mul(jnp.asarray(bump, dtype))
    return U


def _advance(eq, packed, init, dtype, n_steps, backend="xla"):
    hm = HyperbolicModule(eq, packed, init, dtype=dtype, backend=backend)
    ti = TimeIntegrator(
        hm, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
        cfl_recovery_strategy="none",
    )
    U0 = _bumped_state(eq, packed, init, dtype)
    U, _, t, tau, _, _ = ti.advance(U0, 0.0, n_steps=n_steps)
    return np.asarray(U), float(t), float(tau)


@pytest.mark.parametrize("sym_mb", ["0", "1"])
@pytest.mark.parametrize(
    "geom,make",
    [
        ("annulus", lambda: geometry.annulus(refinement=0)),
        ("disk", lambda: geometry.disk(refinement=1)),
    ],
)
def test_multiblock_matches_ell(geom, make, sym_mb, monkeypatch):
    """Multi-block canvas == padded ELL on the same mesh (1e-12).

    Runs both the default two-direction evaluation and the env-gated
    half-slot path (RYUJIN_SYM_MB=1: one Riemann solve per undirected
    edge in block interiors + the O(interface) sym_fixup)."""
    monkeypatch.setenv("RYUJIN_SYM_MB", sym_mb)
    mesh = make()
    data = assembly.assemble(mesh)
    sd = multiblock.pack_multiblock(data, mesh, pad_minor=8, pad_major=8)
    el = ell.pack(data)
    assert sd.n_nodes == el.n_nodes
    assert sd.gmap_node is not None and len(sd.gmap_node[0]) > 0

    eq = Euler(dim=2)
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))
    dtype = jnp.float64
    Us, ts, taus = _advance(eq, sd, init, dtype, 3)
    Ue, te, taue = _advance(eq, el, init, dtype, 3)
    assert abs(taus - taue) < 1e-14 * max(1.0, abs(taue))
    A = Us[:, np.asarray(sd.vertex_to_node)]
    B = Ue[:, np.asarray(el.vertex_to_node)]
    assert np.isfinite(A).all()
    np.testing.assert_allclose(A, B, rtol=0.0, atol=1e-12)


@pytest.mark.parametrize("sym_mb", ["0", "1"])
def test_multiblock_pallas_interpret_matches_xla(sym_mb, monkeypatch):
    """Fused kernels with cross-block ghost refresh == XLA (disk mesh),
    on both the two-direction default and the RYUJIN_SYM_MB=1 path."""
    monkeypatch.setenv("RYUJIN_SYM_MB", sym_mb)
    mesh = geometry.disk(refinement=1)
    data = assembly.assemble(mesh)
    sd = multiblock.pack_multiblock(data, mesh, pad_minor=8, pad_major=8)
    eq = Euler(dim=2)
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))
    dtype = jnp.float64
    U_x, t_x, tau_x = _advance(eq, sd, init, dtype, 2, backend="xla")
    U_p, t_p, tau_p = _advance(eq, sd, init, dtype, 2,
                               backend="pallas_interpret")
    assert abs(tau_x - tau_p) < 1e-14 * max(1.0, abs(tau_x))
    real = np.asarray(sd.node_mask) > 0
    np.testing.assert_allclose(
        U_p[:, real], U_x[:, real], rtol=0.0, atol=1e-12
    )


def test_extraordinary_vertices_side_rows():
    """The reference-style cylinder block construction has degree-12
    vertices (>8 stencil slots).  Such rows now live on the side ELL
    stencil (StructuredData.ev_side / solver Sideband) while every other
    row keeps the canvas fast path — the whole mesh must reproduce the
    padded-ELL reference, on both backends."""
    mesh = geometry.cylinder(refinement=1, variant="blocks")
    data = assembly.assemble(mesh)
    sd = multiblock.pack_multiblock(data, mesh, pad_minor=8, pad_major=8)
    assert sd.ev_side is not None
    assert len(sd.ev_side["rows"]) == 6  # the 6 valence-6 block corners
    assert sd.ev_side["mask"].shape[1] == 12  # 12-slot side rows
    el = ell.pack(data)

    eq = Euler(dim=2)
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))
    dtype = jnp.float64
    Us, ts, taus = _advance(eq, sd, init, dtype, 3)
    Ue, te, taue = _advance(eq, el, init, dtype, 3)
    assert abs(taus / taue - 1.0) < 1e-14
    A = Us[:, np.asarray(sd.vertex_to_node)]
    B = Ue[:, np.asarray(el.vertex_to_node)]
    assert np.isfinite(A).all()
    np.testing.assert_allclose(A, B, rtol=0.0, atol=1e-12)

    # fused kernels (interpret) agree too:
    Up, tp, taup = _advance(eq, sd, init, dtype, 2,
                            backend="pallas_interpret")
    Ux, tx, taux = _advance(eq, sd, init, dtype, 2)
    real = np.asarray(sd.node_mask) > 0
    assert abs(taup / taux - 1.0) < 1e-14
    np.testing.assert_allclose(
        Up[:, real], Ux[:, real], rtol=0.0, atol=1e-12
    )


def test_truly_unstructured_falls_back():
    """A mesh with extraordinary rows at a large fraction of nodes is
    genuinely unstructured: packing must raise so the driver falls back
    to padded ELL.  (The cylinder blocks variant at refinement 0 has 6
    EVs among ~50 nodes — above the 1/64 threshold only for tiny
    meshes; synthesize the check via the threshold arithmetic.)"""
    mesh = geometry.cylinder(refinement=0, variant="blocks")
    data = assembly.assemble(mesh)
    try:
        sd = multiblock.pack_multiblock(data, mesh, pad_minor=8,
                                        pad_major=8)
    except multiblock.MultiblockError:
        return  # small mesh over the EV-fraction threshold: fallback ok
    assert sd.ev_side is None or (
        len(sd.ev_side["rows"]) <= max(64, data.n_nodes // 64)
    )


@pytest.mark.parametrize(
    "geom,make",
    [
        ("airfoil", lambda: geometry.airfoil(refinement=0)),
        ("cylinder-blocks",
         lambda: geometry.cylinder(refinement=1, variant="blocks")),
    ],
)
def test_multiblock_sharded_matches_single_device(geom, make):
    """Multi-chip fast path for multi-block canvases: the canvas re-laid
    into 8 ghost-banded slabs (pack_multiblock slabs=8), node axis
    sharded over the 8-virtual-device mesh, must reproduce the unsharded
    single-slab result bit-for-bit — the multi-block rendition of the
    reference's layout-agnostic MPI decomposition (every mesh, not just
    lattices: offline_data.h:136-169, sparse_matrix_simd.h:651-771).
    Communication shape: halos ride collective-permute; no state-sized
    all-gather (the gmap/EV-sideband scatters are two-index (slot, cell)
    ops precisely so GSPMD never merges the slot axis with the sharded
    node axis)."""
    import re

    import jax
    from jax.sharding import Mesh  # noqa: F401 (conftest provides 8 dev)

    from ryujin_tpu.parallel.sharding import (
        make_device_mesh, shard_state, shard_stencil,
    )

    n_dev = len(jax.devices())
    assert n_dev >= 2
    mesh = make()
    data = assembly.assemble(mesh)
    sd1 = multiblock.pack_multiblock(data, mesh, pad_minor=8, pad_major=8)
    sd8 = multiblock.pack_multiblock(data, mesh, pad_minor=8, pad_major=8,
                                     slabs=n_dev)
    assert sd8.slab_spec is not None and sd8.slab_spec[0] == n_dev

    eq = Euler(dim=2)
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))
    dtype = jnp.float64
    U1, t1, tau1 = _advance(eq, sd1, init, dtype, 3)

    hm = HyperbolicModule(eq, sd8, init, dtype=dtype)
    device_mesh = make_device_mesh(n_dev)
    hm.stencil = shard_stencil(hm.stencil, device_mesh, sd8.n_pad)
    hm._xla_stencil = hm.stencil
    ti = TimeIntegrator(hm, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
                        cfl_recovery_strategy="none")
    U0 = shard_state(_bumped_state(eq, sd8, init, dtype), device_mesh)
    out = ti.advance(U0, 0.0, n_steps=3)
    Us, taus = np.asarray(out[0]), float(out[3])

    assert abs(taus - tau1) < 1e-14 * max(1.0, abs(tau1))
    A = U1[:, np.asarray(sd1.vertex_to_node)]
    B = Us[:, np.asarray(sd8.vertex_to_node)]
    assert np.isfinite(B).all()
    np.testing.assert_allclose(B, A, rtol=0.0, atol=1e-12)

    # communication shape
    hlo = (
        ti._advance.lower(
            hm.stencil, None, U0, jnp.float64(0.0), jnp.float64(jnp.inf), 1
        ).compile().as_text()
    )
    assert "collective-permute" in hlo
    for m in re.finditer(r"all-gather[^\n]*", hlo):
        line = m.group(0)
        sizes = [int(s) for s in re.findall(r"f64\[([0-9,]+)\]",
                                            line.replace(",", ""))]
        for s in sizes:
            assert s < sd8.n_pad, f"state-sized all-gather: {line[:120]}"


def _amr_mesh(refinement=4, r=2.0):
    """A locally-refined (hanging-node) square: the reference's AMR case."""
    from ryujin_tpu.offline.mesh import Boundary, refine_local

    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], refinement=refinement,
        boundary_conditions=[Boundary.dirichlet] * 4,
    )
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    m2, _ = refine_local(mesh, (np.abs(centers) < r).all(axis=1))
    assert m2.hanging is not None and len(m2.hanging)
    return m2


def test_amr_multiblock_matches_ell():
    """Locally-refined (2:1 hanging-node) meshes pack onto the multi-block
    canvas: coarse/fine interface rows become EV side rows (incl. EV-EV
    edges transposed side-internally) while block interiors keep the
    canvas fast path.  Must reproduce padded ELL on both backends — this
    is the fast-path closure of the ELL cliff (the reference runs its one
    CSR hot loop on any p4est-adapted mesh,
    hyperbolic_module.template.h:417-420)."""
    m2 = _amr_mesh()
    data = assembly.assemble(m2)
    sd = multiblock.pack_multiblock(data, m2, pad_minor=8, pad_major=8)
    assert sd.ev_side is not None
    assert (sd.ev_side["trans_side"] >= 0).any()  # EV-EV edges present
    el = ell.pack(data)
    assert sd.n_nodes == el.n_nodes

    eq = Euler(dim=2)
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))
    dtype = jnp.float64
    Us, ts, taus = _advance(eq, sd, init, dtype, 3)
    Ue, te, taue = _advance(eq, el, init, dtype, 3)
    assert abs(taus / taue - 1.0) < 1e-14
    A = Us[:, np.asarray(sd.vertex_to_node)]
    B = Ue[:, np.asarray(el.vertex_to_node)]
    assert np.isfinite(A).all()
    np.testing.assert_allclose(A, B, rtol=0.0, atol=1e-12)

    Up, tp, taup = _advance(eq, sd, init, dtype, 2,
                            backend="pallas_interpret")
    Ux, tx, taux = _advance(eq, sd, init, dtype, 2)
    real = np.asarray(sd.node_mask) > 0
    assert abs(taup / taux - 1.0) < 1e-14
    np.testing.assert_allclose(
        Up[:, real], Ux[:, real], rtol=0.0, atol=1e-12
    )


def test_amr_multiblock_sharded():
    """The slab-sharded multi-block path on a hanging-node mesh: 8
    virtual devices reproduce the unsharded result, halos ride
    collective-permute, no state-sized all-gather."""
    import re

    import jax

    from ryujin_tpu.parallel.sharding import (
        make_device_mesh, shard_state, shard_stencil,
    )

    n_dev = len(jax.devices())
    assert n_dev >= 2
    m2 = _amr_mesh(refinement=5)
    data = assembly.assemble(m2)
    sd1 = multiblock.pack_multiblock(data, m2, pad_minor=8, pad_major=8)
    sd8 = multiblock.pack_multiblock(data, m2, pad_minor=8, pad_major=8,
                                     slabs=n_dev)

    eq = Euler(dim=2)
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))
    dtype = jnp.float64
    U1, t1, tau1 = _advance(eq, sd1, init, dtype, 3)

    hm = HyperbolicModule(eq, sd8, init, dtype=dtype)
    device_mesh = make_device_mesh(n_dev)
    hm.stencil = shard_stencil(hm.stencil, device_mesh, sd8.n_pad)
    hm._xla_stencil = hm.stencil
    ti = TimeIntegrator(hm, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
                        cfl_recovery_strategy="none")
    U0 = shard_state(_bumped_state(eq, sd8, init, dtype), device_mesh)
    out = ti.advance(U0, 0.0, n_steps=3)
    Us, taus = np.asarray(out[0]), float(out[3])
    assert abs(taus - tau1) < 1e-14 * max(1.0, abs(tau1))
    A = U1[:, np.asarray(sd1.vertex_to_node)]
    B = Us[:, np.asarray(sd8.vertex_to_node)]
    assert np.isfinite(B).all()
    np.testing.assert_allclose(B, A, rtol=0.0, atol=1e-12)

    hlo = (
        ti._advance.lower(
            hm.stencil, None, U0, jnp.float64(0.0), jnp.float64(jnp.inf), 1
        ).compile().as_text()
    )
    assert "collective-permute" in hlo
    for m in re.finditer(r"all-gather[^\n]*", hlo):
        line = m.group(0)
        sizes = [int(s) for s in re.findall(r"f64\[([0-9,]+)\]",
                                            line.replace(",", ""))]
        for s in sizes:
            assert s < sd8.n_pad, f"state-sized all-gather: {line[:120]}"


def test_airfoil_multiblock_packs():
    """The transfinite C-type airfoil quilt embeds on a multi-block canvas."""
    mesh = geometry.airfoil(refinement=0)
    data = assembly.assemble(mesh)
    sd = multiblock.pack_multiblock(data, mesh, pad_minor=8, pad_major=8)
    assert sd.n_nodes == int((~data.is_constrained).sum())
    # every directed edge resolved: owner-row mask count equals nnz
    # (ghost rows carry gmap-copied mask entries on top)
    assert int(sd.mask[sd.node_mask > 0].sum()) == len(data.indices)
