"""Offline-data consistency tests.

Ports the reference's DEBUG-mode self checks
(/root/reference/source/offline_data.template.h:1002-1104): total mass
equals |Omega|, mass-matrix row sums equal the lumped mass, m_ij symmetry,
c_ij antisymmetry away from the boundary, zero c row sums.
"""

import numpy as np
import pytest

from ryujin_tpu.offline import assembly, ell, geometry
from ryujin_tpu.offline.mesh import Boundary


def test_rectangle_assembly_consistency():
    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], refinement=3,
        boundary_conditions=[Boundary.dirichlet] * 4,
    )
    data = assembly.assemble(mesh)
    assert abs(data.measure_of_omega - 100.0) < 1e-12
    data.validate()


def test_rectangle_counts():
    mesh = geometry.rectangular_domain(
        [0, 0], [1, 1], [1, 1], refinement=2,
        boundary_conditions=[Boundary.dirichlet] * 4,
    )
    assert mesh.n_vertices == 25
    assert mesh.n_cells == 16
    data = assembly.assemble(mesh)
    # interior node of a uniform Q1 mesh: lumped mass = h^2
    h = 0.25
    interior = np.flatnonzero(
        (np.abs(data.positions - 0.5).max(axis=1) < 0.3)
    )
    np.testing.assert_allclose(data.lumped_mass[interior], h * h, rtol=1e-12)


def test_ell_pack_roundtrip():
    mesh = geometry.rectangular_domain(
        [0, 0], [1, 1], [1, 1], refinement=3,
        boundary_conditions=[Boundary.dirichlet] * 4,
    )
    data = assembly.assemble(mesh)
    packed = ell.pack(data)
    K = packed.max_degree
    assert K == 8
    n = packed.n_pad

    # transpose map correctness: cols[trans // K, trans % K] picks back i
    tr = packed.trans
    j_of = packed.cols[tr // K, tr % K]
    expect = np.tile(np.arange(n)[:, None], (1, K))
    sel = packed.mask > 0
    np.testing.assert_array_equal(j_of[sel], expect[sel])

    # c antisymmetry through the transpose map (interior nodes)
    cT = packed.cij.reshape(-1, 2)[tr]
    boundary_nodes = set()
    for rnd in packed.boundary_rounds:
        for g in rnd.values():
            boundary_nodes.update(g.index.tolist())
    for i in range(packed.n_nodes):
        if i in boundary_nodes:
            continue
        for k in range(K):
            if packed.mask[i, k]:
                np.testing.assert_allclose(
                    packed.cij[i, k], -cT[i, k], atol=1e-13
                )


def test_boundary_map_rectangle():
    mesh = geometry.rectangular_domain(
        [0, 0], [2, 1], [2, 1], refinement=1,
        boundary_conditions=[
            Boundary.dirichlet, Boundary.do_nothing,
            Boundary.slip, Boundary.slip,
        ],
    )
    data = assembly.assemble(mesh)
    ids = {}
    for rnd in data.boundary_rounds:
        for fid, g in rnd.items():
            ids.setdefault(fid, 0)
            ids[fid] += len(g.index)
    # 4x2 cells: left edge has 3 nodes, right edge 3, bottom 5, top 5,
    # with corners double counted in separate groups/rounds.
    assert ids[int(Boundary.dirichlet)] == 3
    assert ids[int(Boundary.do_nothing)] == 3
    # slip groups cover top and bottom nodes
    assert ids[int(Boundary.slip)] >= 8

    # normals on the bottom boundary point in -y:
    for rnd in data.boundary_rounds:
        g = rnd.get(int(Boundary.slip))
        if g is None:
            continue
        bottom = data.positions[g.index][:, 1] < 1e-12
        np.testing.assert_allclose(
            g.normal[bottom], np.tile([0.0, -1.0], (bottom.sum(), 1)),
            atol=1e-12,
        )


def test_step_geometry():
    mesh = geometry.step(refinement=0)
    data = assembly.assemble(mesh)
    # measure: full channel minus step = 3*1 - 2.4*0.2 rounded corner adds
    # a tiny sliver; check within 1%:
    assert abs(data.measure_of_omega - (3.0 - 2.4 * 0.2)) < 1e-2
    data_ids = set(mesh.boundary_ids.tolist())
    assert int(Boundary.dirichlet) in data_ids
    assert int(Boundary.slip) in data_ids
    assert int(Boundary.do_nothing) in data_ids


def test_periodic_pairs_1d_graph():
    mesh = geometry.rectangular_domain(
        [0], [1], [1], refinement=3,
        boundary_conditions=[Boundary.periodic, Boundary.periodic],
        dim=1,
    )
    data = assembly.assemble(mesh)
    data.validate()
    packed = ell.pack(data)
    # 8 cells, 9 vertices, one constrained -> 8 real nodes, all degree 2
    assert packed.n_nodes == 8
    deg = packed.mask.sum(axis=1)[: packed.n_nodes]
    np.testing.assert_array_equal(deg, 2)
