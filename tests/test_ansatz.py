"""Higher-order and discontinuous ansatz spaces (cG Q2/Q3, dG Q0-Q3).

The analog of the reference's Ansatz enum support
(discretization.h:131-173, offline_data.template.h:419-940): assembly
consistency for every space, convergence of the solver on 1D linear
transport, and the dG incidence matrix forcing low-order dissipation
across element interfaces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ryujin_tpu.equations.scalar_conservation import (
    ScalarConservation, function_flux,
)
from ryujin_tpu.offline import assembly, ell, geometry
from ryujin_tpu.offline.ansatz import (
    build_dof_map, gauss_lobatto_points, shape_qp,
)
from ryujin_tpu.offline.mesh import Boundary
from ryujin_tpu.postprocess.error import compute_error, interpolate_nodal
from ryujin_tpu.solver.hyperbolic import (
    HyperbolicModule, HyperbolicModuleParams,
)
from ryujin_tpu.solver.integrator import TimeIntegrator

ALL = ["cG Q2", "cG Q3", "dG Q0", "dG Q1", "dG Q2", "dG Q3"]


def test_gauss_lobatto():
    np.testing.assert_allclose(gauss_lobatto_points(1), [0, 1])
    np.testing.assert_allclose(gauss_lobatto_points(2), [0, 0.5, 1])
    gl3 = gauss_lobatto_points(3)
    np.testing.assert_allclose(gl3[1], 0.5 * (1 - np.sqrt(1 / 5)))


def test_shape_partition_of_unity():
    q = np.random.default_rng(0).random((7, 2))
    for p in (1, 2, 3):
        N, dN = shape_qp(2, p, q)
        np.testing.assert_allclose(N.sum(axis=1), 1.0, atol=1e-13)
        np.testing.assert_allclose(dN.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize("ansatz", ALL)
def test_assembly_validates(ansatz):
    mesh = geometry.rectangular_domain([0, 0], [2, 1], [2, 1], 1,
                                       [4, 2, 2, 2])
    data = assembly.assemble(mesh, ansatz=ansatz)
    data.validate()
    packed = ell.pack(data)
    np.testing.assert_allclose(
        packed.lumped_mass[: packed.n_nodes].sum(), 2.0, rtol=1e-12
    )
    if ansatz.startswith("dG"):
        assert data.incidence is not None
        p = int(ansatz[-1])
        if p % 2 == 1:
            assert np.isclose(data.incidence.max(), 1.0)


def test_dof_sharing_continuous():
    mesh = geometry.rectangular_domain([0, 0], [1, 1], [1, 1], 2, [4] * 4)
    dm = build_dof_map(mesh, "cG Q2")
    # 2 cells sharing an edge share the edge dof:
    nv, nc = mesh.n_vertices, mesh.n_cells
    n_edges = len(np.unique(np.sort(
        mesh.cells[:, [[0, 1], [2, 3], [0, 2], [1, 3]]], axis=2
    ).reshape(-1, 2), axis=0))
    assert dm.n_dofs == nv + n_edges + nc
    # dof positions at shared slots agree between cells:
    pos = dm.positions[dm.cell_dofs]  # [nc, 9, 2]
    flat = dm.cell_dofs.ravel()
    uniq, first = np.unique(flat, return_index=True)
    assert len(uniq) == dm.n_dofs


def _transport(ansatz, ref, scheme="erk 33"):
    eq = ScalarConservation(dim=1, flux=function_flux(1, [lambda u: u]))
    mesh = geometry.rectangular_domain(
        [0], [2 * np.pi], [1], ref,
        boundary_conditions=[Boundary.periodic] * 2, dim=1,
    )
    data = assembly.assemble(mesh, ansatz=ansatz)
    packed = ell.pack(data)
    init = lambda x, t: jnp.sin(x - t)
    p = HyperbolicModuleParams(evc_factor=0.0, limiter_iterations=2)
    hm = HyperbolicModule(eq, packed, init, params=p, dtype=jnp.float64)
    ti = TimeIntegrator(hm, scheme, cfl_min=0.4, cfl_max=0.4,
                        cfl_recovery_strategy="none")
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    t = 0.0
    while t < 1.0 - 1e-12:
        U, tau, ok = ti.step(U, t, 1.0)
        t += float(tau)
    Up, _ = hm.prepare_state_vector(U, t)
    return compute_error(eq, mesh, packed, np.asarray(Up), t, init,
                         components=["u"])[1]


def test_cg_q2_transport_converges():
    e5, e6 = _transport("cG Q2", 5), _transport("cG Q2", 6)
    rate = np.log2(e5 / e6)
    assert rate > 1.7, (e5, e6, rate)


def test_dg_q1_transport_converges():
    e5, e6 = _transport("dG Q1", 5), _transport("dG Q1", 6)
    rate = np.log2(e5 / e6)
    # incidence = 1 forces low-order dissipation at interfaces -> 1st order
    assert rate > 0.8, (e5, e6, rate)
    assert e6 < 0.05


def test_driver_ansatz(tmp_path):
    from ryujin_tpu.config import Config
    from ryujin_tpu.driver import TimeLoop

    cfg = Config()
    cfg.time_loop.basename = str(tmp_path / "dg")
    cfg.time_loop.final_time = 0.3
    cfg.time_loop.timer_granularity = 0.3
    cfg.time_loop.enable_compute_error = True
    cfg.time_loop.enable_output_full = True
    cfg.equation.equation = "scalar conservation"
    cfg.equation.dimension = 2
    cfg.equation.parameters = {"flux": "burgers"}
    cfg.discretization.mesh_refinement = 3
    cfg.discretization.ansatz = "dG Q1"
    cfg.discretization.parameters = {
        "position_bottom_left": [-2, -2],
        "position_top_right": [2, 2],
        "boundary_conditions": ["dirichlet"] * 4,
    }
    cfg.initial_values.configuration = "function"
    cfg.initial_values.parameters = {"expression": "exp(-2*(x*x+y*y))"}
    loop = TimeLoop(cfg)
    assert loop.packed.ansatz == "dG Q1"
    result = loop.run(quiet=True)
    U = np.asarray(result["U"])[:, : loop.packed.n_nodes]
    assert np.isfinite(U).all()
    assert np.isfinite(result["L2"])
    import os

    vtus = [f for f in os.listdir(tmp_path) if f.endswith(".vtu")]
    assert vtus


@pytest.mark.parametrize("ansatz", ["cG Q2", "cG Q3", "dG Q0", "dG Q1",
                                    "dG Q2"])
def test_assembly_validates_3d(ansatz):
    mesh = geometry.rectangular_domain(
        [0, 0, 0], [1, 1, 2], [1, 1, 2], 0, [2, 2, 2, 2, 2, 2], dim=3
    ).refine_global(1)
    data = assembly.assemble(mesh, ansatz=ansatz)
    data.validate()
    np.testing.assert_allclose(
        data.lumped_mass[~data.is_constrained].sum(), 2.0, rtol=1e-12
    )
    if ansatz.startswith("dG"):
        assert data.incidence is not None


def test_cg_q2_3d_dof_sharing():
    mesh = geometry.rectangular_domain(
        [0, 0, 0], [1, 1, 1], [1, 1, 1], 0, [2] * 6, dim=3
    ).refine_global(1)
    dm = build_dof_map(mesh, "cG Q2")
    # 8 cells: 27 vertices + 54 unique edges + 36 unique faces + 8 interiors
    assert dm.n_dofs == 27 + 54 + 36 + 8
    # shared dofs must carry one unique position each:
    pos = dm.positions
    uniq = np.unique(np.round(pos, 12), axis=0)
    assert len(uniq) == dm.n_dofs
    # every cell's 27 dof positions must match the geometric lattice:
    from ryujin_tpu.offline.ansatz import _local_lattice, _q1_geometry_map

    lat = _q1_geometry_map(mesh, _local_lattice(3, 2))
    np.testing.assert_allclose(pos[dm.cell_dofs], lat, atol=1e-12)


@pytest.mark.parametrize("ansatz", ["cG Q2", "dG Q1"])
def test_euler_step_3d(ansatz):
    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule

    eq = Euler(dim=3)
    mesh = geometry.rectangular_domain(
        [0, 0, 0], [1, 1, 1], [1, 1, 1], 0, [2] * 6, dim=3
    ).refine_global(2)
    packed = ell.pack(assembly.assemble(mesh, ansatz=ansatz))

    def init(x, t):
        rho = 1.0 + 0.1 * jnp.sin(2 * np.pi * x[0])
        z = 0 * rho
        return jnp.stack(
            [rho, 0.1 * rho, z, z, 1.0 / 0.4 + 0.5 * 0.01 * rho], 0
        )

    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    ti = TimeIntegrator(hm, "erk 33", cfl_min=0.3, cfl_max=0.3,
                        cfl_recovery_strategy="none")
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    U2, tau, ok = ti.step(U, 0.0, 1.0)
    assert bool(ok)
    assert np.isfinite(np.asarray(U2)).all()
