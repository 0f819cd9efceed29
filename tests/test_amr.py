"""AMR: mesh adaptor + local refinement + solution transfer.

The analog of the reference's AMR smoke tests
(tests/euler/amr-global_refinement.prm, amr-random_adaptation.prm): the
isentropic vortex on an l4 mesh with adaptation cycles at t = 1.0, 1.5.
The global-refinement variant must land on 4225 dofs with errors matching
the reference output (amr-global_refinement.output: Linf 0.3879,
L1 0.02910, L2 0.06815 normalized); random adaptation must stay
conforming, admissible, and finite.
"""

import numpy as np
import pytest

from ryujin_tpu.config import Config
from ryujin_tpu.driver import TimeLoop
from ryujin_tpu.offline import assembly, ell, geometry
from ryujin_tpu.offline.mesh import Boundary, refine_local
from ryujin_tpu.offline.mesh_adaptor import MeshAdaptor, transfer_state


def _vortex_amr_config(tmp_path, strategy):
    cfg = Config()
    cfg.time_loop.basename = str(tmp_path / "amr")
    cfg.time_loop.final_time = 2.0
    cfg.time_loop.timer_granularity = 0.5
    cfg.time_loop.enable_compute_error = True
    cfg.time_loop.error_normalize = True
    cfg.equation.equation = "euler"
    cfg.equation.dimension = 2
    cfg.discretization.mesh_refinement = 4
    cfg.discretization.parameters = {
        "position_bottom_left": [-5, -5],
        "position_top_right": [5, 5],
        "boundary_conditions": ["dirichlet"] * 4,
    }
    cfg.initial_values.configuration = "isentropic vortex"
    cfg.initial_values.direction = [1, 1]
    cfg.initial_values.position = [-1, -1]
    cfg.initial_values.parameters = {"mach_number": 1.0, "beta": 5.0}
    cfg.time_integrator.time_stepping_scheme = "erk 33"
    cfg.time_integrator.cfl_min = 0.2
    cfg.time_integrator.cfl_max = 0.2
    cfg.time_integrator.cfl_recovery_strategy = "none"
    cfg.mesh_adaptor.adaptation_strategy = strategy
    cfg.mesh_adaptor.adaptation_time_points = [1.0, 1.5]
    return cfg


def test_transfer_preserves_linear_fields():
    mesh = geometry.rectangular_domain([0, 0], [1, 1], [1, 1], 2, [4] * 4)
    packed = ell.pack(assembly.assemble(mesh))
    U = np.stack(
        [np.ones(packed.n_pad),
         2.0 * packed.positions[:, 0] + 3.0 * packed.positions[:, 1]]
    )
    rng = np.random.default_rng(3)
    m, p = mesh, packed
    for _ in range(2):
        m2, T = refine_local(m, rng.random(m.n_cells) < 0.4)
        p2 = ell.pack(assembly.assemble(m2))
        U = transfer_state(U, p, m, T, m2, p2)
        m, p = m2, p2
    ref = 2.0 * p.positions[:, 0] + 3.0 * p.positions[:, 1]
    n = p.n_nodes
    np.testing.assert_allclose(U[0, :n], 1.0, atol=1e-12)
    np.testing.assert_allclose(U[1, :n], ref[:n], atol=1e-12)


@pytest.mark.slow
def test_amr_global_refinement(tmp_path):
    loop = TimeLoop(_vortex_amr_config(tmp_path, "global refinement"))
    assert loop.packed.n_nodes == 17 * 17
    result = loop.run(quiet=True)
    assert loop.packed.n_nodes == 65 * 65
    # reference amr-global_refinement.output values:
    assert abs(result["Linf"] - 0.38790) < 0.01
    assert abs(result["L1"] - 0.029098) < 0.001
    assert abs(result["L2"] - 0.068148) < 0.002


@pytest.mark.slow
def test_amr_random_adaptation(tmp_path):
    cfg = _vortex_amr_config(tmp_path, "random adaptation")
    loop = TimeLoop(cfg)
    result = loop.run(quiet=True)
    assert loop.packed.n_nodes > 17 * 17
    assert loop.mesh.hanging is not None and len(loop.mesh.hanging)
    U = np.asarray(result["U"])
    assert np.isfinite(U[:, : loop.packed.n_nodes]).all()
    assert bool(
        np.asarray(loop.eq.is_admissible(
            result["U"][:, : loop.packed.n_nodes])).all()
    )
    assert np.isfinite(result["L2"])


def test_amr_checkpoint_resume_composes(tmp_path):
    """A checkpoint written AFTER a mesh adaptation must resume: the mesh
    is serialized into the checkpoint and rebuilt on load (the analog of
    triangulation.save / load in time_loop.template.h:537-611, 440-533).
    The resumed run must reproduce the unresumed run exactly."""
    import dataclasses

    def cfg_for(name, final_time, resume=False):
        cfg = _vortex_amr_config(tmp_path, "random adaptation")
        cfg.time_loop.basename = str(tmp_path / name)
        cfg.time_loop.final_time = final_time
        cfg.time_loop.timer_granularity = 0.4
        cfg.time_loop.enable_checkpointing = True
        cfg.time_loop.resume = resume
        cfg.discretization.mesh_refinement = 3
        cfg.mesh_adaptor.adaptation_time_points = [0.4]
        return cfg

    # part 1: run to t=0.8 (adaptation at 0.4, checkpoint at 0.8 on the
    # ADAPTED mesh), then resume to t=1.2
    loop_a = TimeLoop(cfg_for("ckpt", 0.8))
    loop_a.run(quiet=True)
    assert loop_a.mesh.hanging is not None  # the mesh really adapted
    n_adapted = loop_a.packed.n_nodes

    loop_b = TimeLoop(cfg_for("ckpt", 1.2, resume=True))
    assert loop_b.packed.n_nodes != n_adapted  # config mesh differs
    result_b = loop_b.run(quiet=True)
    assert loop_b.packed.n_nodes == n_adapted  # rebuilt on restored mesh

    # reference: one unresumed run to t=1.2
    loop_c = TimeLoop(cfg_for("ref", 1.2))
    result_c = loop_c.run(quiet=True)

    assert loop_b.packed.n_nodes == loop_c.packed.n_nodes
    n = loop_c.packed.n_nodes
    np.testing.assert_allclose(
        np.asarray(result_b["U"])[:, :n],
        np.asarray(result_c["U"])[:, :n],
        rtol=0, atol=1e-12,
    )
    assert abs(result_b["L2"] - result_c["L2"]) < 1e-12


def test_coarsening_roundtrip():
    """Refine a patch, coarsen every child back: the mesh returns to the
    original (up to vertex numbering) and the composed transfer is the
    exact vertex permutation — so any transferred state (and its mass)
    round-trips exactly.  The coarsening half of the reference's
    fixed-number marking (mesh_adaptor.h:133-149)."""
    from scipy.spatial import cKDTree

    from ryujin_tpu.offline.mesh import coarsen_local

    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], 3, [4] * 4
    )
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    m2, T1 = refine_local(mesh, (np.abs(centers) < 2.0).all(axis=1))
    assert m2.hanging is not None and len(m2.hanging)

    m3, T2, cmap = coarsen_local(m2, np.ones(m2.n_cells, bool))
    assert m3.n_cells == mesh.n_cells
    assert m3.n_vertices == mesh.n_vertices
    assert m3.hanging is None
    assembly.assemble(m3).validate()

    # composed transfer == vertex permutation (injection of the original):
    R = (T2 @ T1).toarray()
    d, idx = cKDTree(mesh.vertices).query(m3.vertices)
    assert d.max() < 1e-12
    P = np.zeros((mesh.n_vertices, mesh.n_vertices))
    P[np.arange(len(idx)), idx] = 1.0
    np.testing.assert_allclose(R, P, atol=1e-14)

    # a nodal state round-trips exactly -> its lumped mass is conserved:
    U = 1.0 + 0.1 * mesh.vertices[:, 0] + 0.2 * mesh.vertices[:, 1] ** 2
    np.testing.assert_allclose(R @ U, U[idx], rtol=0, atol=0)


def test_coarsening_partial_and_blocked():
    """Partial coarsening keeps the mesh conforming (new hanging nodes on
    merged edges whose neighbor stays fine); coarsening under a finer
    neighbor is blocked (conservative 2:1 guard)."""
    from ryujin_tpu.offline.mesh import coarsen_local

    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], 3, [4] * 4
    )
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    m2, _ = refine_local(mesh, (np.abs(centers) < 2.0).all(axis=1))

    rng = np.random.default_rng(5)
    m4, _, _ = coarsen_local(m2, rng.random(m2.n_cells) < 0.7)
    assert mesh.n_cells < m4.n_cells < m2.n_cells
    assembly.assemble(m4).validate()

    # nested refinement: quartets under a finer neighbor must NOT coarsen
    centers2 = m2.vertices[m2.cells].mean(axis=1)
    m5, _ = refine_local(m2, (np.abs(centers2) < 1.0).all(axis=1))
    m6, _, _ = coarsen_local(m5, np.ones(m5.n_cells, bool))
    assert m6.n_cells > mesh.n_cells  # the nested level survived
    assembly.assemble(m6).validate()
    lvl = m6.cell_levels
    # conforming 2:1: levels of edge-adjacent cells differ by at most 1
    assert lvl.max() - lvl.min() <= 2


def test_adaptor_coarsen_and_refine_cycle():
    """MeshAdaptor.adapt applies coarsening marks first, carries the
    refinement marks across the cell renumbering, and composes the two
    transfers: with deterministic marks (coarsen the previously refined
    patch, refine a disjoint patch) a linear field survives exactly and
    the coarsened region really shrinks."""
    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], 3, [4] * 4
    )
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    m1, T1 = refine_local(mesh, (np.abs(centers - 2.5) < 2.0).all(axis=1))
    p1 = ell.pack(assembly.assemble(m1))
    U = np.stack(
        [np.ones(p1.n_pad),
         2.0 * p1.positions[:, 0] + 3.0 * p1.positions[:, 1]]
    )

    ma = MeshAdaptor(adaptation_strategy="random adaptation")

    def marks(m):
        # coarsen every refined child; refine a disjoint corner patch
        c = m.vertices[m.cells].mean(axis=1)
        coarsen = m.cell_origin[:, 0] >= 0
        refine = (np.abs(c + 3.5) < 1.0).all(axis=1) & ~coarsen
        return refine, coarsen

    ma.mark_cells = marks
    m2, T = ma.adapt(m1)
    assert m2.n_cells < m1.n_cells  # the quartets really merged
    assembly.assemble(m2).validate()
    p2 = ell.pack(assembly.assemble(m2))
    U = transfer_state(U, p1, m1, T, m2, p2)
    ref = 2.0 * p2.positions[:, 0] + 3.0 * p2.positions[:, 1]
    n = p2.n_nodes
    np.testing.assert_allclose(U[0, :n], 1.0, atol=1e-12)
    np.testing.assert_allclose(U[1, :n], ref[:n], atol=1e-12)


def test_mesh_adaptor_time_points():
    ma = MeshAdaptor(adaptation_time_points=[1.0, 1.5])
    ma.prepare(0.0)
    ma.analyze(None, 0.9, 1)
    assert not ma.need_mesh_adaptation
    ma.analyze(None, 1.0, 2)
    assert ma.need_mesh_adaptation
    assert ma.adaptation_time_points == [1.5]
    ma.need_mesh_adaptation = False
    ma.analyze(None, 1.7, 3)
    assert ma.need_mesh_adaptation
    assert ma.adaptation_time_points == []


def test_periodic_plus_hanging():
    """Periodic constraints and hanging nodes COMPOSE through the shared
    master map (VERDICT r4 item 9; the reference composes them in one
    AffineConstraints object, offline_data.template.h:186-416).  Local
    refinement away from the periodic seam; assembly validates and the
    solver conserves mass exactly."""
    import jax.numpy as jnp

    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.offline import ell
    from ryujin_tpu.postprocess.error import interpolate_nodal
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule
    from ryujin_tpu.solver.integrator import TimeIntegrator

    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], 3, [Boundary.periodic] * 4
    )
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    mesh2, _ = refine_local(mesh, (np.abs(centers) < 2.0).all(axis=1))
    assert mesh2.hanging is not None and len(mesh2.hanging)
    data = assembly.assemble(mesh2)
    data.validate()
    np.testing.assert_allclose(
        data.lumped_mass[~data.is_constrained].sum(), 100.0, rtol=1e-12
    )

    eq = Euler(dim=2)

    def init(x, t):
        rho = 1.0 + 0.1 * jnp.sin(0.2 * np.pi * x[0])
        return jnp.stack(
            [rho, 0.1 * rho, 0 * rho, jnp.ones_like(rho) / 0.4], 0
        )

    packed = ell.pack(data)
    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    ti = TimeIntegrator(hm, "erk 33", cfl_min=0.3, cfl_max=0.3,
                        cfl_recovery_strategy="none")
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    m = np.asarray(packed.lumped_mass)
    nm = np.asarray(packed.node_mask) > 0
    m0 = float((np.asarray(U)[0] * m)[nm].sum())
    t = 0.0
    for _ in range(2):
        U, tau, ok = ti.step(U, t, 1.0)
        t += float(tau)
        assert bool(ok)
    m2 = float((np.asarray(U)[0] * m)[nm].sum())
    np.testing.assert_allclose(m2, m0, rtol=1e-12)


def test_hanging_on_seam_rejected():
    """Refinement touching the periodic seam raises the documented
    NotImplementedError instead of silently mis-assembling."""
    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], 3, [Boundary.periodic] * 4
    )
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    flags = centers[:, 0] > 3.0  # touches the x = 5 seam
    mesh2, _ = refine_local(mesh, flags)
    with pytest.raises(NotImplementedError):
        assembly.assemble(mesh2)
