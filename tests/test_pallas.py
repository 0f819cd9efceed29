"""Pallas fused-kernel backend vs XLA reference path.

Runs the interpret-mode kernels on CPU (the identical kernels compile for
TPU; tests/conftest.py forces the CPU platform) and checks they reproduce
the XLA phase-function path on a non-trivial vortex flow.

The Mosaic-compiled hardware path is covered by
scripts/test_pallas_hardware.py, which must run OUTSIDE this suite
(conftest pins the CPU platform):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/test_pallas_hardware.py
"""

import jax.numpy as jnp
import numpy as np

from ryujin_tpu.equations.euler import Euler
from ryujin_tpu.equations.euler_initial_states import make_initial_state
from ryujin_tpu.offline import assembly, geometry, structured
from ryujin_tpu.postprocess.error import interpolate_nodal
from ryujin_tpu.solver.hyperbolic import HyperbolicModule
from ryujin_tpu.solver.integrator import TimeIntegrator


def test_pallas_periodic_ghost_canvas():
    """Periodic-y canvases carry ghost bands refreshed between kernels;
    both the XLA roll path and the pallas kernels must reproduce the ELL
    reference on a fully periodic vortex."""
    from ryujin_tpu.offline import ell
    from ryujin_tpu.offline.mesh import Boundary

    eq = Euler(dim=2)
    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], refinement=4,
        boundary_conditions=[Boundary.periodic] * 4,
    )
    data = assembly.assemble(mesh)
    init = make_initial_state(
        eq, "isentropic vortex", direction=[1, 1], position=[0, 0],
        mach_number=1.0, beta=5.0,
    )
    sd = structured.pack_structured(data, mesh)
    assert any(g is not None for g in sd.ghosts), "expected y ghost band"
    res = {}
    for name, packed, be in (
        ("ell", ell.pack(data), "xla"),
        ("xla", sd, "xla"),
        ("pallas", sd, "pallas_interpret"),
    ):
        hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64,
                              backend=be)
        ti = TimeIntegrator(hm, "erk 33", cfl_min=0.3, cfl_max=0.3,
                            cfl_recovery_strategy="none")
        U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
        out = ti.advance(U, 0.0, 3)
        real = np.asarray(packed.node_mask) > 0
        pos = np.asarray(packed.positions)[real]
        order = np.lexsort(pos.T)
        res[name] = (np.asarray(out[0])[:, real][:, order], float(out[3]))
    for name in ("xla", "pallas"):
        np.testing.assert_allclose(
            res[name][0], res["ell"][0], rtol=5e-11, atol=1e-12,
            err_msg=name,
        )
        assert abs(res[name][1] / res["ell"][1] - 1.0) < 1e-12, name


def test_pallas_interpret_matches_xla_3d():
    """3D canvas kernels (z-slab tiles, one-plane z halo) vs the XLA
    roll-based path on a smooth-bump flow."""
    import jax

    eq = Euler(dim=3)
    from ryujin_tpu.offline.mesh import Boundary

    mesh = geometry.rectangular_domain(
        [0, 0, 0], [1, 1, 1], [1, 1, 1], 3,
        [Boundary.dirichlet] * 6, dim=3,
    )
    data = assembly.assemble(mesh)
    packed = structured.pack_structured(data, mesh)
    init = make_initial_state(
        eq, "uniform", primitive_state=(1.4, 1.0, 0.2, 0.1, 1.0)
    )
    res = {}
    for be in ("xla", "pallas_interpret"):
        hm = HyperbolicModule(eq, packed, init, dtype=jnp.float32, backend=be)
        ti = TimeIntegrator(
            hm, "erk 33", cfl_min=0.3, cfl_max=0.3,
            cfl_recovery_strategy="none",
        )
        U = interpolate_nodal(init, packed, eq, 0.0, jnp.float32)
        # non-trivial smooth density/energy bump so every kernel phase
        # (riemann, indicator, limiter newton) does real work:
        pos = jnp.asarray(packed.positions.T, jnp.float32)
        bump = 1.0 + 0.3 * jnp.exp(
            -20.0 * jnp.sum((pos - 0.5) ** 2, axis=0)
        )
        U = U.at[0].mul(bump)
        U = U.at[4].mul(bump)
        out = ti.advance(U, 0.0, 1)
        res[be] = (np.asarray(out[0]), float(out[2]))
    assert abs(res["xla"][1] / res["pallas_interpret"][1] - 1.0) < 1e-4
    d = np.abs(res["xla"][0] - res["pallas_interpret"][0]).max()
    assert np.isfinite(res["pallas_interpret"][0]).all()
    assert d < 2e-4, d


def test_pallas_separable_statics_match_full(monkeypatch):
    """Separable-statics kernels (offline/separable.py: c_ij / m_ij /
    mask / cmax synthesized from 2D-field x z-profile factors) against
    the full-canvas kernels on the same extruded 3D box, including the
    pre-scaled wavespeed path (e = lambda * cmax from PK1)."""
    eq = Euler(dim=3)
    from ryujin_tpu.offline.mesh import Boundary

    mesh = geometry.rectangular_domain(
        [0, 0, 0], [1, 1, 1], [1, 1, 1], 3,
        [Boundary.dirichlet, Boundary.do_nothing, Boundary.slip,
         Boundary.slip, Boundary.slip, Boundary.slip], dim=3,
    )
    data = assembly.assemble(mesh)
    packed = structured.pack_structured(data, mesh)
    init = make_initial_state(
        eq, "uniform", primitive_state=(1.4, 1.0, 0.2, 0.1, 1.0)
    )
    res = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("RYUJIN_SEP", mode)
        hm = HyperbolicModule(
            eq, packed, init, dtype=jnp.float32, backend="pallas_interpret"
        )
        if mode == "1":
            assert hm._pallas.sep is not None, "box must factor"
            # the full static canvases are not materialized in sep mode
            assert hm._pallas.arrays.g_cij.shape[1] == 0
        U = interpolate_nodal(init, packed, eq, 0.0, jnp.float32)
        pos = jnp.asarray(packed.positions.T, jnp.float32)
        bump = 1.0 + 0.3 * jnp.exp(
            -20.0 * jnp.sum((pos - 0.5) ** 2, axis=0)
        )
        U = U.at[0].mul(bump)
        U = U.at[4].mul(bump)
        ti = TimeIntegrator(
            hm, "erk 33", cfl_min=0.3, cfl_max=0.3,
            cfl_recovery_strategy="none",
        )
        out = ti.advance(U, 0.0, 1)
        res[mode] = (np.asarray(out[0]), float(out[2]))
    assert abs(res["1"][1] / res["0"][1] - 1.0) < 1e-9
    d = np.abs(res["1"][0] - res["0"][0]).max()
    assert np.isfinite(res["1"][0]).all()
    assert d < 1e-6, d


def test_pallas_interpret_matches_xla():
    eq = Euler(dim=2)
    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], refinement=4,
        boundary_conditions=[4, 4, 4, 4],
    )
    data = assembly.assemble(mesh)
    packed = structured.pack_structured(data, mesh)
    init = make_initial_state(
        eq, "isentropic vortex", direction=[1, 1], position=[-1, -1],
        mach_number=1.0, beta=5.0,
    )
    res = {}
    for be in ("xla", "pallas_interpret"):
        hm = HyperbolicModule(eq, packed, init, dtype=jnp.float32, backend=be)
        ti = TimeIntegrator(
            hm, "erk 33", cfl_min=0.3, cfl_max=0.3,
            cfl_recovery_strategy="none",
        )
        U = interpolate_nodal(init, packed, eq, 0.0, jnp.float32)
        out = ti.advance(U, 0.0, 3)
        res[be] = (np.asarray(out[0]), float(out[2]), int(out[5]))
    # same trajectory up to f32 reassociation differences in tau:
    assert abs(res["xla"][1] / res["pallas_interpret"][1] - 1.0) < 1e-4
    d = np.abs(res["xla"][0] - res["pallas_interpret"][0]).max()
    assert np.isfinite(res["pallas_interpret"][0]).all()
    assert d < 2e-4, d


def test_pallas_cylinder_ogrid_matches_ell():
    """The O-grid cylinder (periodic-theta minor axis: the canvas lane
    wrap IS the periodic identification) must reproduce the ELL reference
    under both the XLA roll path and the fused Pallas kernels, on the
    Mach-3 channel flow of the flagship benchmark
    (prm/benchmarks/euler-mach3-cylinder-2d.prm analog)."""
    from ryujin_tpu.offline import ell

    eq = Euler(dim=2)
    mesh = geometry.cylinder(refinement=2)
    data = assembly.assemble(mesh)
    init = make_initial_state(
        eq, "uniform", direction=[1, 0], position=[1, 0],
        primitive_state=[1.4, 3.0, 1.0],
    )
    sd = structured.pack_structured(data, mesh)
    res = {}
    for name, packed, be in (
        ("ell", ell.pack(data), "xla"),
        ("xla", sd, "xla"),
        ("pallas", sd, "pallas_interpret"),
    ):
        hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64,
                              backend=be)
        ti = TimeIntegrator(hm, "erk 33", cfl_min=0.6, cfl_max=0.6,
                            cfl_recovery_strategy="none")
        U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
        out = ti.advance(U, 0.0, 5)
        real = np.asarray(packed.node_mask) > 0
        pos = np.asarray(packed.positions)[real]
        order = np.lexsort(pos.T)
        res[name] = (np.asarray(out[0])[:, real][:, order], float(out[2]))
    for name in ("xla", "pallas"):
        np.testing.assert_allclose(
            res[name][0], res["ell"][0], rtol=5e-11, atol=1e-12,
            err_msg=name,
        )
        assert abs(res[name][1] / res["ell"][1] - 1.0) < 1e-12, name


def test_dense_boundary_conditions_match_scatter(monkeypatch):
    """The dense (where-select) BC application used on large canvases
    (solver/hyperbolic.py _bc_dense) is bitwise-identical to the
    gather/transform/scatter route: apply_boundary_conditions is
    pointwise in (U, normal, dirichlet).  Forced on via RYUJIN_DENSE_BC
    so small test meshes cover the production big-canvas path; a step
    mesh exercises dirichlet + slip + do_nothing and the multi-normal
    corner rounds."""
    from ryujin_tpu.offline.mesh import Boundary

    eq = Euler(dim=2)
    mesh = geometry.step(refinement=0)
    data = assembly.assemble(mesh)
    packed = structured.pack_structured(data, mesh)
    init = make_initial_state(
        eq, "uniform", primitive_state=(1.4, 3.0, 1.0)
    )
    res = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("RYUJIN_DENSE_BC", mode)
        hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
        assert (hm._bc_dense is not None) == (mode == "1")
        ti = TimeIntegrator(hm, "erk 33", cfl_min=0.4, cfl_max=0.8,
                            cfl_recovery_strategy="none")
        U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
        pos = jnp.asarray(packed.positions.T, jnp.float64)
        bump = 1.0 + 0.25 * jnp.exp(
            -8.0 * jnp.sum((pos - jnp.asarray([[1.0], [0.5]])) ** 2, 0)
        )
        U = U.at[0].mul(bump).at[3].mul(bump)
        out = ti.advance(U, 0.0, 3)
        res[mode] = (np.asarray(out[0]), float(out[3]))
    real = np.asarray(packed.node_mask) > 0
    np.testing.assert_array_equal(
        res["1"][0][:, real], res["0"][0][:, real]
    )
    assert res["1"][1] == res["0"][1]


def test_slab_ghost_tile_skip_matches_xla():
    """Unsharded slab canvases enumerate only the real tiles of each
    slab (pallas_step._tiled_call slab_tiles); the ghost-band tiles are
    refreshed between kernels and never computed.  Result must match the
    XLA canvas path (and the plain slabs=1 canvas, which the XLA path
    reproduces exactly)."""
    import numpy as np

    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.offline import assembly, geometry, structured
    from ryujin_tpu.postprocess.error import interpolate_nodal
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule
    from ryujin_tpu.solver.integrator import TimeIntegrator

    eq = Euler(dim=2)
    mesh = geometry.step(refinement=0)
    data = assembly.assemble(mesh)

    def run(slabs, backend):
        packed = structured.pack_structured(data, mesh, slabs=slabs)
        init = lambda x, t: jnp.stack([
            jnp.ones_like(x[0]) * 1.4,
            3.0 * 1.4 * jnp.ones_like(x[0]),
            0 * x[0],
            jnp.ones_like(x[0]) / 0.4 + 0.5 * 1.4 * 9.0,
        ], 0)
        hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64,
                              backend=backend)
        ti = TimeIntegrator(hm, "erk 33", cfl_min=0.4, cfl_max=0.4,
                            cfl_recovery_strategy="none")
        U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
        # layout-independent perturbation so every limiter works:
        pert = 1.0 + 0.2 * np.sin(np.asarray(packed.node_to_vertex) * 0.37)
        U = U * jnp.asarray(
            np.where(packed.node_to_vertex >= 0, pert, 1.0)
        )[None]
        U, tau, ok = ti.step(U, 0.0, 1.0)
        real = np.flatnonzero(packed.node_to_vertex >= 0)
        order = np.argsort(packed.node_to_vertex[real])
        return np.asarray(U)[:, real[order]], float(tau)

    u1x, t1x = run(1, "xla")
    for slabs in (2, 4):
        ux, tx = run(slabs, "xla")
        np.testing.assert_allclose(ux, u1x, rtol=1e-12)
        up, tp = run(slabs, "pallas_interpret")
        assert abs(tp - tx) <= 1e-12 * abs(tx)
        np.testing.assert_allclose(up, ux, rtol=1e-9, atol=1e-12)
