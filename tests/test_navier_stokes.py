"""Navier-Stokes verification: Becker's viscous shock.

Mirrors the reference testsuite
(tests/navier_stokes/verification-becker_solution-erk_33-*.output):
strang erk33 cn, CFL 0.1, mu 0.01, kappa = c_v^-1 1.8667e-2,
l6 (129 dofs): L1 = 4.0607e-4; l7 (257 dofs): L1 = 8.7963e-5.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ryujin_tpu.equations.euler import Euler
from ryujin_tpu.equations.euler_initial_states import make_initial_state
from ryujin_tpu.offline import assembly, ell, geometry
from ryujin_tpu.offline.mesh import Boundary
from ryujin_tpu.postprocess.error import compute_error, interpolate_nodal
from ryujin_tpu.solver.hyperbolic import HyperbolicModule
from ryujin_tpu.solver.integrator import TimeIntegrator
from ryujin_tpu.solver.parabolic import ParabolicSolver, ParabolicSystem


def _run_becker(refinement, gmg=False, gmg_velocity=True, gmg_energy=True):
    eq = Euler(dim=1)
    init = make_initial_state(
        eq, "becker solution", position=[-0.125],
        velocity_galilean_frame=0.125, density_left=1.0,
        velocity_left=1.0, velocity_right=0.259259259259, mu=0.01,
    )
    mesh = geometry.rectangular_domain(
        [-0.25], [0.25], [1], refinement=refinement,
        boundary_conditions=[Boundary.dirichlet] * 2, dim=1,
    )
    data = assembly.assemble(mesh)
    packed = ell.pack(data)
    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    gmg_params, chain = None, None
    if gmg:
        from ryujin_tpu.solver.gmg import GMGParams

        gmg_params = GMGParams(velocity=gmg_velocity, energy=gmg_energy)
        chain = [geometry.rectangular_domain(
            [-0.25], [0.25], [1], refinement=refinement - 3,
            boundary_conditions=[Boundary.dirichlet] * 2, dim=1,
        )]
        for _ in range(3):
            chain.append(chain[-1].refine_global(1))
    ps = ParabolicSolver(
        eq, ParabolicSystem(mu=0.01, lambda_=0.0,
                            cv_inverse_kappa=1.866666666666666e-2),
        packed, data, mesh, init, hm.stencil, dtype=jnp.float64,
        gmg_params=gmg_params, mesh_chain=chain,
    )
    if gmg:
        assert ps.gmg is not None
    ti = TimeIntegrator(hm, "strang erk 33 cn", cfl_min=0.1, cfl_max=0.1,
                        cfl_recovery_strategy="none", parabolic_module=ps)
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    t = 0.0
    while t < 2.0 - 1e-10:
        U, _, t_dev, tau, _, _ = ti.advance(U, t, 40, t_final=2.0)
        t = float(t_dev)
        assert float(tau) > 0 or t >= 2.0 - 1e-10
    return compute_error(eq, mesh, packed, np.asarray(U), t, init,
                         components=["rho", "m", "E"])


def test_becker_l6():
    """129 dofs; reference L1 = 4.0607e-4 (within 20%: the stress
    dissipation uses the nodal-gradient approximation)."""
    linf, l1, l2 = _run_becker(7)
    assert abs(l1 / 4.0607e-4 - 1.0) < 0.02, l1


@pytest.mark.slow
def test_becker_l7():
    """257 dofs; reference L1 = 8.7963e-5."""
    linf, l1, l2 = _run_becker(8)
    assert abs(l1 / 8.7963e-5 - 1.0) < 0.05, l1


def test_imex_11_runs():
    """imex 11: forward-Euler IDP + backward-Euler parabolic step."""
    eq = Euler(dim=1)
    init = make_initial_state(
        eq, "becker solution", position=[-0.125],
        velocity_galilean_frame=0.125, mu=0.01,
    )
    mesh = geometry.rectangular_domain(
        [-0.25], [0.25], [1], refinement=6,
        boundary_conditions=[Boundary.dirichlet] * 2, dim=1,
    )
    data = assembly.assemble(mesh)
    packed = ell.pack(data)
    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    ps = ParabolicSolver(
        eq, ParabolicSystem(mu=0.01), packed, data, mesh, init,
        hm.stencil, dtype=jnp.float64,
    )
    ti = TimeIntegrator(hm, "imex 11", cfl_min=0.2, cfl_max=0.2,
                        cfl_recovery_strategy="none", parabolic_module=ps)
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    U, _, t, tau, _, _ = ti.advance(U, 0.0, 10)
    assert float(tau) > 0
    assert np.isfinite(np.asarray(U)).all()


def test_skeleton_module_runs():
    """The skeleton template equation advances without changing the state."""
    from ryujin_tpu.equations.skeleton import Skeleton

    eq = Skeleton(dim=1)

    def init(points, t):
        return jnp.sin(points[0])[None]

    mesh = geometry.rectangular_domain(
        [0.0], [1.0], [1], refinement=4,
        boundary_conditions=[Boundary.do_nothing] * 2, dim=1,
    )
    packed = ell.pack(assembly.assemble(mesh))
    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    ti = TimeIntegrator(hm, "erk 33", cfl_min=0.5, cfl_max=0.5,
                        cfl_recovery_strategy="none")
    U0 = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    U, _, t, tau, _, _ = ti.advance(U0, 0.0, 5)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U0), atol=1e-14)


def test_becker_l6_gmg():
    """GMG-preconditioned CG (multigrid velocity + energy, the analog of
    tests/navier_stokes/gmg_velocity_energy.prm) reproduces the same
    Becker solution as the diagonal preconditioner."""
    linf, l1, l2 = _run_becker(7, gmg=True)
    assert abs(l1 / 4.0607e-4 - 1.0) < 0.02, l1


@pytest.mark.parametrize("vel,en", [(True, False), (False, True)])
@pytest.mark.slow
def test_becker_l6_gmg_single_sided(vel, en):
    """Velocity-only / energy-only multigrid (the analog of
    tests/navier_stokes/gmg_velocity.prm and gmg_energy.prm)."""
    linf, l1, l2 = _run_becker(7, gmg=True, gmg_velocity=vel,
                               gmg_energy=en)
    assert abs(l1 / 4.0607e-4 - 1.0) < 0.02, l1
