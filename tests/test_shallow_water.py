"""Shallow water verification.

Mirrors the reference testsuite (tests/shallow_water/):
  * paraboloid 1D (planar flow in a parabolic basin, dry states +
    well-balanced topography), erk33, l7: L1 = 1.54e-5
  * Ritter dam break (expansion into a dry state), erk33, l7:
    L1 = 2.03e-5
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ryujin_tpu.equations.shallow_water import (
    ShallowWater,
    ShallowWaterParams,
    SWLimiterOptions,
)
from ryujin_tpu.equations import shallow_water_initial_states as sw_states
from ryujin_tpu.offline import assembly, ell, geometry
from ryujin_tpu.offline.mesh import Boundary
from ryujin_tpu.postprocess.error import compute_error, interpolate_nodal
from ryujin_tpu.solver.hyperbolic import HyperbolicModule
from ryujin_tpu.solver.integrator import TimeIntegrator


def _run(eq, init, mesh, t_final, cfl, refinement_note="", max_steps=100000,
         components=("h",)):
    data = assembly.assemble(mesh)
    packed = ell.pack(data)
    pos = jnp.asarray(packed.positions.T, jnp.float64)
    init_prec = init.bathymetry(pos)[None]
    hm = HyperbolicModule(
        eq, packed, init.state, dtype=jnp.float64,
        initial_precomputed=init_prec,
    )
    ti = TimeIntegrator(hm, "erk 33", cfl_min=cfl, cfl_max=cfl,
                        cfl_recovery_strategy="none")
    U = interpolate_nodal(init.state, packed, eq, 0.0, jnp.float64)
    t = 0.0
    n = 0
    while t < t_final - 1e-10 and n < max_steps:
        U, _, t_dev, tau, _, _ = ti.advance(U, t, 50, t_final=t_final)
        t = float(t_dev)
        n += 50
        assert float(tau) > 0 or t >= t_final - 1e-10
    return compute_error(eq, mesh, packed, np.asarray(U), t, init.state,
                         components=list(components)), packed, U


def test_paraboloid_1d_erk33():
    """verification-paraboloid_1d-erk33-l7: L1 = 1.54e-5 at 3201 dofs.

    Run at l5 for test-suite speed; the l7 reference match is the slow
    test below.
    """
    eq = ShallowWater(
        dim=1,
        params=ShallowWaterParams(
            reference_water_depth=10.0, dry_state_relaxation_factor=1.0e-3,
        ),
        limiter_options=SWLimiterOptions(
            limit_on_kinetic_energy=True, limit_on_square_velocity=False,
        ),
    )
    init = sw_states.paraboloid(
        eq, free_surface_radius=3000.0, water_height=10.0,
        paraboloid_length=10000.0, speed=2.0,
    )
    mesh = geometry.rectangular_domain(
        [0.0], [10000.0], [25], refinement=5,
        boundary_conditions=[Boundary.do_nothing] * 2, dim=1,
    )
    (linf, l1, l2), packed, U = _run(eq, init, mesh, 1345.71, 0.5)
    # l5 is 4x coarser than the reference's l7; second order => ~16x:
    assert l1 < 16.0 * 1.6e-5 * 2.0, l1
    h = np.asarray(U)[0][np.asarray(packed.node_mask) > 0]
    assert (h >= 0.0).all() or np.abs(h[h < 0]).max() < 1e-12


@pytest.mark.slow
def test_paraboloid_1d_erk33_l7_matches_reference():
    eq = ShallowWater(
        dim=1,
        params=ShallowWaterParams(
            reference_water_depth=10.0, dry_state_relaxation_factor=1.0e-3,
        ),
        limiter_options=SWLimiterOptions(
            limit_on_kinetic_energy=True, limit_on_square_velocity=False,
        ),
    )
    init = sw_states.paraboloid(
        eq, free_surface_radius=3000.0, water_height=10.0,
        paraboloid_length=10000.0, speed=2.0,
    )
    mesh = geometry.rectangular_domain(
        [0.0], [10000.0], [25], refinement=7,
        boundary_conditions=[Boundary.do_nothing] * 2, dim=1,
    )
    (linf, l1, l2), _, _ = _run(eq, init, mesh, 1345.71, 0.5)
    # measured 1.5569e-5 vs reference 1.5408e-5 (+1.0%); the residual
    # difference is the reference's final-time overshoot (it lands at
    # t = 1345.89, enforce_t_final defaults to false,
    # time_loop.template.h:86) — replicating it gives +0.3%
    assert abs(l1 / 1.5408e-5 - 1.0) < 0.05, l1


def test_ritter_dam_break_erk33():
    """verification-ritter_dam_break-erk33-l7: L1 = 2.03e-5 at 3201 dofs."""
    eq = ShallowWater(
        dim=1,
        params=ShallowWaterParams(
            reference_water_depth=0.005, dry_state_relaxation_factor=1.0e-3,
        ),
        # the reference's ritter prm selects kinetic-energy limiting
        # (prm/verification/shallow_water-ritter_dam_break-erk33.prm)
        limiter_options=SWLimiterOptions(
            limit_on_kinetic_energy=True, limit_on_square_velocity=False,
        ),
    )
    init = sw_states.make_initial_state(
        eq, "ritter dam break", position=[5.0], time_initial=1.0,
    )
    mesh = geometry.rectangular_domain(
        [0.0], [10.0], [25], refinement=5,
        boundary_conditions=[Boundary.dirichlet] * 2, dim=1,
    )
    (linf, l1, l2), packed, U = _run(eq, init, mesh, 6.0, 0.5)
    assert l1 < 16.0 * 2.1e-5 * 2.0, l1
    h = np.asarray(U)[0][np.asarray(packed.node_mask) > 0]
    assert np.isfinite(h).all()


@pytest.mark.slow
def test_ritter_dam_break_erk33_l7_matches_reference():
    eq = ShallowWater(
        dim=1,
        params=ShallowWaterParams(
            reference_water_depth=0.005, dry_state_relaxation_factor=1.0e-3,
        ),
        limiter_options=SWLimiterOptions(
            limit_on_kinetic_energy=True, limit_on_square_velocity=False,
        ),
    )
    init = sw_states.make_initial_state(
        eq, "ritter dam break", position=[5.0], time_initial=1.0,
    )
    mesh = geometry.rectangular_domain(
        [0.0], [10.0], [25], refinement=7,
        boundary_conditions=[Boundary.dirichlet] * 2, dim=1,
    )
    (linf, l1, l2), _, _ = _run(eq, init, mesh, 6.0, 0.5)
    # measured 2.0385e-5 vs reference 2.0354e-5 (+0.2%) once the
    # limiter options match the prm (KE limiting); replicating the
    # reference's final-time overshoot as well gives 2.0349e-5 (+0.00%)
    assert abs(l1 / 2.0354e-5 - 1.0) < 0.05, l1


def test_circular_dam_break_2d_admissible():
    """2D dam break with friction: stays admissible, water depth >= 0."""
    eq = ShallowWater(
        dim=2,
        params=ShallowWaterParams(manning_friction_coefficient=0.02),
    )
    init = sw_states.circular_dam_break(eq)
    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], refinement=4,
        boundary_conditions=[Boundary.do_nothing] * 4,
    )
    data = assembly.assemble(mesh)
    packed = ell.pack(data)
    pos = jnp.asarray(packed.positions.T, jnp.float64)
    hm = HyperbolicModule(
        eq, packed, init.state, dtype=jnp.float64,
        initial_precomputed=init.bathymetry(pos)[None],
    )
    ti = TimeIntegrator(hm, "erk 33", cfl_min=0.45, cfl_max=0.9)
    U = interpolate_nodal(init.state, packed, eq, 0.0, jnp.float64)
    U, _, t, tau, restarts, warns = ti.advance(U, 0.0, 20)
    U = np.asarray(U)
    assert np.isfinite(U).all()
    mask = np.asarray(packed.node_mask) > 0
    assert U[0][mask].min() > -1e-10


@pytest.mark.slow
def test_smooth_vortex_2d_erk33_matches_reference():
    """2D traveling vortex: shallow_water-smooth_vortex-erk33.baseline
    l6 (4225 dofs): L1 = 6.275e-4 over (h, m_1, m_2)."""
    eq = ShallowWater(dim=2, params=ShallowWaterParams(gravity=9.81))
    init = sw_states.make_initial_state(
        eq, "smooth vortex", direction=[1.0, 1.0], position=[-1.0, -1.0],
        reference_depth=2.0, mach_number=1.0, beta=2.0,
    )
    mesh = geometry.rectangular_domain(
        [-6, -6], [6, 6], [1, 1], refinement=6,
        boundary_conditions=[Boundary.dirichlet] * 4,
    )
    (linf, l1, l2), _, _ = _run(eq, init, mesh, t_final=2.0, cfl=0.25,
                                components=("h", "q_1", "q_2"))
    assert abs(l1 / 6.27538e-4 - 1.0) < 0.05, (linf, l1, l2)


@pytest.mark.slow
def test_paraboloid_2d_erk33_matches_reference():
    """2D parabolic-basin oscillation (Thacker) with dry states:
    shallow_water-paraboloid_2d-erk33.baseline l6 (4225 dofs):
    L1 = 6.330e-2 over h, after one full period t = 13.4571044."""
    eq = ShallowWater(dim=2, params=ShallowWaterParams(
        gravity=9.81, reference_water_depth=0.1,
        dry_state_relaxation_factor=0.0,
    ))
    init = sw_states.make_initial_state(
        eq, "paraboloid", direction=[1.0, 0.0], position=[2.0, 2.0],
        eta=0.5, free_surface_radius=1.0, water_height=0.1,
    )
    mesh = geometry.rectangular_domain(
        [0, 0], [4, 4], [1, 1], refinement=6,
        boundary_conditions=[Boundary.do_nothing] * 4,
    )
    (linf, l1, l2), _, _ = _run(eq, init, mesh, t_final=13.45710440,
                                cfl=0.50)
    # measured 6.3258e-2 vs reference 6.3297e-2 (-0.06%).  The decisive
    # detail was the square-velocity limiter's Newton step: the
    # reference applies exactly ONE quadratic-Newton step with its own
    # dpsi formula (limiter.template.h:390-404) — iterating a textbook
    # derivative instead lands ~13% BELOW the reference error on this
    # dry-front benchmark (see shallow_water.limiter_limit)
    assert abs(l1 / 6.32972e-2 - 1.0) < 0.05, (linf, l1, l2)
