"""Shock robustness + invariant-domain recovery tests.

Mirrors the role of the reference's benchmark smoke configurations and the
Restart/bang-bang mechanism (time_integrator.template.h:250-275).
"""

import jax.numpy as jnp
import numpy as np

from ryujin_tpu.offline import assembly, ell, geometry
from ryujin_tpu.offline.mesh import Boundary
from ryujin_tpu.equations.euler import Euler
from ryujin_tpu.equations.euler_initial_states import make_initial_state
from ryujin_tpu.solver.hyperbolic import HyperbolicModule
from ryujin_tpu.solver.integrator import TimeIntegrator
from ryujin_tpu.postprocess.error import interpolate_nodal


def test_mach3_step_shock_admissible():
    eq = Euler(dim=2)
    mesh = geometry.step(refinement=0)
    packed = ell.pack(assembly.assemble(mesh))
    init = make_initial_state(eq, "uniform", direction=[1, 0],
                              position=[1, 0], primitive_state=[1.4, 3.0, 1.0])
    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    ti = TimeIntegrator(hm, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
                        cfl_recovery_strategy="bang bang control")
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    t = 0.0
    for _ in range(10):
        U, tau, ok = ti.step(U, t)
        t += float(tau)
        assert bool(jnp.isfinite(U).all())
    adm = eq.is_admissible(U)[jnp.asarray(packed.node_mask) > 0]
    assert bool(adm.all())


def test_bang_bang_cfl_recovery():
    eq = Euler(dim=2)
    mesh = geometry.rectangular_domain(
        [-0.5, -0.5], [0.5, 0.5], [1, 1], refinement=3,
        boundary_conditions=[Boundary.dirichlet] * 4,
    )
    packed = ell.pack(assembly.assemble(mesh))
    init = make_initial_state(eq, "contrast",
                              primitive_left=[1.0, 0.0, 1000.0],
                              primitive_right=[0.125, 0.0, 0.01])
    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    ti = TimeIntegrator(hm, scheme="erk 33", cfl_min=0.45, cfl_max=3.5,
                        cfl_recovery_strategy="bang bang control")
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    t = 0.0
    for _ in range(5):
        U, tau, ok = ti.step(U, t)
        t += float(tau)
        assert bool(jnp.isfinite(U).all())
    assert ti.n_restarts > 0  # the aggressive CFL must trip the limiter
    adm = eq.is_admissible(U)[jnp.asarray(packed.node_mask) > 0]
    assert bool(adm.all())
