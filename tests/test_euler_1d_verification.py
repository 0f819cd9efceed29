"""End-to-end 1D Euler verification against the reference baselines.

Mirrors /root/reference/prm/verification/euler-{leblanc, shock_front,
smooth_wave, rarefaction}_erk33.prm at refinement level 6 (1601 dofs) and
asserts the committed L1 errors of the matching `.baseline` files within
a few percent (the reference testsuite itself diffs with numdiff fuzzy
tolerances).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ryujin_tpu.equations.euler import Euler, EulerParams
from ryujin_tpu.equations.euler_initial_states import make_initial_state
from ryujin_tpu.offline import assembly, ell, geometry
from ryujin_tpu.offline.mesh import Boundary
from ryujin_tpu.postprocess.error import compute_error, interpolate_nodal
from ryujin_tpu.solver.hyperbolic import (
    HyperbolicModule, HyperbolicModuleParams,
)
from ryujin_tpu.solver.integrator import TimeIntegrator


def run_1d(config, gamma, position, t_final, cfl, relax, refinement=6,
           **state_kw):
    eq = Euler(dim=1, params=EulerParams(gamma=gamma))
    mesh = geometry.rectangular_domain(
        [0.0], [1.0], [25], refinement=refinement,
        boundary_conditions=[Boundary.dirichlet] * 2, dim=1,
    )
    data = assembly.assemble(mesh)
    packed = ell.pack(data)
    init = make_initial_state(
        eq, config, direction=[1.0], position=[position], **state_kw
    )
    params = HyperbolicModuleParams(limiter_relaxation_factor=relax)
    hm = HyperbolicModule(eq, packed, init, params=params,
                          dtype=jnp.float64)
    ti = TimeIntegrator(hm, scheme="erk 33", cfl_min=cfl, cfl_max=cfl,
                        cfl_recovery_strategy="none")
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    t = 0.0
    while t < t_final - 1e-12:
        U, _, t_dev, tau, _, _ = ti.advance(U, t, 50, t_final=t_final)
        t = float(t_dev)
        assert float(tau) > 0 or t >= t_final - 1e-12
    Up, _ = hm.prepare_state_vector(U, t)
    return compute_error(eq, mesh, packed, np.asarray(Up), t, init,
                         components=["rho", "m", "E"])


@pytest.mark.slow
def test_leblanc_l6_matches_reference():
    """euler-leblanc-erk33.baseline: 1601 dofs, L1 = 1.1261e-2."""
    linf, l1, l2 = run_1d(
        "leblanc", gamma=1.66666666666667, position=0.326732673267,
        t_final=0.66666666666667, cfl=0.10, relax=4.0,
    )
    assert abs(l1 / 1.126070081400691e-2 - 1.0) < 0.05, (linf, l1, l2)


@pytest.mark.slow
def test_shock_front_l6_matches_reference():
    """euler-shock_front_erk33.baseline: 1601 dofs, L1 = 3.3651e-3."""
    linf, l1, l2 = run_1d(
        "shock front", gamma=1.4, position=0.25,
        t_final=0.25, cfl=0.10, relax=8.0,
    )
    assert abs(l1 / 3.365082670890948e-3 - 1.0) < 0.05, (linf, l1, l2)


@pytest.mark.slow
def test_smooth_wave_l6_matches_reference():
    """euler-smooth_wave-erk33.baseline: 1601 dofs, L1 = 1.2916e-6."""
    linf, l1, l2 = run_1d(
        "smooth wave", gamma=1.4, position=0.1,
        t_final=0.60, cfl=0.30, relax=1.0,
    )
    assert abs(l1 / 1.291602520873936e-6 - 1.0) < 0.05, (linf, l1, l2)


def test_rarefaction_l6_matches_reference():
    """euler-rarefaction_erk33.baseline: 1601 dofs, L1 = 1.6435e-5."""
    linf, l1, l2 = run_1d(
        "rarefaction", gamma=1.4, position=0.2,
        t_final=0.30558, cfl=0.50, relax=8.0,
    )
    assert abs(l1 / 1.643470771031956e-5 - 1.0) < 0.08, (linf, l1, l2)
