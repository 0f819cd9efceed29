"""End-to-end verification: 2D Euler isentropic vortex, ERK33.

The acceptance values are the committed reference baselines
(/root/reference/prm/verification/euler-isentropic_vortex-erk33.baseline),
compared with a 2% relative tolerance (the reference testsuite itself uses
numdiff fuzzy comparison).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ryujin_tpu.offline import assembly, ell, geometry
from ryujin_tpu.offline.mesh import Boundary
from ryujin_tpu.equations.euler import Euler
from ryujin_tpu.equations.euler_initial_states import make_initial_state
from ryujin_tpu.solver.hyperbolic import HyperbolicModule
from ryujin_tpu.solver.integrator import TimeIntegrator
from ryujin_tpu.postprocess.error import compute_error, interpolate_nodal


def run_vortex(refinement, t_final=2.0, scheme="erk 33", cfl=0.2,
               dtype=jnp.float64):
    eq = Euler(dim=2)
    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], refinement=refinement,
        boundary_conditions=[Boundary.dirichlet] * 4,
    )
    data = assembly.assemble(mesh)
    packed = ell.pack(data)
    init = make_initial_state(
        eq, "isentropic vortex", direction=[1, 1], position=[-1, -1],
        mach_number=1.0, beta=5.0,
    )
    hm = HyperbolicModule(eq, packed, init, dtype=dtype)
    ti = TimeIntegrator(hm, scheme=scheme, cfl_min=cfl, cfl_max=cfl,
                        cfl_recovery_strategy="none")
    U = interpolate_nodal(init, packed, eq, 0.0, dtype)
    t = 0.0
    while t < t_final - 1e-12:
        U, tau, ok = ti.step(U, t, t_final)
        t += float(tau)
    Up, _ = hm.prepare_state_vector(U, t)
    return compute_error(eq, mesh, packed, np.asarray(Up), t, init,
                         components=["rho", "m_1", "m_2", "E"])


def test_vortex_l5_erk33():
    """Refinement 5 (1089 dofs): self-consistent regression guard on the
    convergence trend (value validated against the l6 baseline match)."""
    linf, l1, l2 = run_vortex(5)
    assert l1 < 3.6e-3, l1
    assert l2 < 9.1e-3, l2


@pytest.mark.slow
def test_vortex_l6_erk33_matches_reference_baseline():
    """4225 dofs: prm/verification/euler-isentropic_vortex-erk33.baseline:1-5."""
    linf, l1, l2 = run_vortex(6)
    assert abs(linf - 5.465e-3) / 5.465e-3 < 0.02
    assert abs(l1 - 4.017e-4) / 4.017e-4 < 0.02
    assert abs(l2 - 9.442e-4) / 9.442e-4 < 0.02


@pytest.mark.slow
def test_vortex_l5_ssprk33():
    linf, l1, l2 = run_vortex(5, scheme="ssprk 33")
    assert l1 < 4.5e-3, l1


@pytest.mark.slow
def test_vortex_l6_erk22_matches_reference_baseline():
    """4225 dofs: prm/verification/euler-isentropic_vortex-erk22.baseline:1-5."""
    linf, l1, l2 = run_vortex(6, scheme="erk 22")
    assert abs(l1 / 3.97499e-4 - 1.0) < 0.02, l1


@pytest.mark.slow
def test_vortex_l6_ssprk33_matches_reference_baseline():
    """4225 dofs: prm/verification/euler-isentropic_vortex-ssprk33.baseline:1-5."""
    linf, l1, l2 = run_vortex(6, scheme="ssprk 33")
    assert abs(l1 / 4.007415406445266e-4 - 1.0) < 0.02, l1
