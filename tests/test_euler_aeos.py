"""Euler-AEOS verification.

Mirrors the reference testsuite (tests/euler_aeos/):
  * isentropic vortex with the polytropic-gas EOS reproduces the euler
    result (verification-isentropic_vortex-pge-2d-erk33-l6.output:
    L1 = 4.0141e-4 at 4225 dofs)
  * the NASG surrogate machinery is exact for the polytropic EOS:
    surrogate_gamma == gamma, surrogate entropies match euler's
  * EOS library sanity (pressure <-> specific internal energy round trip)
"""

import jax


def test_sesame_table_file_roundtrip(tmp_path):
    """The sesame reader maps a (rho, e) -> p table file onto the
    on-device tabulated EOS; a table sampled from a polytropic gas must
    reproduce it (equation_of_state_library.cc:34-39 analog)."""
    import jax.numpy as jnp
    import numpy as np

    from ryujin_tpu.equations.euler_aeos import EOS_LIBRARY

    g = 1.4
    rho = np.linspace(0.1, 5.0, 200)
    e = np.linspace(0.1, 10.0, 300)
    p = (g - 1.0) * rho[:, None] * e[None, :]
    path = str(tmp_path / "gas.npz")
    np.savez(path, rho=rho, e=e, p=p)
    eos = EOS_LIBRARY["sesame"](filename=path)
    r = jnp.asarray([0.5, 1.3, 4.2])
    ei = jnp.asarray([0.7, 2.0, 8.5])
    np.testing.assert_allclose(
        np.asarray(eos.pressure(r, ei)), (g - 1.0) * np.asarray(r) *
        np.asarray(ei), rtol=1e-10,
    )
    # text format + inverse lookup:
    txt = str(tmp_path / "gas.dat")
    with open(txt, "w") as f:
        f.write("# sesame-style table\n")
        f.write(f"{len(rho)} {len(e)}\n")
        np.savetxt(f, rho[None])
        np.savetxt(f, e[None])
        np.savetxt(f, p)
    eos2 = EOS_LIBRARY["sesame"](filename=txt)
    pe = eos2.pressure(r, ei)
    back = eos2.specific_internal_energy(r, pe)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ei), rtol=1e-6)


import jax.numpy as jnp
import numpy as np
import pytest

from ryujin_tpu.equations import euler_aeos as ae
from ryujin_tpu.equations.euler import Euler
from ryujin_tpu.equations.euler_initial_states import make_initial_state
from ryujin_tpu.offline import assembly, ell, geometry
from ryujin_tpu.offline.mesh import Boundary
from ryujin_tpu.postprocess.error import compute_error, interpolate_nodal
from ryujin_tpu.solver.hyperbolic import (
    HyperbolicModule, HyperbolicModuleParams,
)
from ryujin_tpu.solver.integrator import TimeIntegrator


def test_eos_library_roundtrip():
    rho = jnp.asarray([0.5, 1.0, 2.5])
    p = jnp.asarray([0.3, 1.0, 4.0])
    for eos in (
        ae.polytropic_gas(1.4),
        ae.noble_abel_stiffened_gas(1.4, b=0.05, q=0.1, pinf=0.2),
        ae.van_der_waals(1.4, a=0.01, b=0.02),
        ae.jones_wilkins_lee(
            capA=6.3e4, capB=-4.4e2, R1=11.3, R2=1.13, omega=0.89,
            rho_0=1.9, q_0=0.0,
        ),
    ):
        e = eos.specific_internal_energy(rho, p)
        p2 = eos.pressure(rho, e)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p), rtol=1e-10)


def test_tabulated_eos_matches_analytic():
    base = ae.polytropic_gas(1.4)
    rho_grid = np.linspace(0.1, 3.0, 200)
    e_grid = np.linspace(0.1, 5.0, 200)
    table = np.asarray(
        base.pressure(rho_grid[:, None], e_grid[None, :])
    )
    tab = ae.tabulated(rho_grid, e_grid, table)
    rho = jnp.asarray([0.5, 1.7])
    e = jnp.asarray([0.9, 3.1])
    np.testing.assert_allclose(
        np.asarray(tab.pressure(rho, e)),
        np.asarray(base.pressure(rho, e)),
        rtol=1e-3,
    )


def test_surrogate_is_exact_for_polytropic():
    eq = ae.EulerAEOS(dim=2)
    eul = Euler(dim=2)
    U = jnp.asarray(
        [[1.0, 0.7], [0.2, -0.1], [0.1, 0.4], [2.0, 1.1]]
    )
    rho = U[0]
    e = eq.internal_energy(U) / rho
    p = eq.eos.pressure(rho, e)
    gamma = eq.surrogate_gamma(U, p)
    np.testing.assert_allclose(np.asarray(gamma), 1.4, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(eq.surrogate_specific_entropy(U, gamma)),
        np.asarray(eul.specific_entropy(U)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(eq.surrogate_harten_entropy(U, gamma)),
        np.asarray(eul.harten_entropy(U)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(eq.surrogate_pressure(U, gamma)), np.asarray(p),
        rtol=1e-12,
    )


def _run_vortex(refinement, strict=True):
    eq = ae.EulerAEOS(
        dim=2,
        eos=ae.polytropic_gas(1.4),
        params=ae.EulerAEOSParams(compute_strict_bounds=strict),
    )
    # the vortex profile only depends on gamma; reuse the euler library
    # via a facade (initial_state_library_euler_aeos.h does the same):
    import types

    facade = types.SimpleNamespace(
        params=types.SimpleNamespace(gamma=1.4), dim=2
    )
    init = make_initial_state(
        facade, "isentropic vortex", direction=[1, 1], position=[-1, -1],
        mach_number=1.0, beta=5.0,
    )
    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], refinement=refinement,
        boundary_conditions=[Boundary.dirichlet] * 4,
    )
    packed = ell.pack(assembly.assemble(mesh))
    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    ti = TimeIntegrator(hm, "erk 33", cfl_min=0.2, cfl_max=0.2,
                        cfl_recovery_strategy="none")
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    t = 0.0
    while t < 2.0 - 1e-12:
        U, _, t_dev, tau, _, _ = ti.advance(U, t, 50, t_final=2.0)
        t = float(t_dev)
    return compute_error(eq, mesh, packed, np.asarray(U), t, init,
                         components=["rho", "m_1", "m_2", "E"])


def test_aeos_vortex_l5():
    linf, l1, l2 = _run_vortex(5)
    assert l1 < 3.6e-3, l1


@pytest.mark.slow
def test_aeos_vortex_l6_matches_reference():
    """verification-isentropic_vortex-pge-2d-erk33-l6: L1 = 4.0141e-4."""
    linf, l1, l2 = _run_vortex(6)
    assert abs(l1 / 4.0141e-4 - 1.0) < 0.02, l1


@pytest.mark.slow
def test_aeos_leblanc_1d_matches_reference():
    """Leblanc shocktube through the AEOS surrogate machinery
    (verification-leblanc-pge-1d-erk33-l6.mpirun=4.output):
    1601 dofs, polytropic gas gamma = 5/3, compute strict bounds = false,
    evc factor 0, limiter relaxation 8, CFL 0.1 -> L1 = 1.2093e-2."""
    import types

    gamma = 1.66666666666667
    eq = ae.EulerAEOS(
        dim=1,
        eos=ae.polytropic_gas(gamma),
        params=ae.EulerAEOSParams(compute_strict_bounds=False),
    )
    facade = types.SimpleNamespace(
        params=types.SimpleNamespace(gamma=gamma), dim=1
    )
    init = make_initial_state(
        facade, "leblanc", direction=[1.0], position=[0.326732673267]
    )
    mesh = geometry.rectangular_domain(
        [0.0], [1.0], [25], refinement=6,
        boundary_conditions=[Boundary.dirichlet] * 2, dim=1,
    )
    packed = ell.pack(assembly.assemble(mesh))
    params = HyperbolicModuleParams(
        evc_factor=0.0, limiter_relaxation_factor=8.0
    )
    hm = HyperbolicModule(eq, packed, init, params=params,
                          dtype=jnp.float64)
    ti = TimeIntegrator(hm, "erk 33", cfl_min=0.1, cfl_max=0.1,
                        cfl_recovery_strategy="none")
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    t, t_final = 0.0, 0.66666666666667
    while t < t_final - 1e-12:
        U, _, t_dev, tau, _, _ = ti.advance(U, t, 100, t_final=t_final)
        t = float(t_dev)
        assert float(tau) > 0 or t >= t_final - 1e-12
    linf, l1, l2 = compute_error(eq, mesh, packed, np.asarray(U), t, init,
                                 components=["rho", "m", "E"])
    assert abs(l1 / 1.209329301782065e-2 - 1.0) < 0.05, (linf, l1, l2)
