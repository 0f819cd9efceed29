"""Smoke tests for the shipped benchmark configuration library.

Each configs/benchmarks/*.yaml (the analog of the reference's
prm/benchmarks/*.prm) is loaded, scaled down (coarser mesh, short final
time), and run end-to-end through TimeLoop; the final state must be
finite and (for Euler) admissible.
"""

import os

import numpy as np
import pytest

from ryujin_tpu.config import Config
from ryujin_tpu.driver import TimeLoop

CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs", "benchmarks",
)

# (filename, scaled-down refinement, short final time)
CASES = [
    ("euler-mach3-forward-facing-step.yaml", 1, 0.05),
    ("euler-mach3-cylinder-2d.yaml", 2, 0.05),
    ("euler-mach3-cylinder-3d.yaml", 1, 0.03),
    ("euler-mach10-double-mach-reflection.yaml", 3, 0.005),
    ("scalar_conservation-kpp.yaml", 4, 0.05),
    ("navier_stokes-daru-tenaud-shocktube.yaml", 4, 0.002),
    ("shallow_water-G3-S2-experiment.yaml", 0, 0.05),
]


@pytest.mark.slow
def test_transonic_airfoil_run():
    """Short transonic run over the tabulated ONERA OAT15a: Mach 0.73
    freestream, dynamic farfield, no_slip airfoil — states stay
    admissible with the bow/recompression structure forming."""
    import jax.numpy as jnp

    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.equations.dispatch import make_initial_state as _mk
    from ryujin_tpu.config import InitialValuesConfig
    from ryujin_tpu.equations.euler_initial_states import make_initial_state
    from ryujin_tpu.offline import assembly, ell, geometry
    from ryujin_tpu.postprocess.error import interpolate_nodal
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule
    from ryujin_tpu.solver.integrator import TimeIntegrator

    eq = Euler(dim=2)
    mesh = geometry.airfoil(airfoil_type="ONERA OAT15a", refinement=1)
    packed = ell.pack(assembly.assemble(mesh))
    # Mach 0.73 freestream: a = sqrt(1.4) for (rho, p) = (1.4, 1)
    u = 0.73 * float(np.sqrt(1.4 * 1.0 / 1.4))
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, u, 1.0))
    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    ti = TimeIntegrator(hm, "erk 33", cfl_min=0.45, cfl_max=0.9)
    U = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)
    out = ti.advance(U, 0.0, 30)
    Uh = np.asarray(out[0])
    real = np.asarray(packed.node_mask) > 0
    assert np.isfinite(Uh[:, real]).all()
    adm = hm.eq.is_admissible(jnp.asarray(Uh[:, real]))
    assert bool(np.asarray(adm).all())
    assert int(out[5]) == 0  # no invariant-domain warnings


def test_all_reference_benchmarks_have_configs():
    ref = {
        "euler-mach10-double-mach-reflection", "euler-mach3-cylinder-2d",
        "euler-mach3-cylinder-3d", "euler-mach3-forward-facing-step",
        "navier_stokes-daru-tenaud-shocktube", "scalar_conservation-kpp",
        "shallow_water-G3-S2-experiment",
    }
    have = {os.path.splitext(f)[0] for f in os.listdir(CONFIG_DIR)}
    assert ref <= have, ref - have


@pytest.mark.slow
@pytest.mark.parametrize("name,refinement,t_final", CASES)
def test_benchmark_config_smoke(tmp_path, name, refinement, t_final):
    cfg = Config.load(os.path.join(CONFIG_DIR, name))
    cfg.time_loop.basename = str(tmp_path / cfg.time_loop.basename)
    cfg.time_loop.final_time = t_final
    cfg.time_loop.timer_granularity = t_final
    cfg.time_loop.enable_output_full = False
    cfg.discretization.mesh_refinement = refinement
    loop = TimeLoop(cfg)
    result = loop.run(quiet=True)
    assert abs(result["t"] - t_final) < 1e-10
    U = np.asarray(result["U"])
    real = np.asarray(loop.packed.node_mask) > 0
    assert np.isfinite(U[:, real]).all()
    if cfg.equation.equation in ("euler", "navier stokes"):
        import jax.numpy as jnp

        adm = loop.eq.is_admissible(jnp.asarray(U[:, real]))
        assert bool(np.asarray(adm).all())
