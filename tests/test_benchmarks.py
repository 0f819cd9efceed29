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
