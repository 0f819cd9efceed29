"""End-to-end driver tests: config -> TimeLoop -> outputs.

Covers the aux subsystems: config round trip, VTU output, checkpoint +
resume, quantities time series, postprocessor fields, CLI template
generation.
"""

import os

import numpy as np
import pytest

from ryujin_tpu.config import Config
from ryujin_tpu.driver import TimeLoop


def _vortex_config(tmp_path, refinement=3):
    cfg = Config()
    cfg.time_loop.basename = str(tmp_path / "vortex")
    cfg.time_loop.final_time = 0.4
    cfg.time_loop.timer_granularity = 0.2
    cfg.time_loop.enable_compute_error = True
    cfg.time_loop.enable_output_full = True
    cfg.time_loop.enable_checkpointing = True
    cfg.equation.equation = "euler"
    cfg.equation.dimension = 2
    cfg.discretization.geometry = "rectangular domain"
    cfg.discretization.mesh_refinement = refinement
    cfg.discretization.parameters = {
        "position_bottom_left": [-5, -5],
        "position_top_right": [5, 5],
        "boundary_conditions": ["dirichlet"] * 4,
    }
    cfg.initial_values.configuration = "isentropic vortex"
    cfg.initial_values.direction = [1, 1]
    cfg.initial_values.position = [-1, -1]
    cfg.initial_values.parameters = {"mach_number": 1.0, "beta": 5.0}
    cfg.time_integrator.cfl_min = 0.4
    cfg.time_integrator.cfl_max = 0.4
    cfg.time_integrator.cfl_recovery_strategy = "none"
    cfg.vtu_output.schlieren_quantities = ["rho"]
    cfg.vtu_output.vorticity_quantities = ["v_1"]
    cfg.quantities.manifolds = [["all", "1.0"], ["left", "-x"]]
    return cfg


def test_time_loop_end_to_end(tmp_path):
    cfg = _vortex_config(tmp_path)
    # YAML round trip:
    path = str(tmp_path / "cfg.yaml")
    cfg.save(path)
    cfg2 = Config.load(path)
    assert cfg2.initial_values.parameters["beta"] == 5.0

    loop = TimeLoop(cfg2)
    result = loop.run(quiet=True)
    assert abs(result["t"] - 0.4) < 1e-10
    assert result["L1"] < 5e-2  # coarse mesh, short time

    # VTU files written at every tick:
    vtus = sorted(p for p in os.listdir(tmp_path) if p.endswith(".vtu"))
    assert len(vtus) == 3  # t = 0, 0.2, 0.4
    txt = open(tmp_path / vtus[-1]).read()
    for field in ("rho", "E", "v_1", "p", "schlieren_rho", "vorticity_v_1"):
        assert f'Name="{field}"' in txt

    # quantities time series:
    for name in ("all", "left"):
        lines = open(tmp_path / f"vortex-{name}.dat").read().splitlines()
        assert len(lines) == 4  # header + 3 ticks
    # conservation sanity on the 'all' manifold (mass-weighted mean rho):
    rows = [l.split() for l in lines[1:]]

    # checkpoint + resume continues to the same final time:
    assert os.path.exists(tmp_path / "vortex-checkpoint.npz")
    cfg3 = _vortex_config(tmp_path)
    cfg3.time_loop.final_time = 0.6
    cfg3.time_loop.resume = True
    cfg3.time_loop.enable_output_full = False
    cfg3.time_loop.enable_compute_error = False
    loop2 = TimeLoop(cfg3)
    result2 = loop2.run(quiet=True)
    assert abs(result2["t"] - 0.6) < 1e-10


def test_logfile_and_parameter_dump(tmp_path):
    """Rank-0 `basename.log` + effective parameter file
    (time_loop.template.h:229-232, 910-913)."""
    cfg = _vortex_config(tmp_path, refinement=3)
    cfg.time_loop.enable_checkpointing = False
    cfg.time_loop.enable_output_full = False
    loop = TimeLoop(cfg)
    loop.run(quiet=True)

    log = open(str(tmp_path / "vortex.log")).read()
    assert "effective parameters:" in log
    assert "isentropic vortex" in log  # parameter dump included
    assert "cycle 1" in log and "run complete" in log
    assert "Linf" in log  # error block mirrored into the log
    cfg2 = Config.load(str(tmp_path / "vortex-parameters.yaml"))
    assert cfg2.initial_values.configuration == "isentropic vortex"


def test_nan_tau_aborts(tmp_path):
    """A non-finite time-step size must abort loudly, not exit the loop as
    if completed (hyperbolic_module.template.h:573-576 analog)."""
    cfg = _vortex_config(tmp_path, refinement=3)
    cfg.time_loop.enable_checkpointing = False
    cfg.time_loop.enable_output_full = False
    cfg.time_loop.enable_compute_error = False
    loop = TimeLoop(cfg)

    real_advance = loop.time_integrator.advance

    def poisoned(U, t, n, t_final=None):
        U, prec, t_dev, tau, r, w = real_advance(U, t, n, t_final=t_final)
        return U, prec, t_dev, np.nan * tau, r, w

    loop.time_integrator.advance = poisoned
    with pytest.raises(FloatingPointError, match="not a finite number"):
        loop.run(quiet=True)


def test_cli_template_generation(tmp_path, capsys):
    from ryujin_tpu.__main__ import main

    path = str(tmp_path / "new.yaml")
    rc = main([path, "--equation", "euler", "--dimension", "2"])
    assert rc == 1
    assert os.path.exists(path)
    cfg = Config.load(path)
    assert cfg.equation.equation == "euler"


def test_scalar_conservation_via_driver(tmp_path):
    cfg = Config()
    cfg.time_loop.basename = str(tmp_path / "transport")
    cfg.time_loop.final_time = 1.0
    cfg.time_loop.timer_granularity = 1.0
    cfg.time_loop.enable_compute_error = True
    cfg.equation.equation = "scalar conservation"
    cfg.equation.dimension = 1
    cfg.equation.parameters = {
        "flux": "function", "flux_expressions": ["u"],
    }
    cfg.discretization.mesh_refinement = 7
    cfg.discretization.parameters = {
        "position_bottom_left": [0.0],
        "position_top_right": [6.283185307179586],
        "boundary_conditions": ["periodic", "periodic"],
    }
    cfg.initial_values.configuration = "function"
    cfg.initial_values.parameters = {"expression": "sin(x - t)"}
    cfg.hyperbolic_module.evc_factor = 0.0
    cfg.time_integrator.time_stepping_scheme = "erk 33"
    cfg.time_integrator.cfl_min = 0.8
    cfg.time_integrator.cfl_max = 0.8
    cfg.time_integrator.cfl_recovery_strategy = "none"
    loop = TimeLoop(cfg)
    result = loop.run(quiet=True)
    assert result["L1"] < 3e-5


def test_quantities_boundary_and_time_averaged(tmp_path):
    """Boundary manifolds, time-averaged/instantaneous output, level-set
    restricted VTU (quantities.template.h, vtu_output.template.h:156-199)."""
    cfg = _vortex_config(tmp_path)
    cfg.time_loop.basename = str(tmp_path / "q")
    cfg.time_loop.enable_checkpointing = False
    cfg.quantities.manifolds = [
        ["all", "1.0", "space_averaged time_averaged instantaneous"],
    ]
    cfg.quantities.boundary_manifolds = [
        ["left_bnd", "-x - 4.9", "space_averaged"],
    ]
    cfg.vtu_output.manifolds = ["x"]  # cells cut by the y-axis
    cfg.vtu_output.vtu_output_quantities = ["rho", "p", "schlieren_rho"]
    loop = TimeLoop(cfg)
    loop.run(quiet=True)

    # space-averaged series on both manifolds:
    for name in ("all", "left_bnd"):
        lines = open(tmp_path / f"q-{name}.dat").read().splitlines()
        assert len(lines) == 4  # header + 3 ticks
    # time-averaged + instantaneous per-cycle fields:
    import os

    files = os.listdir(tmp_path)
    assert any("-R0002-time_averaged.dat" in f for f in files)
    assert any("-R0001-instantaneous.dat" in f for f in files)
    assert any("-points.dat" in f for f in files)
    # levelset-restricted companion VTU with the selected quantities only:
    lv = [f for f in files if f.endswith("-levelsets.vtu")]
    assert lv
    txt = open(tmp_path / lv[0]).read()
    assert 'Name="rho"' in txt and 'Name="schlieren_rho"' in txt
    assert 'Name="E"' not in txt
