"""Initial state library coverage (euler/initial_state_*.h,
shallow_water/initial_state_*.h): every configuration produces admissible
finite states of the right shape, and the analytic ones satisfy their
defining relations."""

import jax.numpy as jnp
import numpy as np
import pytest

from ryujin_tpu.equations.euler import Euler
from ryujin_tpu.equations import euler_initial_states as eis
from ryujin_tpu.equations.shallow_water import (
    ShallowWater, ShallowWaterParams,
)
from ryujin_tpu.equations import shallow_water_initial_states as sis

EULER_2D = [
    ("isentropic vortex", {}),
    ("uniform", {}),
    ("contrast", {}),
    ("shock front", {}),
    ("smooth wave", {}),
    ("ramp up", {}),
    ("rarefaction", {}),
    ("noh", {}),
    ("radial contrast", {}),
    ("three state contrast", {}),
    ("four state contrast", {}),
    ("astro jet", {}),
    ("icf like", {}),
    ("function", {"density_expression": "1+0.2*sin(x)*cos(y)"}),
]


@pytest.mark.parametrize("name,kw", EULER_2D)
def test_euler_state(name, kw):
    eq = Euler(dim=2)
    pts = jnp.asarray(np.random.default_rng(1).uniform(-2, 2, (2, 64)))
    fn = eis.make_initial_state(eq, name, **kw)
    for t in (0.0, 0.15):
        U = fn(pts, t)
        assert U.shape == (4, 64)
        assert np.isfinite(np.asarray(U)).all()
        assert bool(eq.is_admissible(U).all())


def test_rarefaction_is_exact_solution():
    """The rarefaction fan must satisfy the isentropic relation."""
    eq = Euler(dim=1)
    fn = eis.make_initial_state(eq, "rarefaction")
    x = jnp.linspace(-0.5, 0.7, 200)[None]
    U = np.asarray(fn(x, 0.3))
    rho, m, E = U
    u = m / rho
    p = (eq.params.gamma - 1.0) * (E - 0.5 * rho * u * u)
    s = p / rho**eq.params.gamma
    np.testing.assert_allclose(s, s[0], rtol=1e-10)


SW_2D = [
    ("uniform", {}),
    ("contrast", {}),
    ("circular dam break", {}),
    ("paraboloid", {}),
    ("smooth vortex", {"with_bathymetry": True}),
    ("sloping friction", {}),
    ("soliton", {}),
    ("flow over bump", {}),
    ("flow over bump", {"flow_type": "subsonic"}),
    ("three bumps dam break", {}),
    ("hou test", {}),
    ("transient experiments", {"experimental_configuration": "G1"}),
    ("transient experiments", {"experimental_configuration": "G2"}),
    ("transient experiments", {"experimental_configuration": "G3"}),
    ("function", {"water_depth_expression": "1+0.1*cos(x)"}),
]


@pytest.mark.parametrize("name,kw", SW_2D)
def test_sw_state(name, kw):
    eq = ShallowWater(
        dim=2, params=ShallowWaterParams(manning_friction_coefficient=0.1)
    )
    pts = jnp.asarray(np.random.default_rng(2).uniform(-3, 3, (2, 64)))
    st = sis.make_initial_state(eq, name, **kw)
    U = st.state(pts, 0.0)
    Z = st.bathymetry(pts)
    assert U.shape == (3, 64) and Z.shape == (64,)
    assert np.isfinite(np.asarray(U)).all()
    assert np.isfinite(np.asarray(Z)).all()
    assert float(U[0].min()) >= 0.0  # water depth nonnegative


def test_sw_smooth_vortex_well_balanced_surface():
    """With bathymetry, the vortex free surface h+z is depth-flat up to
    the rotational depression (initial_state_smooth_vortex.h)."""
    eq = ShallowWater(dim=2)
    st = sis.make_initial_state(eq, "smooth vortex", with_bathymetry=True)
    pts = jnp.asarray(np.random.default_rng(3).uniform(-2, 2, (2, 50)))
    h = st.state(pts, 0.0)[0]
    z = st.bathymetry(pts)
    # far from the vortex core the surface approaches the reference depth
    r = np.sqrt(np.asarray(pts[0]) ** 2 + np.asarray(pts[1]) ** 2)
    far = r > 1.8
    np.testing.assert_allclose(
        np.asarray(h + z)[far], 1.0, atol=2e-3
    )


def test_sw_geotiff_raises():
    eq = ShallowWater(dim=2)
    with pytest.raises(NotImplementedError):
        sis.make_initial_state(eq, "geotiff")


def test_soliton_travels():
    eq = ShallowWater(dim=1)
    st = sis.make_initial_state(eq, "soliton")
    x = jnp.linspace(-20, 20, 400)[None]
    c = np.sqrt(eq.params.gravity * 1.1)
    h0 = np.asarray(st.state(x, 0.0)[0])
    h1 = np.asarray(st.state(x + c * 1.0, 1.0)[0])
    np.testing.assert_allclose(h0, h1, atol=1e-12)


def test_perturbation_config(tmp_path):
    from ryujin_tpu.config import Config
    from ryujin_tpu.driver import TimeLoop

    cfg = Config()
    cfg.time_loop.basename = str(tmp_path / "p")
    cfg.time_loop.final_time = 0.05
    cfg.time_loop.timer_granularity = 0.05
    cfg.discretization.mesh_refinement = 3
    cfg.discretization.parameters = {
        "position_bottom_left": [-5, -5],
        "position_top_right": [5, 5],
        "boundary_conditions": ["dirichlet"] * 4,
    }
    cfg.initial_values.configuration = "uniform"
    cfg.initial_values.perturbation = 1e-3
    loop = TimeLoop(cfg)
    result = loop.run(quiet=True)
    U = np.asarray(result["U"])[:, : loop.packed.n_nodes]
    assert np.isfinite(U).all()
    # the perturbation must actually have perturbed the constant state:
    assert np.ptp(U[0]) > 0.0
