"""Utility components: fast_pow (simd.h analog), cubic spline (GSL
analog), timer scopes (scope.h analog), sharding helpers."""

import numpy as np
import jax.numpy as jnp

from ryujin_tpu.ops.fast_math import Bias, fast_pow
from ryujin_tpu.utils.cubic_spline import CubicSpline
from ryujin_tpu.utils.scope import (
    print_timer_statistics, reset_timers, scope, timer_statistics,
)


def test_fast_pow_bias_guarantees():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(1e-3, 4.0, 50000), jnp.float32)
    for b in (0.5, 1.4, 2.0, -1.0, 8.0):
        exact = np.power(np.asarray(x, np.float64), b)
        hi = np.asarray(fast_pow(x, b, Bias.max), np.float64)
        lo = np.asarray(fast_pow(x, b, Bias.min), np.float64)
        assert (hi >= exact).all(), b
        assert (lo <= exact).all(), b
        mid = np.asarray(fast_pow(x, b), np.float64)
        assert np.abs(mid / exact - 1.0).max() < 2e-3


def test_cubic_spline_accuracy():
    x = np.linspace(0.0, 2 * np.pi, 25)
    sp = CubicSpline(x, np.sin(x))
    xq = np.linspace(0.0, 2 * np.pi, 313)
    assert np.abs(np.asarray(sp(xq)) - np.sin(xq)).max() < 2e-4
    assert np.abs(np.asarray(sp.derivative(xq)) - np.cos(xq)).max() < 5e-3
    # interpolates the knots exactly and clamps out of range:
    np.testing.assert_allclose(np.asarray(sp(x)), np.sin(x), atol=1e-14)
    assert float(sp(np.array([100.0]))[0]) == float(sp(np.array([x[-1]]))[0])


def test_timer_scopes():
    reset_timers()
    with scope("outer"):
        with scope("inner"):
            pass
        with scope("inner"):
            pass
    stats = timer_statistics()
    assert stats["inner"][1] == 2 and stats["outer"][1] == 1
    import io

    buf = io.StringIO()
    print_timer_statistics(buf)
    assert "inner" in buf.getvalue()
    reset_timers()


def test_shard_helpers_roundtrip():
    import jax

    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.offline import assembly, ell, geometry
    from ryujin_tpu.parallel.sharding import (
        make_device_mesh, shard_state, shard_stencil,
    )
    from ryujin_tpu.solver.hyperbolic import _stencil_from_ell

    mesh = geometry.rectangular_domain([0, 0], [1, 1], [1, 1], 3, [4] * 4)
    packed = ell.pack(assembly.assemble(mesh), pad_to=8 * len(jax.devices()))
    st = _stencil_from_ell(packed)
    dm = make_device_mesh()
    st2 = shard_stencil(st, dm, packed.n_pad)
    assert st2.cij.sharding.is_fully_replicated is False
    U = shard_state(jnp.ones((4, packed.n_pad)), dm)
    assert not U.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(st2.mask), np.asarray(st.mask))
