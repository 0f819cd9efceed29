"""Shallow water initial state library.

Re-implements the states used by the reference's verification suite
(/root/reference/source/shallow_water/initial_state_*.h) as jit-traceable
functions `(points [dim, ...], t) -> states [C, ...]` plus a bathymetry
function `(points) -> Z [...]` (the one precomputed initial value).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SWInitialState:
    state: Callable  # (points [dim, ...], t) -> [C, ...]
    bathymetry: Callable  # (points [dim, ...]) -> [...]


def _flat_bathymetry(points):
    return jnp.zeros_like(points[0])


def uniform(eq, primitive_state=(1.0, 0.0)):
    prim = list(primitive_state)

    def fn(points, t):
        shape = points.shape[1:]
        h = jnp.full(shape, prim[0], dtype=points.dtype)
        vel = prim[1:] + [0.0] * (eq.dim - len(prim) + 1)
        comps = [h] + [
            jnp.full(shape, v, dtype=points.dtype) * h for v in vel[: eq.dim]
        ]
        return jnp.stack(comps, axis=0)

    return SWInitialState(fn, _flat_bathymetry)


def paraboloid(
    eq,
    free_surface_radius: float = 1.0,
    water_height: float = 0.1,
    paraboloid_length: float = 10000.0,
    speed: float = 2.0,
    eta: float = 0.5,
):
    """Planar flow in a parabolic basin (initial_state_paraboloid.h:40-160)."""
    a = free_surface_radius
    h_0 = water_height
    length = paraboloid_length
    B = speed
    g = eq.params.gravity
    k = eq.params.manning_friction_coefficient
    dim = eq.dim

    def bathymetry(points):
        if dim == 1:
            return h_0 / (a * a) * (points[0] - 0.5 * length) ** 2
        r2 = sum(points[d] ** 2 for d in range(dim))
        return -h_0 * (1.0 - r2 / (a * a))

    def fn(points, t):
        z = bathymetry(points)
        if dim == 1:
            p = math.sqrt(8.0 * g * h_0) / a
            s = math.sqrt(p * p - k * k) / 2.0
            term1 = (
                (a * a * B * B) / (8.0 * g * g * h_0) * jnp.exp(-k * t)
            ) * (
                (0.25 * k * k - s * s) * jnp.cos(2.0 * s * t)
                - s * k * jnp.sin(2.0 * s * t)
            )
            term2 = -(B * B / (4.0 * g)) * jnp.exp(-k * t)
            term3 = (
                -(B / g)
                * jnp.exp(-0.5 * k * t)
                * (s * jnp.cos(s * t) + 0.5 * k * jnp.sin(s * t))
                * (points[0] - 0.5 * length)
            )
            htilde = h_0 - z + term1 + term2 + term3
            h = jnp.maximum(htilde, 0.0)
            v_x = B * jnp.exp(-0.5 * k * t) * jnp.sin(s * t)
            return jnp.stack([h, h * v_x], axis=0)
        omega = math.sqrt(2.0 * g * h_0) / a
        x, y = points[0], points[1]
        elevation = (
            eta
            * h_0
            / (a * a)
            * (2.0 * x * jnp.cos(omega * t) + 2.0 * y * jnp.sin(omega * t))
        )
        h = jnp.maximum(elevation - z, 0.0)
        v_x = -eta * omega * jnp.sin(omega * t) + 0.0 * x
        v_y = eta * omega * jnp.cos(omega * t) + 0.0 * x
        return jnp.stack([h, h * v_x, h * v_y], axis=0)

    return SWInitialState(fn, bathymetry)


def ritter_dam_break(eq, time_initial: float = 0.1, left_water_depth: float = 0.005):
    """Ritter's expansion-wave dam break (initial_state_ritter_dam_break.h)."""
    g = eq.params.gravity
    aL = math.sqrt(g * left_water_depth)

    def fn(points, t):
        x = points[0]
        tt = t + time_initial
        xA = -tt * aL
        xB = 2.0 * tt * aL
        tmp = aL - x / (2.0 * tt)
        h_exp = 4.0 / (9.0 * g) * tmp * tmp
        v_exp = 2.0 / 3.0 * (x / tt + aL)
        h = jnp.where(
            x <= xA,
            left_water_depth,
            jnp.where(x <= xB, h_exp, 0.0),
        )
        q = jnp.where(
            x <= xA, 0.0, jnp.where(x <= xB, h_exp * v_exp, 0.0)
        )
        comps = [h, q] + [jnp.zeros_like(h)] * (eq.dim - 1)
        return jnp.stack(comps, axis=0)

    return SWInitialState(fn, _flat_bathymetry)


def circular_dam_break(eq, still_water_depth=0.5, radius=2.5, dam_amplitude=2.5):
    """(initial_state_circular_dam_break.h)."""

    def fn(points, t):
        r = jnp.sqrt(sum(points[d] ** 2 for d in range(eq.dim)))
        h = jnp.where(r <= radius, dam_amplitude, still_water_depth)
        comps = [h] + [jnp.zeros_like(h)] * eq.dim
        return jnp.stack(comps, axis=0)

    return SWInitialState(fn, _flat_bathymetry)


def contrast(eq, primitive_state_left=(1.0, 0.0),
             primitive_state_right=(1.0, 0.0)):
    """Jump at x=0 between two flow states (sw initial_state_contrast.h)."""
    L = uniform(eq, primitive_state_left)
    R = uniform(eq, primitive_state_right)

    def fn(points, t):
        sel = (points[0] > 0.0)[None]
        return jnp.where(sel, R.state(points, t), L.state(points, t))

    return SWInitialState(fn, _flat_bathymetry)


def smooth_vortex(eq, with_bathymetry=False, reference_depth=1.0,
                  mach_number=2.0, beta=0.1):
    """Traveling shallow-water vortex (initial_state_smooth_vortex.h:55-120).

    With bathymetry enabled the vortex sits in a depression depth/4*factor
    and the water surface is flat to machine precision at t = 0.
    """
    g = eq.params.gravity

    def factor_of(x, y):
        r_sq = x * x + y * y
        return beta / (2.0 * math.pi) * jnp.exp(0.5 - 0.5 * r_sq)

    def bathymetry(points):
        if not with_bathymetry:
            return jnp.zeros_like(points[0])
        return reference_depth / 4.0 * factor_of(points[0], points[1])

    def fn(points, t):
        x = points[0] - mach_number * t
        y = points[1]
        factor = factor_of(x, y)
        h = reference_depth - 1.0 / (2.0 * g) * factor * factor
        if with_bathymetry:
            h = h - bathymetry(points)
        u = mach_number - factor * y
        v = factor * x
        return jnp.stack([h, h * u, h * v], axis=0)

    return SWInitialState(fn, bathymetry)


def sloping_friction(eq, ramp_slope=1.0, initial_discharge=0.1):
    """Steady flow down an inclined frictional plane
    (initial_state_sloping_friction.h): h = (n^2 q^2 / slope)^(3/10)."""
    n = eq.params.manning_friction_coefficient
    q0 = initial_discharge
    h = (n * n * q0 * q0 / ramp_slope) ** (1.0 / (2.0 + 4.0 / 3.0))

    def fn(points, t):
        shape = points.shape[1:]
        comps = [jnp.full(shape, h, points.dtype),
                 jnp.full(shape, q0, points.dtype)]
        comps += [jnp.zeros(shape, points.dtype)] * (eq.dim - 1)
        return jnp.stack(comps, axis=0)

    def bathymetry(points):
        return -ramp_slope * points[0]

    return SWInitialState(fn, bathymetry)


def soliton(eq, still_water_depth=1.0, amplitude=0.1):
    """Solitary wave over a flat bottom (initial_state_soliton.h)."""
    g = eq.params.gravity
    d, A = still_water_depth, amplitude
    celerity = math.sqrt(g * (A + d))
    width = math.sqrt(3.0 * A / (4.0 * d * d * (A + d)))

    def fn(points, t):
        x = points[0]
        sech2 = 1.0 / jnp.cosh(width * (x - celerity * t)) ** 2
        profile = d + A * sech2
        h = jnp.maximum(profile, 0.0)
        v = celerity * (profile - d) / profile
        comps = [h, h * v] + [jnp.zeros_like(h)] * (eq.dim - 1)
        return jnp.stack(comps, axis=0)

    return SWInitialState(fn, _flat_bathymetry)


def flow_over_bump(eq, flow_type="transcritical"):
    """Steady flow over a cubic bump with Cardano exact solution
    (initial_state_flow_over_bump.h).  flow_type: 'transcritical' (with
    shock) or 'subsonic'."""
    if flow_type not in ("transcritical", "subsonic"):
        raise ValueError("flow type must be 'transcritical' or 'subsonic'")
    g = eq.params.gravity
    xM, xS, zM = 10.0, 11.7, 0.2
    if flow_type == "subsonic":
        q_in, h_in = 4.42, 2.0
        cBer = (q_in / h_in) ** 2 / (2.0 * g) + h_in
    else:
        h_in, q_in = 0.28205279813802181, 0.18
        cBer = zM + 1.5 * (q_in * q_in / g) ** (1.0 / 3.0)

    def bathymetry(points):
        x = points[0]
        bump = 0.2 / 64.0 * (x - 8.0) ** 3 * (12.0 - x) ** 3
        return jnp.where((x >= 8.0) & (x <= 12.0), bump, 0.0)

    def fn(points, t):
        x = points[0]
        z = bathymetry(points)
        if t < 1e-12:
            h = h_in - z
            comps = [h, jnp.full_like(h, q_in)]
            comps += [jnp.zeros_like(h)] * (eq.dim - 1)
            return jnp.stack(comps, axis=0)
        # Cardano's formula for the exact steady state:
        d = q_in * q_in / (2.0 * g)
        b = z - cBer
        Q = -(b * b) / 9.0
        R = -(27.0 * d + 2.0 * b**3) / 54.0
        theta = jnp.arccos(jnp.clip((-Q) ** (-1.5) * R, -1.0, 1.0))
        h = 2.0 * jnp.sqrt(-Q) * jnp.cos(theta / 3.0) - b / 3.0
        if flow_type == "transcritical":
            h_mid = (
                2.0 * jnp.sqrt(-Q)
                * jnp.cos((4.0 * math.pi + theta) / 3.0) - b / 3.0
            )
            h = jnp.where((x >= xM) & (x < xS), h_mid, h)
            h = jnp.where(x > xS, h_in, h)
        comps = [h, jnp.full_like(h, q_in)]
        comps += [jnp.zeros_like(h)] * (eq.dim - 1)
        return jnp.stack(comps, axis=0)

    return SWInitialState(fn, bathymetry)


def three_bumps_dam_break(eq, well_balancing_validation=False,
                          left_water_depth=1.875, right_water_depth=0.0,
                          cone_magnitude=1.0):
    """Dam break against three conical bumps
    (initial_state_three_bumps_dam_break.h)."""
    g = eq.params.gravity

    def bathymetry(points):
        x = points[0]
        if eq.dim == 1:
            z3 = 3.0 - 0.3 * jnp.abs(x - 47.5)
            return cone_magnitude * jnp.maximum(z3, 0.0)
        y = points[1]
        z1 = 1.0 - 0.125 * jnp.sqrt((x - 30.0) ** 2 + (y - 6.0) ** 2)
        z2 = 1.0 - 0.125 * jnp.sqrt((x - 30.0) ** 2 + (y - 24.0) ** 2)
        z3 = 3.0 - 0.3 * jnp.sqrt((x - 47.5) ** 2 + (y - 15.0) ** 2)
        return cone_magnitude * jnp.maximum(
            jnp.maximum(z1, z2), jnp.maximum(z3, 0.0)
        )

    def fn(points, t):
        x = points[0]
        if t <= 1e-10 or well_balancing_validation:
            h = jnp.where(x < 16.0, left_water_depth, right_water_depth)
            h = jnp.maximum(h - bathymetry(points), 0.0)
            comps = [h] + [jnp.zeros_like(h)] * eq.dim
            return jnp.stack(comps, axis=0)
        # t > 0: constant inflow Dirichlet data on the left
        h = left_water_depth
        a = math.sqrt(g * h)
        shape = points.shape[1:]
        comps = [jnp.full(shape, h, points.dtype),
                 jnp.full(shape, h * a, points.dtype)]
        comps += [jnp.zeros(shape, points.dtype)] * (eq.dim - 1)
        return jnp.stack(comps, axis=0)

    return SWInitialState(fn, bathymetry)


def hou_test(eq, reservoir_water_depth=35.0):
    """Hou et al. dam break over an irregular three-bump bed
    (initial_state_hou_test.h)."""
    depth = reservoir_water_depth

    def bathymetry(points):
        x, y = points[0], points[1]
        base1 = (x + 250.0) ** 2 / 1600.0 + y**2 / 400.0
        base2 = x**2 / 225.0 + (y - 50.0) ** 2 / 225.0
        base3 = (x - 250.0) ** 2 / 1225.0 + y**2 / 225.0 - 10.0
        base = jnp.minimum(jnp.minimum(base1, base2), base3)
        bump1 = 80.0 - (x + 250.0) ** 2 / 50.0 - y**2 / 50.0
        bump2 = jnp.where(
            (x - 200.0) ** 2 + (y + 10.0) ** 2 <= 1000.0, 10.0, 0.0
        )
        bump3 = jnp.where(
            (jnp.abs(x - 380.0) <= 40.0) & (jnp.abs(y - 50.0) <= 40.0),
            20.0, 0.0,
        )
        bumps = jnp.maximum(jnp.maximum(bump1, bump2), bump3)
        return jnp.maximum(base, bumps)

    def fn(points, t):
        x = points[0]
        h = jnp.where(
            x < -100.0,
            jnp.maximum(depth - bathymetry(points), 0.0),
            0.0,
        )
        comps = [h] + [jnp.zeros_like(h)] * eq.dim
        return jnp.stack(comps, axis=0)

    return SWInitialState(fn, bathymetry)


def transient(eq, flow_state_left=(1.0, 0.0), flow_state_right=(1.0, 0.0),
              experimental_configuration="G1"):
    """Wave-tank transient experiments over sloping bathymetry with
    rectangular / circular obstacles (initial_state_transient.h)."""
    cases = ("G1", "G2", "G3", "none")
    if experimental_configuration not in cases:
        raise ValueError(f"configuration must be one of {cases}")
    case = experimental_configuration
    L = uniform(eq, flow_state_left)
    R = uniform(eq, flow_state_right)

    def bathymetry(points):
        x, y = points[0], points[1]
        bath = jnp.where(
            (x >= 0.0) & (x <= 3.26), -0.00092 * x,
            jnp.where(x > 3.26, -0.0404 * (x - 3.26) - 0.00092 * 3.26, 0.0),
        )
        if case == "none":
            return bath
        obstacle = jnp.zeros_like(x)
        ol, ow = 0.163, 0.08

        def in_rect(xc):
            a = (x - xc) / ol
            b = y / ow
            return jnp.abs(a + b) + jnp.abs(a - b) <= 1.0

        if case == "G1":
            obstacle = jnp.where(in_rect(2.05 + 0.163 / 2.0), 0.07, obstacle)
        elif case == "G2":
            xc = 1.845 + 0.155
            radicand = jnp.maximum(1.0 - ((x - xc) / 0.155) ** 2, 0.0)
            obstacle = jnp.maximum(0.073 * jnp.sqrt(radicand), 0.0)
            obstacle = jnp.where(
                in_rect(2.35 + 0.163 / 2.0), 0.07, obstacle
            )
        else:  # G3: narrowing half-circle canal + rectangle
            xc = 1.94 + 0.155
            radicand = jnp.maximum(1.0 - ((x - xc) / 0.155) ** 2, 0.0)
            semi = 0.073 * jnp.sqrt(radicand)
            near = jnp.abs(x - xc) <= 0.155
            obstacle = jnp.where((y < semi - 0.12) & near, 0.21, obstacle)
            obstacle = jnp.where((y > -semi + 0.12) & near, 0.21, obstacle)
            obstacle = jnp.where(
                in_rect(2.35 + 0.163 / 2.0), 0.07, obstacle
            )
        return bath + obstacle

    def fn(points, t):
        sel = (points[0] > 1.0e-8)[None]
        return jnp.where(sel, R.state(points, t), L.state(points, t))

    return SWInitialState(fn, bathymetry)


def function(eq, water_depth_expression="1.0", velocity_x_expression="0.0",
             velocity_y_expression="0.0", bathymetry_expression="0.0"):
    """States from expressions over x, y, t
    (sw initial_state_function.h)."""
    import jax.numpy as _jnp

    exprs = [water_depth_expression, velocity_x_expression]
    if eq.dim >= 2:
        exprs.append(velocity_y_expression)
    exprs.append(bathymetry_expression)
    compiled = [compile(str(e), "<sw expression>", "eval") for e in exprs]

    def env_of(points, t):
        env = {"x": points[0], "t": t, "pi": math.pi}
        if eq.dim >= 2:
            env["y"] = points[1]
        env.update({
            k: getattr(_jnp, k)
            for k in ("sin", "cos", "exp", "log", "sqrt", "abs", "tanh",
                      "where", "minimum", "maximum", "power", "sign")
        })
        return env

    def fn(points, t):
        env = env_of(points, t)
        vals = [
            jnp.broadcast_to(jnp.asarray(eval(c, env), points.dtype),  # noqa: S307
                             points.shape[1:])
            for c in compiled[:-1]
        ]
        h = vals[0]
        return jnp.stack([h] + [h * v for v in vals[1:]], axis=0)

    def bathymetry(points):
        env = env_of(points, 0.0)
        return jnp.broadcast_to(
            jnp.asarray(eval(compiled[-1], env), points.dtype),  # noqa: S307
            points.shape[1:],
        )

    return SWInitialState(fn, bathymetry)


def geotiff(eq, *args, **kwargs):
    """GeoTIFF bathymetry import (initial_state_geotiff.h) requires GDAL,
    which is not available in this environment."""
    raise NotImplementedError(
        "the 'geotiff' initial state requires GDAL/rasterio, which is not "
        "bundled; convert the GeoTIFF to an expression or custom state"
    )


LIBRARY = {
    "uniform": uniform,
    "paraboloid": paraboloid,
    "ritter dam break": ritter_dam_break,
    "circular dam break": circular_dam_break,
    "contrast": contrast,
    "smooth vortex": smooth_vortex,
    "sloping friction": sloping_friction,
    "soliton": soliton,
    "flow over bump": flow_over_bump,
    "three bumps dam break": three_bumps_dam_break,
    "hou test": hou_test,
    "transient experiments": transient,
    "function": function,
    "geotiff": geotiff,
}


def make_initial_state(
    eq, configuration: str, direction=None, position=None, **kwargs
) -> SWInitialState:
    """Build the configured state with the InitialValues affine transform
    (initial_values.template.h:66-155) applied to both the state and the
    bathymetry."""
    base = LIBRARY[configuration](eq, **kwargs)
    if direction is None and position is None:
        return base
    from .euler_initial_states import galilei_wrap

    direction = direction or [1.0] + [0.0] * (eq.dim - 1)
    position = position or [0.0] * eq.dim
    state = galilei_wrap(base.state, direction, position, eq.dim)

    wrapped_z = galilei_wrap(
        lambda pts, t: jnp.broadcast_to(
            base.bathymetry(pts)[None],
            (1 + eq.dim,) + pts.shape[1:],
        ),
        direction, position, eq.dim,
    )

    def bathymetry(points):
        return wrapped_z(points, 0.0)[0]

    return SWInitialState(state, bathymetry)
