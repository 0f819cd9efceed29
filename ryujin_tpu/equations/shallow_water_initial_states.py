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


LIBRARY = {
    "uniform": uniform,
    "paraboloid": paraboloid,
    "ritter dam break": ritter_dam_break,
    "circular dam break": circular_dam_break,
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
