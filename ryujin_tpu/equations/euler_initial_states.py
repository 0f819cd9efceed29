"""Euler initial state library.

Re-implements the reference initial states
(/root/reference/source/euler/initial_state_library_euler.h:42-57) as
jit-traceable functions `(points [dim, ...], t) -> states [C, ...]`
(component-first layout, see equations/euler.py):

  uniform, isentropic vortex, becker solution, contrast, radial contrast,
  three state contrast, four state contrast, shock front, rarefaction,
  leblanc, smooth wave, ramp up, noh, astro jet, icf like,
  function (callable)

plus the affine/Galilei transform wrapper of InitialValues
(/root/reference/source/initial_values.template.h:66-155): points are
rotated so the configured `direction` maps onto the x-axis around
`position`, and the resulting momentum is rotated back.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def galilei_wrap(state_fn, direction, position, dim):
    """Affine transform of InitialValues (initial_values.template.h:66-155)."""
    direction = np.asarray(direction, dtype=np.float64)
    # python floats (weak-typed) so the transform preserves the points' dtype:
    direction = tuple(
        float(v) for v in direction / np.linalg.norm(direction)
    )
    position = np.asarray(position, dtype=np.float64)

    def transform_point(x):
        # x [dim, ...]; cast the numpy constant to preserve x's dtype
        d = x - jnp.asarray(position, x.dtype).reshape(
            (dim,) + (1,) * (x.ndim - 1)
        )
        if dim == 3:
            n_x, n_z = direction[0], direction[2]
            norm = math.sqrt(n_x * n_x + n_z * n_z)
            if norm > 1e-14:
                nx, nz = n_x / norm, n_z / norm
                d0 = nx * d[0] + nz * d[2]
                d2 = -nz * d[0] + nx * d[2]
                d = jnp.stack([d0, d[1], d2], axis=0)
        if dim >= 2:
            n_x, n_y = direction[0], direction[1]
            norm = math.sqrt(n_x * n_x + n_y * n_y)
            if norm > 1e-14:
                nx, ny = n_x / norm, n_y / norm
                d0 = nx * d[0] + ny * d[1]
                d1 = -ny * d[0] + nx * d[1]
                rows = [d0, d1] + ([d[2]] if dim == 3 else [])
                d = jnp.stack(rows, axis=0)
        return d

    def transform_momentum(mv):
        # mv [dim, ...]
        if dim >= 2:
            n_x, n_y = direction[0], direction[1]
            norm = math.sqrt(n_x * n_x + n_y * n_y)
            if norm > 1e-14:
                nx, ny = n_x / norm, n_y / norm
                m0 = nx * mv[0] - ny * mv[1]
                m1 = ny * mv[0] + nx * mv[1]
                rows = [m0, m1] + ([mv[2]] if dim == 3 else [])
                mv = jnp.stack(rows, axis=0)
        if dim == 3:
            n_x, n_z = direction[0], direction[2]
            norm = math.sqrt(n_x * n_x + n_z * n_z)
            if norm > 1e-14:
                nx, nz = n_x / norm, n_z / norm
                m0 = nx * mv[0] - nz * mv[2]
                m2 = nz * mv[0] + nx * mv[2]
                mv = jnp.stack([m0, mv[1], m2], axis=0)
        return mv

    def wrapped(points, t):
        p = transform_point(points)
        state = state_fn(p, t)
        m = transform_momentum(state[1 : 1 + dim])
        return jnp.concatenate([state[:1], m, state[1 + dim :]], axis=0)

    return wrapped


def isentropic_vortex(eq, mach_number=2.0, beta=5.0):
    """(euler/initial_state_isentropic_vortex.h:53-91)."""
    gamma = eq.params.gamma
    dim = eq.dim

    def fn(points, t):
        x = points[0] - mach_number * t
        y = points[1] if dim >= 2 else jnp.zeros_like(x)
        r_sq = x * x + y * y
        factor = beta / (2.0 * jnp.pi) * jnp.exp(0.5 - 0.5 * r_sq)
        T = 1.0 - (gamma - 1.0) / (2.0 * gamma) * factor * factor
        u = mach_number - factor * y
        v = factor * x
        rho = jnp.power(T, 1.0 / (gamma - 1.0))
        p = jnp.power(rho, gamma)
        E = p / (gamma - 1.0) + 0.5 * rho * (u * u + v * v)
        if dim == 2:
            return jnp.stack([rho, rho * u, rho * v, E], axis=0)
        elif dim == 3:
            return jnp.stack(
                [rho, rho * u, rho * v, jnp.zeros_like(rho), E], axis=0
            )
        raise ValueError("isentropic vortex requires dim >= 2")

    return fn


def uniform(eq, primitive_state: Sequence[float] = (1.4, 3.0, 1.0)):
    """Constant state from primitive [rho, u, p] (initial_state_uniform.h)."""
    prim = list(primitive_state)
    dim = eq.dim

    def fn(points, t):
        shape = points.shape[1:]
        rho = jnp.full(shape, prim[0], dtype=points.dtype)
        # expand 1d primitive (rho, u, p) to dim velocity components:
        if len(prim) == 3:
            vel = [jnp.full(shape, prim[1], dtype=points.dtype)] + [
                jnp.zeros(shape, dtype=points.dtype) for _ in range(dim - 1)
            ]
            p = jnp.full(shape, prim[2], dtype=points.dtype)
        else:
            vel = [
                jnp.full(shape, prim[1 + d], dtype=points.dtype)
                for d in range(dim)
            ]
            p = jnp.full(shape, prim[1 + dim], dtype=points.dtype)
        prim_state = jnp.stack([rho] + vel + [p], axis=0)
        return eq.from_primitive_state(prim_state)

    return fn


def contrast(eq, primitive_left=(1.4, 0.0, 1.0), primitive_right=(1.4, 0.0, 1.0)):
    """Jump at x=0 between two primitive states (initial_state_contrast.h)."""
    L = uniform(eq, primitive_left)
    R = uniform(eq, primitive_right)

    def fn(points, t):
        sel = (points[0] > 0.0)[None]
        return jnp.where(sel, R(points, t), L(points, t))

    return fn


def shock_front(eq, mach_number=2.0, primitive_right=(1.4, 0.0, 1.0)):
    """Moving shock front via Rankine-Hugoniot (initial_state_shock_front.h).

    The right (unshocked) state is given; the left state and shock speed
    follow from the RH conditions for a shock Mach number `mach_number`.
    """
    gamma = eq.params.gamma
    rho_R, u_R, p_R = primitive_right[0], primitive_right[1], primitive_right[-1]
    a_R = math.sqrt(gamma * p_R / rho_R)
    mach = mach_number
    S3 = mach * a_R
    delta_mach = mach * mach - 1.0

    rho_L = rho_R * (gamma + 1.0) * mach * mach / (
        (gamma - 1.0) * mach * mach + 2.0
    )
    u_L = u_R + 2.0 * a_R / (gamma + 1.0) * delta_mach / mach
    p_L = p_R * (2.0 * gamma * mach * mach - (gamma - 1.0)) / (gamma + 1.0)

    L = uniform(eq, (rho_L, u_L, p_L))
    R = uniform(eq, (rho_R, u_R, p_R))

    def fn(points, t):
        pos = points[0] - S3 * t
        sel = (pos > 0.0)[None]
        return jnp.where(sel, R(points, t), L(points, t))

    return fn


def leblanc(eq):
    """LeBlanc shock tube analytic solution (initial_state_leblanc.h)."""
    gamma = 5.0 / 3.0

    def fn(points, t):
        x = points[0]
        rho_L, p_L = 1.0, (2.0 / 3.0) * 1.0e-1
        rho_R, p_R = 1.0e-3, (2.0 / 3.0) * 1.0e-10
        a_L = jnp.sqrt(gamma * p_L / rho_L)
        u_star = 0.621838
        p_star = 0.515577e-3
        rho_star_L = 5.40793353493162e-2
        rho_star_R = 3.99999806043000e-3
        S_shock = 0.829867

        xt = jnp.where(t > 0, x / jnp.maximum(t, 1e-300), jnp.sign(x) * 1e10)
        a_star_L = a_L - 0.5 * (gamma - 1.0) * u_star

        def fan(xt):
            u = 2.0 / (gamma + 1.0) * (a_L + xt)
            a = a_L - 0.5 * (gamma - 1.0) * u
            rho = rho_L * jnp.power(a / a_L, 2.0 / (gamma - 1.0))
            p = p_L * jnp.power(a / a_L, 2.0 * gamma / (gamma - 1.0))
            return rho, u, p

        rho_f, u_f, p_f = fan(xt)
        rho = jnp.where(
            xt < -a_L,
            rho_L,
            jnp.where(
                xt < u_star - a_star_L,
                rho_f,
                jnp.where(
                    xt < u_star,
                    rho_star_L,
                    jnp.where(xt < S_shock, rho_star_R, rho_R),
                ),
            ),
        )
        u = jnp.where(
            xt < -a_L,
            0.0,
            jnp.where(
                xt < u_star - a_star_L,
                u_f,
                jnp.where(xt < S_shock, u_star, 0.0),
            ),
        )
        p = jnp.where(
            xt < -a_L,
            p_L,
            jnp.where(
                xt < u_star - a_star_L,
                p_f,
                jnp.where(xt < S_shock, p_star, p_R),
            ),
        )
        zeros = [jnp.zeros_like(rho) for _ in range(eq.dim - 1)]
        g = eq.params.gamma
        E = p / (g - 1.0) + 0.5 * rho * u * u
        return jnp.stack([rho, rho * u] + zeros + [E], axis=0)

    return fn


def smooth_wave(eq, rho_ref=1.0, p_ref=1.0, mach=1.0, x0=0.1, x1=0.3):
    """Smooth traveling density wave (initial_state_smooth_wave.h)."""

    def fn(points, t):
        x = points[0] - mach * t
        inside = (x > x0) & (x < x1)
        z = jnp.where(inside, (x - x0) * (x1 - x), 0.0)
        # rho = rho_ref + 64 (x-x0)^3 (x1-x)^3 / (x1-x0)^6
        # (initial_state_smooth_wave.h:95-99)
        bump = 64.0 * z**3 / (x1 - x0) ** 6
        rho = rho_ref + bump
        u = jnp.full_like(rho, mach)
        p = jnp.full_like(rho, p_ref)
        zeros = [jnp.zeros_like(rho) for _ in range(eq.dim - 1)]
        prim = jnp.stack([rho, u] + zeros + [p], axis=0)
        return eq.from_primitive_state(prim)

    return fn


def ramp_up(eq, primitive_initial=(1.4, 0.0, 1.0), primitive_final=(1.4, 3.0, 1.0),
            t_initial=0.0, t_final=1.0):
    """Time-dependent ramp of a uniform state (initial_state_ramp_up.h)."""
    I = uniform(eq, primitive_initial)
    F = uniform(eq, primitive_final)

    def fn(points, t):
        s = jnp.clip((t - t_initial) / (t_final - t_initial), 0.0, 1.0)
        prim_i = eq.to_primitive_state(I(points, t))
        prim_f = eq.to_primitive_state(F(points, t))
        return eq.from_primitive_state((1.0 - s) * prim_i + s * prim_f)

    return fn


def becker_solution(
    eq,
    velocity_galilean_frame: float = 0.2,
    velocity_left: float = 1.0,
    velocity_right: float = 7.0 / 27.0,
    density_left: float = 1.0,
    mu: float = 0.01,
):
    """Becker's stationary viscous shock profile
    (euler/initial_state_becker_solution.h:30-260), the analytic solution
    used by the Navier-Stokes verification suite.  The implicit velocity
    profile psi(x, v) = 0 is inverted by a fixed-iteration bisection
    (jit-friendly; the reference uses a Newton iteration)."""
    gamma = eq.params.gamma
    v_l, v_r = velocity_left, velocity_right
    v0 = math.sqrt(v_l * v_r)
    Pr = 0.75
    factor = 2.0 * gamma / (gamma + 1.0) * mu / (density_left * v_l * Pr)
    c_l = v_l / (v_l - v_r)
    c_r = v_r / (v_l - v_r)
    R_infty = (gamma + 1.0) / (gamma - 1.0)

    def stuff(v):
        log_l = jnp.log(v_l - v) - math.log(v_l - v0)
        log_r = jnp.log(v - v_r) - math.log(v0 - v_r)
        return factor * (c_l * log_l - c_r * log_r)

    tol = 1.0e-12
    v_lo = tol * v_l + (1.0 - tol) * v_r
    v_hi = (1.0 - tol) * v_l + tol * v_r
    x_left = float(stuff(jnp.asarray(v_hi)))
    x_right = float(stuff(jnp.asarray(v_lo)))

    def find_velocity(x):
        lo = jnp.full_like(x, v_lo)
        hi = jnp.full_like(x, v_hi)
        for _ in range(80):
            mid = 0.5 * (lo + hi)
            too_large = stuff(mid) < x  # stuff is decreasing in v
            hi = jnp.where(too_large, mid, hi)
            lo = jnp.where(too_large, lo, mid)
        v = 0.5 * (lo + hi)
        v = jnp.where(x <= x_left, v_l, v)
        v = jnp.where(x >= x_right, v_r, v)
        return v

    def fn(points, t):
        x = points[0] - velocity_galilean_frame * t
        v = find_velocity(x)
        rho = density_left * v_l / v
        e = 1.0 / (2.0 * gamma) * (R_infty * v_l * v_r - v * v)
        vel = velocity_galilean_frame + v
        E = rho * (e + 0.5 * vel * vel)
        zeros = [jnp.zeros_like(rho) for _ in range(eq.dim - 1)]
        return jnp.stack([rho, rho * vel] + zeros + [E], axis=0)

    return fn


def rarefaction(eq, gamma=None):
    """Analytic 1-rarefaction solution (initial_state_rarefaction.h:46-153).

    Left state (rho, u, p) = (3, c_L, 1); the right state follows from the
    isentropic condition and the 1-Riemann invariant with rho_R = 0.5; the
    fan is centered so it has opened for 0.2/(u_R - u_L) at t = 0.
    """
    gamma = eq.params.gamma if gamma is None else gamma
    dim = eq.dim

    rho_L, p_L = 3.0, 1.0
    c_L = math.sqrt(gamma * p_L / rho_L)
    u_L = c_L
    rho_R = 0.5
    p_R = (rho_R / rho_L) ** gamma * p_L
    c_R = math.sqrt(gamma * p_R / rho_R)
    u_R = u_L + 2.0 * (c_L - c_R) / (gamma - 1.0)

    k1 = 2.0 / (gamma + 1.0)
    k2 = (gamma - 1.0) / ((gamma + 1.0) * c_L)
    k3 = c_L + 0.5 * (gamma - 1.0) * u_L
    de = 2.0 / (gamma - 1.0)
    pe = 2.0 * gamma / (gamma - 1.0)
    t0 = 0.2 / (u_R - u_L)

    def fn(points, t):
        x = points[0]
        tt = t0 + t
        chi = x / tt
        base = jnp.maximum(k1 + k2 * (u_L - chi), 1e-30)
        rho_f = rho_L * jnp.power(base, de)
        u_f = k1 * (k3 + chi)
        p_f = p_L * jnp.power(base, pe)
        in_left = x <= tt * (u_L - c_L)
        in_fan = x <= tt * (u_R - c_R)
        rho = jnp.where(in_left, rho_L, jnp.where(in_fan, rho_f, rho_R))
        u = jnp.where(in_left, u_L, jnp.where(in_fan, u_f, u_R))
        p = jnp.where(in_left, p_L, jnp.where(in_fan, p_f, p_R))
        E = p / (gamma - 1.0) + 0.5 * rho * u * u
        zeros = [jnp.zeros_like(rho) for _ in range(dim - 1)]
        return jnp.stack([rho, rho * u] + zeros + [E], axis=0)

    return fn


def noh(eq, reference_density=1.0, reference_velocity_magnitude=1.0,
        reference_pressure=1.0e-12, gamma=None):
    """Noh implosion with analytic solution (initial_state_noh.h:36-110)."""
    gamma = eq.params.gamma if gamma is None else gamma
    dim = eq.dim
    rho0, u0, p0 = (
        reference_density, reference_velocity_magnitude, reference_pressure
    )

    def fn(points, t):
        r = jnp.sqrt(sum(points[d] ** 2 for d in range(dim)))
        tiny = 10.0 * np.finfo(np.dtype(points.dtype)).tiny
        D = u0 * (gamma - 1.0) / 2.0
        interior = jnp.where(t > 0.0, r / jnp.maximum(t, tiny) < D, False)
        rho_in = rho0 * ((gamma + 1.0) / (gamma - 1.0)) ** dim
        p_in = (
            0.5 * rho0 * u0 * u0
            * (gamma + 1.0) ** dim / (gamma - 1.0) ** (dim - 1)
        )
        rho_out = rho0 * jnp.power(1.0 + t / (r + tiny), dim - 1)
        rho = jnp.where(interior, rho_in, rho_out)
        p = jnp.where(interior, p_in, p0)
        vel = [
            jnp.where(interior, 0.0, -u0 * points[d] / (r + tiny))
            for d in range(dim)
        ]
        E = p / (gamma - 1.0) + 0.5 * rho * sum(v * v for v in vel)
        return jnp.stack([rho] + [rho * v for v in vel] + [E], axis=0)

    return fn


def radial_contrast(eq, primitive_inner=(1.4, 0.0, 1.0),
                    primitive_outer=(1.4, 0.0, 1.0), radius=0.5):
    """Disk of one state inside another (initial_state_radial_contrast.h)."""
    inner = uniform(eq, primitive_inner)
    outer = uniform(eq, primitive_outer)
    dim = eq.dim

    def fn(points, t):
        r = jnp.sqrt(sum(points[d] ** 2 for d in range(dim)))
        return jnp.where((r > radius)[None], outer(points, t),
                         inner(points, t))

    return fn


def three_state_contrast(
    eq,
    primitive_left=(1.0, 0.0, 1.0e3),
    left_region_length=0.1,
    primitive_middle=(1.0, 0.0, 1.0e-2),
    middle_region_length=0.8,
    primitive_right=(1.0, 0.0, 1.0e2),
):
    """Woodward-Colella style triple state
    (initial_state_three_state_contrast.h:38-92)."""
    L = uniform(eq, primitive_left)
    M = uniform(eq, primitive_middle)
    R = uniform(eq, primitive_right)
    x1, x2 = left_region_length, left_region_length + middle_region_length

    def fn(points, t):
        x = points[0][None]
        return jnp.where(
            x >= x2, R(points, t),
            jnp.where(x >= x1, M(points, t), L(points, t)),
        )

    return fn


def four_state_contrast(
    eq,
    primitive_bottom_left=(1.4, 0.0, 0.0, 1.0),
    primitive_bottom_right=(1.4, 0.0, 0.0, 1.0),
    primitive_top_left=(1.4, 0.0, 0.0, 1.0),
    primitive_top_right=(1.4, 0.0, 0.0, 1.0),
):
    """2D Riemann quadrant data (initial_state_four_state_contrast.h)."""
    if eq.dim < 2:
        raise ValueError("four state contrast requires dim >= 2")
    BL = uniform(eq, primitive_bottom_left)
    BR = uniform(eq, primitive_bottom_right)
    TL = uniform(eq, primitive_top_left)
    TR = uniform(eq, primitive_top_right)

    def fn(points, t):
        right = (points[0] >= 0.0)[None]
        top_sel = (points[1] >= 0.0)[None]
        top = jnp.where(right, TR(points, t), TL(points, t))
        bottom = jnp.where(right, BR(points, t), BL(points, t))
        return jnp.where(top_sel, top, bottom)

    return fn


def astro_jet(eq, jet_width=0.05, primitive_jet_state=(5.0, 30.0, 0.4127),
              primitive_ambient_right=(5.0, 0.0, 0.4127), gamma=None):
    """Mach-2000 astrophysical jet inflow (initial_state_astro_jet.h)."""
    del gamma  # only affects the EOS, which lives on eq
    jet = uniform(eq, primitive_jet_state)
    ambient = uniform(eq, primitive_ambient_right)

    def fn(points, t):
        sel = ((points[0] < 1.0e-12)
               & (jnp.abs(points[1]) <= jet_width))[None]
        return jnp.where(sel, jet(points, t), ambient(points, t))

    return fn


def icf_like(
    eq,
    primitive_state_inside=(0.1, 0.0, 1.0),
    primitive_state_outside=(1.0, 0.0, 1.0),
    interface_radius=1.0,
    number_of_modes=8.0,
    amplitude=0.02,
    mach_number=3.0,
    shock_radius=1.2,
    gamma=None,
):
    """ICF-like perturbed interface + incoming radial shock
    (initial_state_icf_like.h:40-160)."""
    gamma = eq.params.gamma if gamma is None else gamma
    dim = eq.dim
    inside = uniform(eq, primitive_state_inside)
    outside = uniform(eq, primitive_state_outside)

    rho_R, u_R, p_R = (
        primitive_state_outside[0], primitive_state_outside[1],
        primitive_state_outside[-1],
    )
    b = getattr(eq.params, "covolume_b", 0.0) if hasattr(eq, "params") else 0.0
    a_R = math.sqrt(gamma * p_R / rho_R / (1.0 - b * rho_R))
    mach_R = u_R / a_R
    S3 = mach_number * a_R
    dm = mach_R - mach_number
    rho_sh = rho_R * (gamma + 1.0) * dm * dm / ((gamma - 1.0) * dm * dm + 2.0)
    u_sh = (1.0 - rho_R / rho_sh) * S3 + rho_R / rho_sh * u_R
    p_sh = p_R * (2.0 * gamma * dm * dm - (gamma - 1.0)) / (gamma + 1.0)

    def fn(points, t):
        r = jnp.sqrt(sum(points[d] ** 2 for d in range(dim)))
        tiny = 10.0 * np.finfo(np.dtype(points.dtype)).tiny
        r_safe = jnp.maximum(r, tiny)
        # incoming radial shock state (velocity -u_sh * r_hat):
        vel = [-u_sh * points[d] / r_safe for d in range(dim)]
        rho = jnp.full_like(r, rho_sh)
        E = p_sh / (gamma - 1.0) + 0.5 * rho_sh * sum(v * v for v in vel)
        shock = jnp.stack([rho] + [rho_sh * v for v in vel] + [E], axis=0)

        angle = jnp.arccos(
            jnp.clip(jnp.abs(points[dim - 1]) / r_safe, 0.0, 1.0)
        )
        perturbation = amplitude * jnp.cos(number_of_modes * angle)
        full = jnp.where(
            (r > interface_radius + perturbation)[None],
            outside(points, t), inside(points, t),
        )
        return jnp.where((r > shock_radius)[None], shock, full)

    return fn


def function(eq, density_expression="1.4", velocity_x_expression="3.0",
             velocity_y_expression="0.0", velocity_z_expression="0.0",
             pressure_expression="1.0"):
    """Primitive state from expressions over x, y, z, t
    (euler/initial_state_function.h:36-70)."""
    dim = eq.dim
    exprs = [density_expression, velocity_x_expression]
    if dim >= 2:
        exprs.append(velocity_y_expression)
    if dim >= 3:
        exprs.append(velocity_z_expression)
    exprs.append(pressure_expression)
    compiled = [compile(str(e), "<initial state expression>", "eval")
                for e in exprs]

    def fn(points, t):
        env = {"x": points[0], "t": t, "jnp": jnp, "np": jnp,
               "pi": math.pi}
        env.update({
            k: getattr(jnp, k)
            for k in ("sin", "cos", "tan", "exp", "log", "sqrt", "abs",
                      "tanh", "cosh", "sinh", "arctan", "where", "minimum",
                      "maximum", "power", "sign")
        })
        if dim >= 2:
            env["y"] = points[1]
        if dim >= 3:
            env["z"] = points[2]
        vals = [
            jnp.broadcast_to(jnp.asarray(eval(c, env), points.dtype),  # noqa: S307
                             points.shape[1:])
            for c in compiled
        ]
        return eq.from_primitive_state(jnp.stack(vals, axis=0))

    return fn


LIBRARY = {
    "isentropic vortex": isentropic_vortex,
    "becker solution": becker_solution,
    "uniform": uniform,
    "contrast": contrast,
    "shock front": shock_front,
    "leblanc": leblanc,
    "smooth wave": smooth_wave,
    "ramp up": ramp_up,
    "rarefaction": rarefaction,
    "noh": noh,
    "radial contrast": radial_contrast,
    "three state contrast": three_state_contrast,
    "four state contrast": four_state_contrast,
    "astro jet": astro_jet,
    "icf like": icf_like,
    "function": function,
}


def make_initial_state(
    eq,
    configuration: str,
    direction=None,
    position=None,
    **kwargs,
):
    """Build the configured + Galilei-transformed initial state callable."""
    fn = LIBRARY[configuration](eq, **kwargs)
    if direction is None:
        direction = [1.0] + [0.0] * (eq.dim - 1)
    if position is None:
        position = [0.0] * eq.dim
    return galilei_wrap(fn, direction, position, eq.dim)
