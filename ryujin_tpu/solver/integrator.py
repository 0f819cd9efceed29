"""Time integration schemes.

TPU-native re-implementation of /root/reference/source/time_integrator.template.h.
All explicit schemes (ssprk 22/33, erk 11/22/33/43/54) plus the Strang and
IMEX variants used for equations with a parabolic subsystem.  Each scheme is
a pure function chaining prepare_state_vector + HyperbolicModule.step with
the reference's stage-weight arrays (e.g. erk_33: stages {-1} and
{0.75, -2}, reference :373-403).

The functional analog of the Restart exception + bang-bang CFL control
(reference :250-275) lives in TimeIntegrator.step: the jitted scheme
returns an `ok` flag; on failure the step is re-run with cfl_min.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .hyperbolic import HyperbolicModule

EFFICIENCY = {
    "ssprk 22": 1.0,
    "ssprk 33": 1.0,
    "erk 11": 1.0,
    "erk 22": 2.0,
    "erk 33": 3.0,
    "erk 43": 4.0,
    "erk 54": 5.0,
    "strang ssprk 33 cn": 2.0,
    "strang erk 33 cn": 6.0,
    "strang erk 43 cn": 8.0,
    "imex 11": 1.0,
    "imex 22": 2.0,
    "imex 33": 3.0,
}


@dataclasses.dataclass
class TimeIntegrator:
    """Drives one full time step of the selected scheme.

    parabolic_module: optional; required for strang/imex schemes.
    """

    hyperbolic_module: HyperbolicModule
    scheme: str = "erk 33"
    cfl_min: float = 0.45
    cfl_max: float = 0.90
    cfl_recovery_strategy: str = "bang bang control"  # or "none"
    parabolic_module: Optional[object] = None

    def __post_init__(self):
        if self.scheme not in EFFICIENCY:
            raise ValueError(f"unknown time stepping scheme '{self.scheme}'")
        self._jit_step = jax.jit(self._scheme_step)
        self.n_restarts = 0
        self.n_warnings = 0

    @property
    def efficiency(self) -> float:
        return EFFICIENCY[self.scheme]

    # -- public host-level entry ---------------------------------------
    def step(self, U, t, t_final=jnp.inf):
        """Returns (U_new, tau_total, ok).  Handles bang-bang CFL recovery."""
        tau_cap = t_final - t
        U_new, tau, ok = self._jit_step(U, t, self.cfl_max, tau_cap)
        if self.cfl_recovery_strategy == "bang bang control":
            if not bool(ok):
                self.n_restarts += 1
                U_new, tau, ok = self._jit_step(U, t, self.cfl_min, tau_cap)
                if not bool(ok):
                    self.n_warnings += 1
        elif not bool(ok):
            self.n_warnings += 1
        return U_new, tau, ok

    # -- jitted scheme dispatch ----------------------------------------
    def _scheme_step(self, U, t, cfl, tau_cap):
        fn = {
            "ssprk 22": self._step_ssprk_22,
            "ssprk 33": self._step_ssprk_33,
            "erk 11": self._step_erk_11,
            "erk 22": self._step_erk_22,
            "erk 33": self._step_erk_33,
            "erk 43": self._step_erk_43,
            "erk 54": self._step_erk_54,
            "strang ssprk 33 cn": self._step_strang_ssprk_33_cn,
            "strang erk 33 cn": self._step_strang_erk_33_cn,
            "strang erk 43 cn": self._step_strang_erk_43_cn,
            "imex 11": self._step_imex_11,
            "imex 22": self._step_imex_22,
            "imex 33": self._step_imex_33,
        }[self.scheme]
        return fn(U, t, cfl, tau_cap)

    # -- helpers ---------------------------------------------------------
    def _prep(self, U, t):
        return self.hyperbolic_module.prepare_state_vector(U, t)

    def _hstep(self, Up, prec, stages, weights, tau, cfl, tau_cap):
        return self.hyperbolic_module.step(
            Up, prec, stages, weights, tau, cfl, tau_cap
        )

    def _pstep(self, U, t, stages, weights, tau):
        assert self.parabolic_module is not None, (
            "scheme requires a parabolic module"
        )
        return self.parabolic_module.step(U, t, stages, weights, tau)

    # -- explicit schemes (reference :278-512) ---------------------------
    def _step_erk_11(self, U, t, cfl, tau_cap):
        Up, prec = self._prep(U, t)
        T0, tau, ok = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap)
        return T0, tau, ok

    def _step_ssprk_22(self, U, t, cfl, tau_cap):
        Up, prec = self._prep(U, t)
        T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap)
        T0p, prec0 = self._prep(T0, t + tau)
        T1, _, ok1 = self._hstep(T0p, prec0, [], [], tau, cfl, tau_cap)
        T1 = 0.5 * T1 + 0.5 * Up
        return T1, tau, ok0 & ok1

    def _step_ssprk_33(self, U, t, cfl, tau_cap):
        Up, prec = self._prep(U, t)
        T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap)
        T0p, prec0 = self._prep(T0, t + tau)
        T1, _, ok1 = self._hstep(T0p, prec0, [], [], tau, cfl, tau_cap)
        T1 = 0.25 * T1 + 0.75 * Up
        T1p, prec1 = self._prep(T1, t + 0.5 * tau)
        T2, _, ok2 = self._hstep(T1p, prec1, [], [], tau, cfl, tau_cap)
        T2 = (2.0 / 3.0) * T2 + (1.0 / 3.0) * Up
        return T2, tau, ok0 & ok1 & ok2

    def _step_erk_22(self, U, t, cfl, tau_cap):
        Up, prec = self._prep(U, t)
        T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap / 2.0)
        T0p, prec0 = self._prep(T0, t + tau)
        T1, _, ok1 = self._hstep(
            T0p, prec0, [(Up, prec)], [-1.0], tau, cfl, tau_cap
        )
        return T1, 2.0 * tau, ok0 & ok1

    def _step_erk_33(self, U, t, cfl, tau_cap):
        Up, prec = self._prep(U, t)
        T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap / 3.0)
        T0p, prec0 = self._prep(T0, t + tau)
        T1, _, ok1 = self._hstep(
            T0p, prec0, [(Up, prec)], [-1.0], tau, cfl, tau_cap
        )
        T1p, prec1 = self._prep(T1, t + 2.0 * tau)
        T2, _, ok2 = self._hstep(
            T1p, prec1, [(Up, prec), (T0p, prec0)], [0.75, -2.0], tau, cfl, tau_cap
        )
        return T2, 3.0 * tau, ok0 & ok1 & ok2

    def _step_erk_43(self, U, t, cfl, tau_cap):
        Up, prec = self._prep(U, t)
        T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap / 4.0)
        T0p, prec0 = self._prep(T0, t + tau)
        T1, _, ok1 = self._hstep(
            T0p, prec0, [(Up, prec)], [-1.0], tau, cfl, tau_cap
        )
        T1p, prec1 = self._prep(T1, t + 2.0 * tau)
        T2, _, ok2 = self._hstep(
            T1p, prec1, [(T0p, prec0)], [-1.0], tau, cfl, tau_cap
        )
        T2p, prec2 = self._prep(T2, t + 3.0 * tau)
        T3, _, ok3 = self._hstep(
            T2p,
            prec2,
            [(T0p, prec0), (T1p, prec1)],
            [5.0 / 3.0, -10.0 / 3.0],
            tau,
            cfl,
            tau_cap,
        )
        return T3, 4.0 * tau, ok0 & ok1 & ok2 & ok3

    def _step_erk_54(self, U, t, cfl, tau_cap):
        # ERK(5,4) with equidistant c_i (reference :445-512)
        c = 0.2
        a_21 = +0.2
        a_31 = +0.26075582269554909
        a_32 = +0.13924417730445096
        a_41 = -0.25856517872570289
        a_42 = +0.91136274166280729
        a_43 = -0.05279756293710430
        a_51 = +0.21623276431503774
        a_52 = +0.51534223099602405
        a_53 = -0.81662794199265554
        a_54 = +0.88505294668159373
        a_61 = -0.10511678454691901
        a_62 = +0.87880047152100838
        a_63 = -0.58903404061484477
        a_64 = +0.46213380485434047

        Up, prec = self._prep(U, t)
        T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap / 5.0)
        T0p, prec0 = self._prep(T0, t + tau)
        T1, _, ok1 = self._hstep(
            T0p, prec0, [(Up, prec)], [(a_31 - a_21) / c], tau, cfl, tau_cap
        )
        T1p, prec1 = self._prep(T1, t + 2.0 * tau)
        T2, _, ok2 = self._hstep(
            T1p,
            prec1,
            [(Up, prec), (T0p, prec0)],
            [(a_41 - a_31) / c, (a_42 - a_32) / c],
            tau,
            cfl,
            tau_cap,
        )
        T2p, prec2 = self._prep(T2, t + 3.0 * tau)
        T3, _, ok3 = self._hstep(
            T2p,
            prec2,
            [(Up, prec), (T0p, prec0), (T1p, prec1)],
            [(a_51 - a_41) / c, (a_52 - a_42) / c, (a_53 - a_43) / c],
            tau,
            cfl,
            tau_cap,
        )
        T3p, prec3 = self._prep(T3, t + 4.0 * tau)
        T4, _, ok4 = self._hstep(
            T3p,
            prec3,
            [(Up, prec), (T0p, prec0), (T1p, prec1), (T2p, prec2)],
            [
                (a_61 - a_51) / c,
                (a_62 - a_52) / c,
                (a_63 - a_53) / c,
                (a_64 - a_54) / c,
            ],
            tau,
            cfl,
            tau_cap,
        )
        return T4, 5.0 * tau, ok0 & ok1 & ok2 & ok3 & ok4

    # -- Strang splitting schemes (reference :515-680) --------------------
    def _ssprk33_at(self, U, t, tau, cfl, tau_cap, first_tau=None):
        """One SSPRK33 step; if first_tau is None the first substep picks tau."""
        Up, prec = self._prep(U, t)
        if first_tau is None:
            T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap)
        else:
            tau = first_tau
            T0, _, ok0 = self._hstep(Up, prec, [], [], tau, cfl, tau_cap)
        T0p, prec0 = self._prep(T0, t + tau)
        T1, _, ok1 = self._hstep(T0p, prec0, [], [], tau, cfl, tau_cap)
        T1 = 0.25 * T1 + 0.75 * Up
        T1p, prec1 = self._prep(T1, t + 0.5 * tau)
        T2, _, ok2 = self._hstep(T1p, prec1, [], [], tau, cfl, tau_cap)
        T2 = (2.0 / 3.0) * T2 + (1.0 / 3.0) * Up
        return T2, tau, ok0 & ok1 & ok2

    def _step_strang_ssprk_33_cn(self, U, t, cfl, tau_cap):
        A, tau, okA = self._ssprk33_at(U, t, None, cfl, tau_cap / 2.0)
        # Crank-Nicolson = backward Euler + extrapolation (reference :540-543)
        B, okP = self._pstep(A, t, [], [], tau)
        B = 2.0 * B - A
        Cc, _, okB = self._ssprk33_at(B, t + tau, tau, cfl, tau_cap, first_tau=tau)
        return Cc, 2.0 * tau, okA & okP & okB

    def _erk33_at(self, U, t, cfl, tau_cap, first_tau=None):
        Up, prec = self._prep(U, t)
        if first_tau is None:
            T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap)
        else:
            tau = first_tau
            T0, _, ok0 = self._hstep(Up, prec, [], [], tau, cfl, tau_cap)
        T0p, prec0 = self._prep(T0, t + tau)
        T1, _, ok1 = self._hstep(
            T0p, prec0, [(Up, prec)], [-1.0], tau, cfl, tau_cap
        )
        T1p, prec1 = self._prep(T1, t + 2.0 * tau)
        T2, _, ok2 = self._hstep(
            T1p, prec1, [(Up, prec), (T0p, prec0)], [0.75, -2.0], tau, cfl, tau_cap
        )
        return T2, tau, ok0 & ok1 & ok2

    def _step_strang_erk_33_cn(self, U, t, cfl, tau_cap):
        A, tau, okA = self._erk33_at(U, t, cfl, tau_cap / 6.0)
        B, okP = self._pstep(A, t, [], [], 3.0 * tau)
        B = 2.0 * B - A
        Cc, _, okB = self._erk33_at(B, t + 3.0 * tau, cfl, tau_cap, first_tau=tau)
        return Cc, 6.0 * tau, okA & okP & okB

    def _erk43_at(self, U, t, cfl, tau_cap, first_tau=None):
        Up, prec = self._prep(U, t)
        if first_tau is None:
            T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap)
        else:
            tau = first_tau
            T0, _, ok0 = self._hstep(Up, prec, [], [], tau, cfl, tau_cap)
        T0p, prec0 = self._prep(T0, t + tau)
        T1, _, ok1 = self._hstep(
            T0p, prec0, [(Up, prec)], [-1.0], tau, cfl, tau_cap
        )
        T1p, prec1 = self._prep(T1, t + 2.0 * tau)
        T2, _, ok2 = self._hstep(
            T1p, prec1, [(T0p, prec0)], [-1.0], tau, cfl, tau_cap
        )
        T2p, prec2 = self._prep(T2, t + 3.0 * tau)
        T3, _, ok3 = self._hstep(
            T2p,
            prec2,
            [(T0p, prec0), (T1p, prec1)],
            [5.0 / 3.0, -10.0 / 3.0],
            tau,
            cfl,
            tau_cap,
        )
        return T3, tau, ok0 & ok1 & ok2 & ok3

    def _step_strang_erk_43_cn(self, U, t, cfl, tau_cap):
        A, tau, okA = self._erk43_at(U, t, cfl, tau_cap / 8.0)
        B, okP = self._pstep(A, t, [], [], 4.0 * tau)
        B = 2.0 * B - A
        Cc, _, okB = self._erk43_at(B, t + 4.0 * tau, cfl, tau_cap, first_tau=tau)
        return Cc, 8.0 * tau, okA & okP & okB

    # -- IMEX schemes (reference :682-798) --------------------------------
    def _step_imex_11(self, U, t, cfl, tau_cap):
        Up, prec = self._prep(U, t)
        T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap)
        T1, okP = self._pstep(T0, t, [], [], tau)
        return T1, tau, ok0 & okP

    def _step_imex_22(self, U, t, cfl, tau_cap):
        Up, prec = self._prep(U, t)
        T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap / 2.0)
        T1, okP1 = self._pstep(T0, t, [], [], tau)
        T1p, prec1 = self._prep(T1, t + tau)
        T2, _, ok2 = self._hstep(
            T1p, prec1, [(Up, prec)], [-1.0], tau, cfl, tau_cap
        )
        T3, okP2 = self._pstep(T2, t + tau, [(Up, 1.0)], [1.0], tau)
        return T3, 2.0 * tau, ok0 & okP1 & ok2 & okP2

    def _step_imex_33(self, U, t, cfl, tau_cap):
        import math

        gamma = 0.5 + 0.5 / math.sqrt(3.0)
        Up, prec = self._prep(U, t)
        T0, tau, ok0 = self._hstep(Up, prec, [], [], 0.0, cfl, tau_cap / 3.0)
        T1, okP1 = self._pstep(T0, t, [(Up, 1.0)], [1.0 - 3.0 * gamma], tau)
        T1p, prec1 = self._prep(T1, t + tau)
        T2, _, ok2 = self._hstep(
            T1p, prec1, [(Up, prec)], [-1.0], tau, cfl, tau_cap
        )
        T3, okP2 = self._pstep(
            T2,
            t + tau,
            [(Up, 1.0), (T1, 1.0)],
            [6.0 * gamma - 1.0, 2.0 - 9.0 * gamma],
            tau,
        )
        T3p, prec3 = self._prep(T3, t + 2.0 * tau)
        T4, _, ok4 = self._hstep(
            T3p, prec3, [(Up, prec), (T1p, prec1)], [0.75, -2.0], tau, cfl, tau_cap
        )
        T5, okP3 = self._pstep(
            T4,
            t + 2.0 * tau,
            [(Up, 1.0), (T1, 1.0), (T3, 1.0)],
            [0.75 - 3.0 * gamma, 6.0 * gamma - 2.0, 9.0 / 4.0 - 3.0 * gamma],
            tau,
        )
        return T5, 3.0 * tau, ok0 & okP1 & ok2 & okP2 & ok4 & okP3
