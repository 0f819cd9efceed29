"""The hyperbolic module: graph-viscosity IDP update with convex limiting.

TPU-native re-design of /root/reference/source/hyperbolic_module.template.h.
The reference performs seven fused passes over a SIMD-blocked CSR stencil
with overlapped MPI ghost exchange.  Here the whole update is a single
jit-compiled dataflow graph over stencil arrays:

  step 1   apply boundary conditions + precompute (prepare_state_vector,
           reference :96-193)
  step 2   d_ij for *all* directed edges via the approximate Riemann solver
           + indicator alpha_i (reference :341-424 computes the upper
           triangle only and symmetrizes; on TPU recomputing both edge
           directions is cheaper than the bookkeeping, and the
           transpose-max automatically reproduces the boundary-pair fixup
           of reference :461-490)
  step 3   d_ii = -sum_j d_ij and tau_max (reference :494-564)
  step 4   low-order update, limiter bounds, r_i, first part of P_ij
           (reference :597-884)
  step 5   mass-matrix correction (Neumann series b_ij), first limiter pass
           (reference :892-1041)
  step 6/7 symmetrized l_ij, high-order updates, second limiter pass with
           the (1 - l^(1)) l^(2) shortcut (reference :1054-1182)

Layout (TPU-critical, see equations/euler.py): node axis LAST, component
and edge-slot axes first — states [C, n], edge data [K, n], [dim, K, n].
The minormost dimension maps to the TPU's 128-lane vector axis, so the
huge node axis must live there.

The restart mechanism (invariant-domain violation -> Restart exception,
reference :1190-1207) is functional here: step() returns an `ok` flag and
the TimeIntegrator retries with cfl_min (bang-bang control).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..offline.ell import EllData
from ..offline.mesh import Boundary
from ..offline.structured import StructuredData


def _f(x, dtype):
    return jnp.asarray(x, dtype=dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Stencil:
    """Device-resident padded ELL stencil (see offline/ell.py).

    Layout: node axis last.  cols/trans are [K, n] gather indices.
    """

    cols: jax.Array  # [K, n] int32
    cij: jax.Array  # [dim, K, n]
    mij: jax.Array  # [K, n]
    mask: jax.Array  # [K, n]
    trans: jax.Array  # [K, n] int32 (flattened over [K, n])
    cii: jax.Array  # [dim, n]
    m_lumped: jax.Array  # [n]
    m_lumped_inv: jax.Array  # [n]
    n_nbrs: jax.Array  # [n]
    node_mask: jax.Array  # [n]
    measure_inv: jax.Array  # scalar

    @property
    def K(self) -> int:
        return self.cols.shape[0]

    def nbr(self, X: jax.Array) -> jax.Array:
        """Gather neighbor values: [..., n] -> [..., K, n]."""
        return X[..., self.cols]

    def transpose_edge(self, E: jax.Array) -> jax.Array:
        """Transposed-edge gather: out[..., k, i] = E at the (j -> i) edge."""
        K, n = self.cols.shape
        flat = E.reshape(E.shape[:-2] + (K * n,))
        return flat[..., self.trans]

def _edge_vec(x):
    """Host [n, K, dim] -> device [dim, K, n]."""
    return np.transpose(x, (2, 1, 0))


def _stencil_from_ell(ell: EllData, dtype=jnp.float64) -> Stencil:
    """Transpose host ELL arrays into the node-last device layout.

    ell.trans holds flat indices into the row-major [n, K] edge numbering;
    the device layout flattens [K, n], so (j, k_rev) -> k_rev * n + j.
    """
    K = ell.max_degree
    n = ell.n_pad
    j = ell.trans // K
    k_rev = ell.trans % K
    trans = (k_rev * n + j).T
    return Stencil(
        cols=jnp.asarray(ell.cols.T.astype(np.int32)),
        cij=_f(_edge_vec(ell.cij), dtype),
        mij=_f(ell.mij.T, dtype),
        mask=_f(ell.mask.T, dtype),
        trans=jnp.asarray(trans.astype(np.int32)),
        cii=_f(ell.cii.T, dtype),
        m_lumped=_f(ell.lumped_mass, dtype),
        m_lumped_inv=_f(1.0 / ell.lumped_mass, dtype),
        n_nbrs=_f(ell.n_nbrs, dtype),
        node_mask=_f(ell.node_mask, dtype),
        measure_inv=_f(1.0 / ell.measure_of_omega, dtype),
    )


@partial(
    jax.tree_util.register_dataclass,
    meta_fields=("shape", "offsets"),
    data_fields=(
        "cij", "mij", "mask", "cii", "m_lumped", "m_lumped_inv",
        "n_nbrs", "node_mask", "measure_inv",
    ),
)
@dataclasses.dataclass(frozen=True)
class StructuredStencil:
    """Lattice-canvas stencil: neighbor access by static shifts, no gathers.

    Node axis last, canvas-flattened.  `nbr` and `transpose_edge` reshape
    the node axis to the canvas and use jnp.roll with static shifts
    (slice+concat on TPU — no gather).  Wrapped-in values at non-periodic
    canvas edges correspond to masked edges; for periodic axes the wrap is
    exactly the periodic identification (offline/structured.py).  The
    transposed slot of offset k is K-1-k (lattice_offsets ordering).
    """

    shape: Tuple[int, ...]
    offsets: Tuple[Tuple[int, ...], ...]

    cij: jax.Array  # [dim, K, n]
    mij: jax.Array  # [K, n]
    mask: jax.Array  # [K, n]
    cii: jax.Array  # [dim, n]
    m_lumped: jax.Array  # [n]
    m_lumped_inv: jax.Array  # [n]
    n_nbrs: jax.Array  # [n]
    node_mask: jax.Array  # [n]
    measure_inv: jax.Array  # scalar

    @property
    def K(self) -> int:
        return len(self.offsets)

    def _shift(self, Xc: jax.Array, off) -> jax.Array:
        d = len(self.shape)
        axes = tuple(range(Xc.ndim - d, Xc.ndim))
        return jnp.roll(Xc, tuple(-o for o in off), axis=axes)

    def nbr(self, X: jax.Array) -> jax.Array:
        """[..., n] -> [..., K, n] via K static canvas shifts."""
        lead = X.shape[:-1]
        Xc = X.reshape(lead + self.shape)
        out = jnp.stack(
            [self._shift(Xc, off) for off in self.offsets],
            axis=len(lead),
        )
        return out.reshape(lead + (len(self.offsets),) + X.shape[-1:])

    def transpose_edge(self, E: jax.Array) -> jax.Array:
        """[..., K, n] -> [..., K, n]: out[..., k, i] = E[..., K-1-k, i+off_k]."""
        K = E.shape[-2]
        lead = E.shape[:-2]
        Ec = E.reshape(lead + (K,) + self.shape)
        kax = len(lead)
        out = jnp.stack(
            [
                self._shift(jnp.take(Ec, K - 1 - k, axis=kax), off)
                for k, off in enumerate(self.offsets)
            ],
            axis=kax,
        )
        return out.reshape(E.shape)

    @staticmethod
    def from_data(sd: StructuredData, dtype=jnp.float64) -> "StructuredStencil":
        return StructuredStencil(
            shape=tuple(sd.shape),
            offsets=tuple(map(tuple, sd.offsets)),
            cij=_f(_edge_vec(sd.cij), dtype),
            mij=_f(sd.mij.T, dtype),
            mask=_f(sd.mask.T, dtype),
            cii=_f(sd.cii.T, dtype),
            m_lumped=_f(sd.lumped_mass, dtype),
            m_lumped_inv=_f(1.0 / sd.lumped_mass, dtype),
            n_nbrs=_f(sd.n_nbrs, dtype),
            node_mask=_f(sd.node_mask, dtype),
            measure_inv=_f(1.0 / sd.measure_of_omega, dtype),
        )


@dataclasses.dataclass(frozen=True)
class BoundaryCondition:
    """One group of boundary nodes sharing a Boundary id (static arrays)."""

    bc_id: int
    index: np.ndarray  # [k] node ids
    normal: np.ndarray  # [dim, k]
    position: np.ndarray  # [dim, k]


@dataclasses.dataclass(frozen=True)
class HyperbolicModuleParams:
    """Limiter / indicator / riemann solver parameters.

    Mirrors IndicatorParameters, LimiterParameters, RiemannSolverParameters
    (euler/indicator.h:21-38, euler/limiter.h:19-61, euler/riemann_solver.h:19-47).
    """

    evc_factor: float = 1.0
    limiter_iterations: int = 2
    limiter_newton_max_iterations: int = 2
    limiter_newton_tolerance: float = 1.0e-10
    limiter_relaxation_factor: float = 1.0
    riemann_newton_max_iterations: int = 0
    riemann_newton_tolerance: float = 1.0e-10


class HyperbolicModule:
    """Owns the stencil + boundary data and provides prepare/step.

    `initial_state_fn(positions [dim, ...], t) -> states [C, ...]` supplies
    Dirichlet data (the analog of InitialValues::initial_state,
    /root/reference/source/initial_values.h:94-125).
    """

    def __init__(
        self,
        equation,
        ell,
        initial_state_fn: Callable,
        params: HyperbolicModuleParams = HyperbolicModuleParams(),
        dtype=jnp.float64,
        initial_precomputed: Optional[jax.Array] = None,
    ):
        self.eq = equation
        self.params = params
        self.dtype = dtype
        if isinstance(ell, StructuredData):
            self.stencil = StructuredStencil.from_data(ell, dtype)
        else:
            self.stencil = _stencil_from_ell(ell, dtype)
        self.initial_state_fn = initial_state_fn
        self.n_pad = ell.n_pad
        if initial_precomputed is None:
            initial_precomputed = jnp.zeros(
                (equation.n_initial_precomputed, ell.n_pad), dtype=dtype
            )
        self.initial_precomputed = initial_precomputed

        # Flatten boundary rounds into a static list:
        self.boundary: List[BoundaryCondition] = []
        for rnd in ell.boundary_rounds:
            for bc_id in sorted(rnd.keys()):
                g = rnd[bc_id]
                self.boundary.append(
                    BoundaryCondition(
                        bc_id=int(bc_id),
                        index=g.index,
                        normal=g.normal.T,
                        position=g.position.T,
                    )
                )

    # ------------------------------------------------------------------
    # Step 1: boundary conditions + precomputation
    # (hyperbolic_module.template.h:96-193)
    # ------------------------------------------------------------------
    def prepare_state_vector(self, U: jax.Array, t) -> Tuple[jax.Array, jax.Array]:
        eq = self.eq
        for bc in self.boundary:
            if bc.bc_id == Boundary.do_nothing:
                continue
            idx = jnp.asarray(bc.index)
            normal = _f(bc.normal, self.dtype)
            U_b = U[:, idx]
            dirichlet = None
            if bc.bc_id in (
                Boundary.dirichlet,
                Boundary.dynamic,
                Boundary.dirichlet_momentum,
            ):
                pos = _f(bc.position, self.dtype)
                dirichlet = self.initial_state_fn(pos, t)
            U_b = eq.apply_boundary_conditions(bc.bc_id, U_b, normal, dirichlet)
            U = U.at[:, idx].set(U_b)

        prec = None
        for cycle in range(eq.n_precomputation_cycles):
            prec = eq.precompute(U, self.initial_precomputed, cycle=cycle, prev=prec) \
                if _precompute_takes_prev(eq) else eq.precompute(
                    U, self.initial_precomputed, cycle=cycle
                )
        return U, prec

    # ------------------------------------------------------------------
    # Steps 2-7
    # ------------------------------------------------------------------
    def step(
        self,
        U_old: jax.Array,
        prec_old: jax.Array,
        stage_U: jax.Array,
        stage_prec: jax.Array,
        stage_weights: jax.Array,
        tau,
        cfl,
        tau_cap,
        stencil=None,
    ):
        """One forward-Euler IDP substep.

        Args:
          U_old, prec_old: prepared state (BCs applied, precomputed filled).
          stage_U, stage_prec: stacked high-order stage states [S, C, n] /
            [S, P, n]; S is static, weights select active slots.  A slot
            with weight 0 is skipped at runtime via lax.cond, so one
            compiled substep serves every stage of a Runge-Kutta scheme
            (the reference instead instantiates step<stages> per stage
            count, hyperbolic_module.h:208-223).
          stage_weights: traced [S] stage weights.
          tau: step size; pass 0.0 to use the computed tau_max.
          cfl: relative CFL number (traced scalar ok).
          tau_cap: upper bound for the computed tau (t_final - t etc.).
          stencil: the (traced) stencil pytree; defaults to self.stencil.
            Passing it as an argument avoids embedding the mesh arrays as
            jit constants (XLA would constant-fold over the whole mesh at
            compile time).

        Returns (U_new, tau_used, ok).
        """
        eq = self.eq
        st = stencil if stencil is not None else self.stencil
        p = self.params
        dtype = self.dtype
        tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)

        U_j = st.nbr(U_old)  # [C, K, n]
        prec_j = st.nbr(prec_old)  # [P, K, n]
        U_i = U_old[:, None]  # [C, 1, n]

        # ---- step 2: d_ij for all directed edges + alpha ----------------
        norm = jnp.sqrt(jnp.sum(st.cij * st.cij, axis=0))  # [K, n]
        norm_safe = jnp.maximum(norm, tiny)
        n_ij = st.cij / norm_safe[None]

        lam = eq.riemann_lambda_max(
            U_i,
            U_j,
            n_ij,
            newton_iterations=p.riemann_newton_max_iterations,
            newton_tol=p.riemann_newton_tolerance,
        )
        d = norm * lam * st.mask  # [K, n]

        hd_i = st.m_lumped * st.measure_inv
        alpha = eq.indicator_alpha(
            U_old, prec_old, U_j, prec_j, st.cij, st.mask, hd_i,
            evc_factor=p.evc_factor,
        )

        # ---- step 3: symmetrize, diagonal, tau_max ----------------------
        d = jnp.maximum(d, st.transpose_edge(d)) * st.mask
        d_sum = -jnp.sum(d, axis=0)  # [n]
        d_sum = jnp.minimum(d_sum, -1.0e6 * tiny)  # (reference :545-546)

        tau_i = cfl * st.m_lumped / (-2.0 * d_sum)
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)
        tau_max = jnp.min(jnp.where(st.node_mask > 0, tau_i, big))
        tau_max = jnp.minimum(tau_max, tau_cap)
        tau = jnp.where(tau == 0.0, tau_max, tau)

        # ---- step 4: low-order update, bounds, r_i, P_ij ----------------
        S = stage_U.shape[0] if stage_U is not None else 0
        weight = 1.0 - (jnp.sum(stage_weights) if S else 0.0)

        alpha_j = st.nbr(alpha)  # [K, n]
        factor = 0.5 * (alpha[None] + alpha_j)
        d_H = d * factor

        regularization = jnp.asarray(
            100.0 * np.finfo(np.dtype(dtype)).tiny, dtype
        )
        scaled_c_ij = st.cij / jnp.maximum(d, regularization)[None]

        flux_i = eq.flux_contribution(prec_old, self.initial_precomputed, U_old)
        flux_j = st.nbr(flux_i) if _flux_is_state_local(eq) else None
        if flux_j is None:
            flux_j = eq.flux_contribution(prec_j, None, U_j)

        flux_ij = eq.flux_divergence(flux_i[:, :, None], flux_j, st.cij)  # [C,K,n]
        flux_ii = eq.flux_divergence(flux_i, flux_i, st.cii)  # [C, n] diagonal

        dU = U_j - U_i  # [C, K, n]

        m = st.mask[None]  # [1, K, n]
        U_new = U_old + (tau * st.m_lumped_inv)[None] * (
            jnp.sum((flux_ij + d[None] * dU) * m, axis=1) + flux_ii
        )

        F_iH = (
            jnp.sum((d_H[None] * dU + weight * flux_ij) * m, axis=1)
            + weight * flux_ii
        )
        P = (weight - 1.0) * flux_ij + (d_H - d)[None] * dU

        for s in range(S):
            w_s = stage_weights[s]

            def _accumulate(args, s=s, w_s=w_s):
                F_iH, P = args
                flux_s_i = eq.flux_contribution(
                    stage_prec[s], self.initial_precomputed, stage_U[s]
                )
                flux_s_j = st.nbr(flux_s_i)
                flux_s_ij = eq.flux_divergence(
                    flux_s_i[:, :, None], flux_s_j, st.cij
                )
                flux_s_ii = eq.flux_divergence(flux_s_i, flux_s_i, st.cii)
                F_iH = F_iH + w_s * (
                    jnp.sum(flux_s_ij * m, axis=1) + flux_s_ii
                )
                return F_iH, P + w_s * flux_s_ij

            F_iH, P = jax.lax.cond(
                w_s != 0.0, _accumulate, lambda args: args, (F_iH, P)
            )

        bounds = eq.limiter_bounds(
            U_old, prec_old, U_j, prec_j, scaled_c_ij, st.mask, hd_i,
            relaxation_factor=p.limiter_relaxation_factor,
        )  # [B, n]

        if p.limiter_iterations == 0:
            # With zero limiter iterations the reference performs the pure
            # low-order update (step 5 and the 6/7 loop are skipped,
            # hyperbolic_module.template.h:892,1054).
            ok = jnp.asarray(True)
            return U_new, tau, ok

        # ---- step 5: mass-matrix correction + first limiter pass --------
        F_jH = st.nbr(F_iH)  # [C, K, n]
        m_j = st.nbr(st.m_lumped)  # [K, n]
        b_ij = -st.mij / m_j  # kronecker term vanishes off-diagonal
        b_ji = -st.mij * st.m_lumped_inv[None]
        P = P + b_ij[None] * F_jH - b_ji[None] * F_iH[:, None]
        P = P * (tau * st.m_lumped_inv * st.n_nbrs)[None, None]

        l_ij, success = eq.limiter_limit(
            bounds[:, None],
            U_new[:, None],
            P,
            newton_iterations=p.limiter_newton_max_iterations,
            newton_tol=p.limiter_newton_tolerance,
        )  # [K, n]

        ok = jnp.all(
            (success | (st.mask == 0.0)) | (st.node_mask[None] == 0.0)
        )

        # ---- steps 6/7: symmetrize l, high-order update ------------------
        lam_i = (1.0 / st.n_nbrs)[None]  # [1, n]
        n_iter = p.limiter_iterations
        for it in range(n_iter):
            last = it + 1 == n_iter
            l_sym = jnp.minimum(l_ij, st.transpose_edge(l_ij))
            U_new = U_new + lam_i * jnp.sum(l_sym[None] * P * m, axis=1)
            if not last:
                P2 = (1.0 - l_sym)[None] * P
                l_next, _ = eq.limiter_limit(
                    bounds[:, None],
                    U_new[:, None],
                    P2,
                    newton_iterations=p.limiter_newton_max_iterations,
                    newton_tol=p.limiter_newton_tolerance,
                )
                # shortcut (1 - l^(1)) * l^(2)  (reference :1163-1170)
                l_ij = (1.0 - l_sym) * l_next

        return U_new, tau, ok


def _precompute_takes_prev(eq) -> bool:
    import inspect

    return "prev" in inspect.signature(eq.precompute).parameters


def _flux_is_state_local(eq) -> bool:
    """True if flux_contribution depends only on (prec, U) pointwise, so the
    neighbor flux can be obtained by gathering the nodal flux."""
    return getattr(eq, "flux_contribution_is_pointwise", True)
