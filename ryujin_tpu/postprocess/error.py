"""Error computation against analytic solutions.

Re-implements TimeLoop::compute_error
(/root/reference/source/time_loop.template.h:694-833): per selected
component, the consolidated (optionally normalized) L-inf, L1, L2 norms of
(numerical - analytic) at final time.  NOTE the reference's exact
semantics: the analytic solution is interpolated NODALLY
(interpolate_hyperbolic_vector), the error vector is formed at the nodes,
and L1/L2 integrate the FE INTERPOLANT of that nodal error by cellwise
quadrature (integrate_difference of `error_component` against a
ZeroFunction, QGauss(3) per direction — time_loop.template.h:769-796).
Evaluating the analytic solution at the quadrature points instead adds
the O(h^2) FE-interpolation error of the exact solution and caps the
observed L1 convergence at 2nd order — the committed 3rd-order vortex
tables are only reproducible with the nodal-error semantics.  We do
exactly the same, vectorized over all cells with NumPy.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from ..offline.assembly import _cell_quadrature, _shape_q1
from ..offline.ell import EllData
from ..offline.mesh import Mesh


def _cell_quad_setup(mesh: Mesh, dof_map=None):
    """Shared per-cell quadrature data: (N, cell_dofs, JxW, xq) where
    xq [nc, nq, dim] are the physical quadrature points."""
    dim = mesh.dim
    qp, qw = _cell_quadrature(dim, max(3, (
        dof_map.degree + 1 if dof_map is not None else 0)))
    N1, dN1 = _shape_q1(dim, qp)
    if dof_map is None:
        N, cell_dofs = N1, mesh.cells
    else:
        from ..offline.ansatz import shape_qp

        N, _ = shape_qp(dim, dof_map.degree, qp)
        cell_dofs = dof_map.cell_dofs
    X = mesh.vertices[mesh.cells]  # [nc, nsh, dim]
    J = np.einsum("qsd,nse->nqed", dN1, X)
    detJ = np.abs(np.linalg.det(J))
    JxW = detJ * qw[None, :]
    xq = np.einsum("qs,nsd->nqd", N1, X)
    return N, cell_dofs, JxW, xq


def _quad_norms(vals: np.ndarray, JxW: np.ndarray, kind: str) -> float:
    """L1/L2 norm of per-quadrature-point values [nc, nq]."""
    if kind == "L1":
        return float(np.sum(np.abs(vals) * JxW))
    if kind == "L2":
        return float(np.sqrt(np.sum(vals * vals * JxW)))
    raise ValueError(kind)


def _cell_norms(mesh: Mesh, nodal: np.ndarray, kind: str,
                dof_map=None) -> float:
    """Integrate the FE interpolant of `nodal` (raw dof values) over
    cells (used for interpolated fields without an analytic closure)."""
    N, cell_dofs, JxW, _ = _cell_quad_setup(mesh, dof_map)
    vals = np.einsum("qs,ns->nq", N, nodal[cell_dofs])
    return _quad_norms(vals, JxW, kind)


def compute_error(
    eq,
    mesh: Mesh,
    ell: EllData,
    U: np.ndarray,
    t: float,
    initial_state_fn: Callable,
    components: Optional[Sequence[str]] = None,
    normalize: bool = True,
):
    """Returns (linf, l1, l2) consolidated over the selected components."""
    import jax.numpy as jnp

    names = eq.component_names
    if components is None:
        components = names

    U = np.asarray(U)  # [C, n_pad] (component-first layout)

    # raw dof positions: mesh vertices for cG Q1, the ansatz DoF map else
    ansatz = getattr(ell, "ansatz", "cG Q1")
    dm = None
    if ansatz != "cG Q1":
        from ..offline.ansatz import build_dof_map

        dm = build_dof_map(mesh, ansatz)
        pos = dm.positions
    else:
        pos = mesh.vertices
    analytic = np.asarray(
        initial_state_fn(jnp.asarray(pos.T, dtype=U.dtype), t)
    )  # [C, n_raw] nodal interpolation (interpolate_hyperbolic_vector)

    # nodal numerical values at raw dofs (constrained dofs read from
    # their master, matching affine_constraints().distribute()):
    U_vertices = U[:, ell.vertex_to_node]

    # L1/L2 integrate the FE interpolant of the NODAL error (see the
    # module docstring — evaluating the analytic solution at quadrature
    # points instead is NOT what the reference does):
    N, cell_dofs, JxW, _ = _cell_quad_setup(mesh, dm)

    linf = l1 = l2 = 0.0
    for name in components:
        idx = names.index(name)
        err = U_vertices[idx] - analytic[idx]
        err_q = np.einsum("qs,ns->nq", N, err[cell_dofs])
        linf_e = float(np.max(np.abs(err)))
        l1_e = _quad_norms(err_q, JxW, "L1")
        l2_e = _quad_norms(err_q, JxW, "L2")
        if normalize:
            a_q = np.einsum("qs,ns->nq", N, analytic[idx][cell_dofs])
            linf_a = float(np.max(np.abs(analytic[idx])))
            l1_a = _quad_norms(a_q, JxW, "L1")
            l2_a = _quad_norms(a_q, JxW, "L2")
            linf += linf_e / linf_a
            l1 += l1_e / l1_a
            l2 += l2_e / l2_a
        else:
            linf += linf_e
            l1 += l1_e
            l2 += l2_e
    return linf, l1, l2


def interpolate_nodal(initial_state_fn, ell: EllData, eq, t, dtype):
    """Nodal interpolation of an initial/analytic state onto packed nodes.

    Mirrors InitialValues::interpolate_hyperbolic_vector
    (initial_values.template.h:223-266); padded nodes receive a safe
    uniform state so that downstream math never sees zeros.
    """
    import jax.numpy as jnp

    pos = jnp.asarray(ell.positions.T, dtype=dtype)  # [dim, n_pad]
    U = initial_state_fn(pos, t)  # [C, n_pad]
    safe = jnp.zeros((eq.n_comp, 1), dtype=dtype)
    safe = safe.at[0, 0].set(1.0).at[-1, 0].set(1.0)
    mask = jnp.asarray(ell.node_mask, dtype=dtype)[None]
    return jnp.where(mask > 0, U, safe)
