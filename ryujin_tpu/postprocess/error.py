"""Error computation against analytic solutions.

Re-implements TimeLoop::compute_error
(/root/reference/source/time_loop.template.h:694-833): per selected
component, the consolidated (optionally normalized) L-inf, L1, L2 norms of
(numerical - analytic) at final time.  The reference evaluates Linf on the
nodal vector and L1/L2 by cellwise quadrature (QGauss(3) per direction) of
the finite element interpolant; we do exactly the same, vectorized over all
cells with NumPy.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from ..offline.assembly import _cell_quadrature, _shape_q1
from ..offline.ell import EllData
from ..offline.mesh import Mesh


def _cell_norms(mesh: Mesh, nodal: np.ndarray, kind: str,
                dof_map=None) -> float:
    """Integrate the FE interpolant of `nodal` (raw dof values) over cells.

    dof_map: None for the vertex-based cG Q1 path, else an
    offline.ansatz.DofMap whose basis interpolates the dof values."""
    dim = mesh.dim
    qp, qw = _cell_quadrature(dim, max(3, (
        dof_map.degree + 1 if dof_map is not None else 0)))
    _, dN1 = _shape_q1(dim, qp)
    if dof_map is None:
        N, _ = _shape_q1(dim, qp)
        cell_dofs = mesh.cells
    else:
        from ..offline.ansatz import shape_qp

        N, _ = shape_qp(dim, dof_map.degree, qp)
        cell_dofs = dof_map.cell_dofs
    X = mesh.vertices[mesh.cells]  # [nc, nsh, dim]
    J = np.einsum("qsd,nse->nqed", dN1, X)
    detJ = np.abs(np.linalg.det(J))
    JxW = detJ * qw[None, :]
    vals = np.einsum("qs,ns->nq", N, nodal[cell_dofs])
    if kind == "L1":
        return float(np.sum(np.abs(vals) * JxW))
    if kind == "L2":
        return float(np.sqrt(np.sum(vals * vals * JxW)))
    raise ValueError(kind)


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
    )  # [C, n_raw]

    # nodal numerical values at raw dofs (constrained dofs read from
    # their master, matching affine_constraints().distribute()):
    U_vertices = U[:, ell.vertex_to_node]

    linf = l1 = l2 = 0.0
    for name in components:
        idx = names.index(name)
        err = U_vertices[idx] - analytic[idx]
        linf_e = float(np.max(np.abs(err)))
        l1_e = _cell_norms(mesh, err, "L1", dm)
        l2_e = _cell_norms(mesh, err, "L2", dm)
        if normalize:
            a = analytic[idx]
            linf_a = float(np.max(np.abs(a)))
            l1_a = _cell_norms(mesh, a, "L1", dm)
            l2_a = _cell_norms(mesh, a, "L2", dm)
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
