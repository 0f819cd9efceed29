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


def _cell_norms(mesh: Mesh, nodal: np.ndarray, kind: str) -> float:
    """Integrate the Q1 interpolant of `nodal` (vertex values) over cells."""
    dim = mesh.dim
    qp, qw = _cell_quadrature(dim, 3)
    N, dN = _shape_q1(dim, qp)
    X = mesh.vertices[mesh.cells]  # [nc, nsh, dim]
    J = np.einsum("qsd,nse->nqed", dN, X)
    detJ = np.abs(np.linalg.det(J))
    JxW = detJ * qw[None, :]
    vals = np.einsum("qs,ns->nq", N, nodal[mesh.cells])
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
    analytic = np.asarray(
        initial_state_fn(jnp.asarray(mesh.vertices.T, dtype=U.dtype), t)
    )  # [C, n_raw]

    # nodal numerical values at mesh vertices (constrained vertices read
    # from their master, matching affine_constraints().distribute()):
    U_vertices = U[:, ell.vertex_to_node]

    linf = l1 = l2 = 0.0
    for name in components:
        idx = names.index(name)
        err = U_vertices[idx] - analytic[idx]
        linf_e = float(np.max(np.abs(err)))
        l1_e = _cell_norms(mesh, err, "L1")
        l2_e = _cell_norms(mesh, err, "L2")
        if normalize:
            a = analytic[idx]
            linf_a = float(np.max(np.abs(a)))
            l1_a = _cell_norms(mesh, a, "L1")
            l2_a = _cell_norms(mesh, a, "L2")
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
