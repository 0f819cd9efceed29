"""Finite element ansatz spaces: cG Q1-Q3, dG Q0-Q3.

The analog of the reference's Discretization Ansatz enum and finite
element / quadrature selection (/root/reference/source/discretization.h:131-173,
discretization.template.h:126-192): continuous FE_Q(p) with Gauss-Lobatto
support points, discontinuous FE_DGQ(p), QGauss(p+1) volume quadrature.

This module owns the reference-element data (1D Gauss-Lobatto support
points, tensor-product Lagrange bases) and the global DoF enumeration over
a Mesh:

  * cG Qp: vertex dofs first (= mesh vertex ids), then (p-1) dofs per
    unique edge (parameterized from the lower to the higher vertex id so
    both neighboring cells agree), then (p-1)^dim interior dofs per cell.
  * dG Qp: (p+1)^dim independent dofs per cell.

Local dofs use lexicographic tensor ordering (x fastest), NOT deal.II's
hierarchic ordering — the global assembly is ours, so only internal
consistency matters.  Geometry uses the (sub-parametric) Q1 bilinear map
of the mesh cells.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from .mesh import Mesh

ANSATZE = (
    "cG Q1", "cG Q2", "cG Q3", "dG Q0", "dG Q1", "dG Q2", "dG Q3",
)


def parse_ansatz(name: str) -> Tuple[bool, int]:
    """Return (continuous, degree)."""
    if name not in ANSATZE:
        raise ValueError(f"unknown ansatz '{name}' (choose from {ANSATZE})")
    kind, deg = name.split()
    return kind == "cG", int(deg[1])


def gauss_lobatto_points(p: int) -> np.ndarray:
    """p+1 Gauss-Lobatto support points on [0, 1] (FE_Q node positions)."""
    if p == 0:
        return np.array([0.5])
    if p == 1:
        return np.array([0.0, 1.0])
    # roots of (1-x^2) P'_p(x) on [-1, 1]:
    legendre = np.polynomial.legendre.Legendre.basis(p)
    interior = legendre.deriv().roots()
    pts = np.concatenate([[-1.0], np.sort(interior), [1.0]])
    return 0.5 * (pts + 1.0)


def lagrange_1d(nodes: np.ndarray, x: np.ndarray):
    """Lagrange basis values/derivatives at x for the given nodes.

    Returns (V [nx, n], D [nx, n])."""
    n = len(nodes)
    x = np.asarray(x, np.float64)
    V = np.ones((len(x), n))
    D = np.zeros((len(x), n))
    for i in range(n):
        others = [k for k in range(n) if k != i]
        denom = np.prod([nodes[i] - nodes[k] for k in others])
        for k in others:
            V[:, i] *= x - nodes[k]
        V[:, i] /= denom
        # derivative via sum over products
        for m in others:
            term = np.ones(len(x))
            for k in others:
                if k != m:
                    term *= x - nodes[k]
            D[:, i] += term
        D[:, i] /= denom
    return V, D


def shape_qp(dim: int, p: int, qpts: np.ndarray):
    """Tensor Lagrange basis on Gauss-Lobatto nodes, lexicographic order.

    qpts: [nq, dim].  Returns (N [nq, nsh], dN [nq, nsh, dim]) with local
    dof (i0, i1, ...) flattened x-fastest: loc = i0 + (p+1)*i1 + ...
    """
    nodes = gauss_lobatto_points(p)
    n1 = len(nodes)
    nsh = n1**dim
    nq = qpts.shape[0]
    V = []
    D = []
    for d in range(dim):
        v, dv = lagrange_1d(nodes, qpts[:, d])
        V.append(v)
        D.append(dv)
    N = np.ones((nq, nsh))
    dN = np.ones((nq, nsh, dim))
    for loc in range(nsh):
        idx = [(loc // n1**d) % n1 for d in range(dim)]
        for d in range(dim):
            N[:, loc] *= V[d][:, idx[d]]
            for dd in range(dim):
                dN[:, loc, dd] *= (
                    D[d][:, idx[d]] if dd == d else V[d][:, idx[d]]
                )
    return N, dN


@dataclasses.dataclass
class DofMap:
    """Global DoF enumeration for one ansatz over one mesh."""

    continuous: bool
    degree: int
    n_dofs: int
    n_loc: int
    cell_dofs: np.ndarray  # [nc, n_loc] int64, lexicographic local order
    positions: np.ndarray  # [n_dofs, dim]
    # boundary faces in dof numbering: [nf, p+1] (2D) / [nf] object (1D);
    # for dG, boundary faces reference the adjacent cell's face dofs.
    face_dofs: np.ndarray


def _q1_geometry_map(mesh: Mesh, unit_pts: np.ndarray) -> np.ndarray:
    """Map unit-cell points [k, dim] into every cell: returns [nc, k, dim]."""
    from .assembly import _shape_q1

    N, _ = _shape_q1(mesh.dim, unit_pts)
    return np.einsum("qs,nsd->nqd", N, mesh.vertices[mesh.cells])


def _local_lattice(dim: int, p: int) -> np.ndarray:
    """Unit-cell lexicographic node coordinates [(p+1)^dim, dim]."""
    nodes = gauss_lobatto_points(p)
    if dim == 1:
        return nodes[:, None]
    grids = np.meshgrid(*([nodes] * dim), indexing="ij")
    # x fastest: meshgrid ij gives first axis slowest; stack reversed
    pts = np.stack([g.ravel(order="F") for g in grids], axis=1)
    return pts


def build_dof_map(mesh: Mesh, ansatz: str) -> DofMap:
    continuous, p = parse_ansatz(ansatz)
    dim = mesh.dim
    if dim == 3 and (not continuous or p > 1):
        raise NotImplementedError(
            "higher-order / discontinuous ansatz implemented for 1D and 2D"
        )
    nc = mesh.n_cells
    n1 = p + 1
    n_loc = n1**dim
    unit = _local_lattice(dim, p)

    if not continuous:
        cell_dofs = np.arange(nc * n_loc, dtype=np.int64).reshape(nc, n_loc)
        positions = _q1_geometry_map(mesh, unit).reshape(nc * n_loc, dim)
        face_dofs = _dg_face_dofs(mesh, p, cell_dofs)
        return DofMap(False, p, nc * n_loc, n_loc, cell_dofs, positions,
                      face_dofs)

    # --- continuous -------------------------------------------------------
    if p == 1:
        cell_dofs = mesh.cells.copy()
        face_dofs = mesh.boundary_faces.copy()
        return DofMap(True, 1, mesh.n_vertices, n_loc, cell_dofs,
                      mesh.vertices.copy(), face_dofs)

    nv = mesh.n_vertices
    gl = gauss_lobatto_points(p)
    t_int = gl[1:-1]  # (p-1) interior parameters

    if dim == 1:
        cells = mesh.cells
        n_int = p - 1
        cell_dofs = np.zeros((nc, n1), np.int64)
        cell_dofs[:, 0] = cells[:, 0]
        cell_dofs[:, -1] = cells[:, 1]
        interior = nv + np.arange(nc * n_int).reshape(nc, n_int)
        cell_dofs[:, 1:-1] = interior
        xa = mesh.vertices[cells[:, 0]]
        xb = mesh.vertices[cells[:, 1]]
        pos_int = (
            xa[:, None, :] * (1 - t_int)[None, :, None]
            + xb[:, None, :] * t_int[None, :, None]
        ).reshape(-1, 1)
        positions = np.concatenate([mesh.vertices, pos_int], axis=0)
        return DofMap(True, p, len(positions), n_loc, cell_dofs, positions,
                      mesh.boundary_faces.copy())

    # dim == 2
    cells = mesh.cells
    edge_local = np.array([[0, 1], [2, 3], [0, 2], [1, 3]])
    ce = cells[:, edge_local]  # [nc, 4, 2]
    ce_sorted = np.sort(ce, axis=2)
    flat = ce_sorted.reshape(-1, 2)
    uniq, inv = np.unique(flat, axis=0, return_inverse=True)
    n_edges = len(uniq)
    n_int_e = p - 1
    edge_dof0 = nv + np.arange(n_edges, dtype=np.int64) * n_int_e
    n_int_c = (p - 1) ** 2
    cell_dof0 = nv + n_edges * n_int_e + np.arange(nc, dtype=np.int64) * n_int_c

    cell_dofs = np.zeros((nc, n_loc), np.int64)
    # corners (lexicographic (0,0),(p,0),(0,p),(p,p) = deal.II v0,v1,v2,v3):
    cell_dofs[:, 0] = cells[:, 0]
    cell_dofs[:, p] = cells[:, 1]
    cell_dofs[:, p * n1] = cells[:, 2]
    cell_dofs[:, p * n1 + p] = cells[:, 3]

    edge_ids = inv.reshape(nc, 4)
    # orientation: edge dofs run from the lower to the higher vertex id;
    # flip the local slot order when the cell traverses the edge backwards.
    for e_loc, (la, lb) in enumerate(edge_local):
        va, vb = cells[:, la], cells[:, lb]
        forward = va < vb
        base = edge_dof0[edge_ids[:, e_loc]]
        for k in range(n_int_e):
            k_eff = np.where(forward, k, n_int_e - 1 - k)
            dof = base + k_eff
            if e_loc == 0:  # bottom: (k+1, 0)
                slot = (k + 1)
            elif e_loc == 1:  # top: (k+1, p)
                slot = p * n1 + (k + 1)
            elif e_loc == 2:  # left: (0, k+1)
                slot = (k + 1) * n1
            else:  # right: (p, k+1)
                slot = (k + 1) * n1 + p
            cell_dofs[:, slot] = dof
    # interior
    for jy in range(1, p):
        for jx in range(1, p):
            slot = jy * n1 + jx
            cell_dofs[:, slot] = cell_dof0 + (jy - 1) * (p - 1) + (jx - 1)

    # positions: vertices, edge interiors, cell interiors
    ea = mesh.vertices[uniq[:, 0]]
    eb = mesh.vertices[uniq[:, 1]]
    pos_e = (
        ea[:, None, :] * (1 - t_int)[None, :, None]
        + eb[:, None, :] * t_int[None, :, None]
    ).reshape(-1, dim)
    # order must match the interior slot loop above ((jy, jx), jx fastest):
    int_unit = np.stack(
        [np.tile(t_int, p - 1), np.repeat(t_int, p - 1)], axis=1
    )
    pos_c = _q1_geometry_map(mesh, int_unit).reshape(-1, dim)
    positions = np.concatenate([mesh.vertices, pos_e, pos_c], axis=0)

    # boundary faces -> dof lists [nf, p+1], ordered v0, edge dofs..., v1
    bf = mesh.boundary_faces
    bf_sorted = np.sort(bf, axis=1)
    pos_in_uniq = np.searchsorted(
        uniq[:, 0] * (nv + 1) + uniq[:, 1],
        bf_sorted[:, 0] * (nv + 1) + bf_sorted[:, 1],
    )
    face_dofs = np.zeros((len(bf), n1), np.int64)
    face_dofs[:, 0] = bf[:, 0]
    face_dofs[:, -1] = bf[:, 1]
    fwd = bf[:, 0] < bf[:, 1]
    base = edge_dof0[pos_in_uniq]
    for k in range(n_int_e):
        k_eff = np.where(fwd, k, n_int_e - 1 - k)
        face_dofs[:, k + 1] = base + k_eff
    return DofMap(True, p, len(positions), n_loc, cell_dofs, positions,
                  face_dofs)


# local face -> lexicographic slots on the face, in face-tangential order;
# 2D faces ordered (-x, +x, -y, +y) like mesh._FACE_VERTICES
def face_slots(dim: int, p: int):
    n1 = p + 1
    if dim == 1:
        return [np.array([0]), np.array([p])]
    return [
        np.arange(n1) * n1,            # -x: (0, j)
        np.arange(n1) * n1 + p,        # +x: (p, j)
        np.arange(n1),                 # -y: (i, 0)
        p * n1 + np.arange(n1),        # +y: (i, p)
    ]


def _dg_face_dofs(mesh: Mesh, p: int, cell_dofs: np.ndarray) -> np.ndarray:
    """Boundary-face dofs for the discontinuous ansatz.

    Matches boundary faces to (cell, local face) by vertex sets and returns
    the face-local dof ids [nf, p+1] (2D) / [nf, 1] (1D).
    """
    from .mesh import _FACE_VERTICES

    dim = mesh.dim
    nv = mesh.n_vertices
    slots = face_slots(dim, p)
    fv = _FACE_VERTICES[dim]
    out = np.zeros((len(mesh.boundary_faces), p + 1 if dim == 2 else 1),
                   np.int64)
    # build map sorted-face-vertices -> (cell, local face)
    table = {}
    for f_loc, lv in enumerate(fv):
        for c in range(mesh.n_cells):
            key = tuple(sorted(mesh.cells[c, lv].tolist()))
            table[key] = (c, f_loc)
    for k, bfv in enumerate(mesh.boundary_faces):
        key = tuple(sorted(bfv.tolist()))
        c, f_loc = table[key]
        out[k] = cell_dofs[c, slots[f_loc]]
    del nv
    return out
