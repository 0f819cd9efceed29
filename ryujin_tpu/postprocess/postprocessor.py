"""Nodal schlieren and vorticity postprocessor.

Re-implements /root/reference/source/postprocessor.template.h:108-281:
per selected (conserved or primitive) quantity q, compute the lumped-mass
scaled nodal gradient  grad q_i = -(1/m_i) sum_j c_ij q_j  (including the
diagonal), take |grad q| (schlieren) or the curl (vorticity), then
normalize on an exponential scale 1 - exp(-beta (|v|-min)/(max-min)) with
the sign preserved.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Postprocessor:
    """Computes schlieren/vorticity fields on the packed node set."""

    eq: object
    stencil: object  # Stencil or StructuredStencil (XLA path)
    schlieren_beta: float = 10.0
    schlieren_quantities: Sequence[str] = ()
    vorticity_quantities: Sequence[str] = ()
    recompute_bounds: bool = True

    def __post_init__(self):
        if not self.schlieren_quantities:
            self.schlieren_quantities = (self.eq.component_names[0],)
        self._bounds = None
        self._indices = []
        self.component_names = []
        for pre, quantities in (
            ("schlieren_", self.schlieren_quantities),
            ("vorticity_", self.vorticity_quantities),
        ):
            for name in quantities:
                if name in self.eq.component_names:
                    idx = (False, self.eq.component_names.index(name))
                elif name in self.eq.primitive_component_names:
                    idx = (True, self.eq.primitive_component_names.index(name))
                else:
                    raise ValueError(f"invalid component name '{name}'")
                self._indices.append((pre, idx))
                self.component_names.append(pre + name)

    def _nodal_gradient(self, q):
        """grad q_i = -(1/m_i) (sum_j c_ij q_j + c_ii q_i); [dim, n]."""
        st = self.stencil
        q_j = st.nbr(q)  # [K, n]
        s = jnp.sum(st.cij * (q_j * st.mask)[None], axis=1) + st.cii * q[None]
        return -s * st.m_lumped_inv[None]

    def compute(self, U) -> np.ndarray:
        """Returns [n_quantities, n] normalized fields (numpy)."""
        prim = self.eq.to_primitive_state(U)
        fields = []
        for pre, (is_prim, index) in self._indices:
            src = prim if is_prim else U
            if pre == "schlieren_":
                g = self._nodal_gradient(src[index])
                v = jnp.sqrt(jnp.sum(g * g, axis=0))
            else:
                dim = self.eq.dim
                if dim == 2:
                    # curl_z = d(q_y)/dx - d(q_x)/dy
                    gx = self._nodal_gradient(src[index])
                    gy = self._nodal_gradient(src[index + 1])
                    v = gy[0] - gx[1]
                elif dim == 3:
                    g = [
                        self._nodal_gradient(src[index + d]) for d in range(3)
                    ]
                    cx = g[2][1] - g[1][2]
                    cy = g[0][2] - g[2][0]
                    cz = g[1][0] - g[0][1]
                    v = jnp.sqrt(cx * cx + cy * cy + cz * cz)
                else:
                    raise ValueError("vorticity requires dim >= 2")
            fields.append(np.asarray(v))

        # exponential normalization (postprocessor.template.h:252-268)
        mask = np.asarray(self.stencil.node_mask) > 0
        if self.recompute_bounds or self._bounds is None:
            self._bounds = [
                (float(np.abs(f[mask]).max(initial=0.0)),
                 float(np.abs(f[mask]).min(initial=np.inf)))
                for f in fields
            ]
        out = []
        eps = np.finfo(fields[0].dtype).eps if fields else 0.0
        floor = max(1.0e-10, float(eps))
        for f, (q_max, q_min) in zip(fields, self._bounds):
            ratio = np.maximum(0.0, np.abs(f) - q_min - floor) / max(
                q_max - q_min, float(eps)
            )
            magnitude = 1.0 - np.exp(-self.schlieren_beta * ratio)
            out.append(np.copysign(magnitude, f))
        return np.stack(out, axis=0) if out else np.zeros((0, U.shape[-1]))
