"""Time-series statistics of quantities of interest on manifolds.

TPU-native analog of /root/reference/source/quantities.template.h: the
reference accumulates space-averaged (and time-averaged) primitive
quantities over interior/boundary manifolds defined by muparser level-set
expressions; here manifolds are configured as python expressions over the
nodal coordinates, nodes with expression >= 0 belong to the manifold, and
per-tick lumped-mass weighted averages are appended to
`<basename>-<manifold>.dat`.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..config import QuantitiesConfig


class Quantities:
    def __init__(self, eq, packed, cfg: QuantitiesConfig, basename: str):
        self.eq = eq
        self.packed = packed
        self.basename = basename
        self.manifolds: List = []
        pos = packed.positions  # [n, dim]
        mask = packed.node_mask > 0
        names = {"x": pos[:, 0]}
        if pos.shape[1] >= 2:
            names["y"] = pos[:, 1]
        if pos.shape[1] >= 3:
            names["z"] = pos[:, 2]
        env = {"__builtins__": {}, "np": np}
        env.update(
            {k: getattr(np, k) for k in (
                "sin", "cos", "exp", "sqrt", "abs", "minimum", "maximum", "pi",
            )}
        )
        for name, expr in cfg.manifolds:
            sel = np.asarray(
                eval(expr, dict(env), dict(names)) >= 0  # noqa: S307 (config)
            ) & mask
            weights = packed.lumped_mass * sel
            total = weights.sum()
            if total <= 0:
                raise ValueError(f"manifold '{name}' selects no nodes")
            self.manifolds.append((name, weights / total))
            # truncate any previous series:
            open(self._fname(name), "w").write(
                "# t " + " ".join(eq.component_names) + "\n"
            )

    def _fname(self, name):
        return f"{self.basename}-{name}.dat"

    def accumulate(self, U, t: float) -> None:
        if not self.manifolds:
            return
        U_np = np.asarray(U)
        for name, w in self.manifolds:
            means = U_np @ w  # [C]
            with open(self._fname(name), "a") as f:
                f.write(
                    f"{t:.10e} " + " ".join(f"{v:.10e}" for v in means) + "\n"
                )
