#!/usr/bin/env python
"""Convergence-rate tables from a sweep of mesh refinements.

The analog of the reference's scripts/create_convergence_tables: run the
same YAML configuration at a range of refinement levels (with error
computation enabled), collect the normalized Linf/L1/L2 errors, and print
a table with observed convergence rates.

Example:
    python scripts/create_convergence_tables.py --file vortex.yaml \
        --initial 3 --final 6
"""

from __future__ import annotations

import argparse
import math
import sys


def main() -> int:
    parser = argparse.ArgumentParser(prog="create_convergence_tables")
    parser.add_argument("--file", required=True, help="YAML configuration")
    parser.add_argument("--initial", type=int, default=3,
                        help="initial mesh refinement")
    parser.add_argument("--final", type=int, default=6,
                        help="final mesh refinement (inclusive)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (float64)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from ryujin_tpu.config import Config
    from ryujin_tpu.driver import TimeLoop

    rows = []
    for ref in range(args.initial, args.final + 1):
        cfg = Config.load(args.file)
        cfg.time_loop.enable_compute_error = True
        cfg.time_loop.enable_output_full = False
        cfg.discretization.mesh_refinement = ref
        loop = TimeLoop(cfg)
        result = loop.run(quiet=True)
        rows.append((ref, loop.packed.n_nodes,
                     result["Linf"], result["L1"], result["L2"]))
        print(f"  refinement {ref}: dofs={rows[-1][1]} "
              f"L1={rows[-1][3]:.6e}", file=sys.stderr)

    header = (f"{'ref':>4} {'dofs':>10} "
              f"{'Linf':>13} {'rate':>6} "
              f"{'L1':>13} {'rate':>6} "
              f"{'L2':>13} {'rate':>6}")
    print(header)
    print("-" * len(header))
    prev = None
    for ref, dofs, linf, l1, l2 in rows:
        rates = ["     -"] * 3
        if prev is not None:
            # rate with respect to dof growth (h ~ dofs^(-1/dim)):
            dim = Config.load(args.file).equation.dimension
            h_ratio = (dofs / prev[1]) ** (1.0 / dim)
            rates = [
                f"{math.log(prev[k] / v) / math.log(h_ratio):6.2f}"
                if v > 0 else "   inf"
                for k, v in ((2, linf), (3, l1), (4, l2))
            ]
        print(f"{ref:>4} {dofs:>10} "
              f"{linf:>13.6e} {rates[0]} "
              f"{l1:>13.6e} {rates[1]} "
              f"{l2:>13.6e} {rates[2]}")
        prev = (ref, dofs, linf, l1, l2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
