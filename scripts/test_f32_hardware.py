"""f32 end-to-end verification on the REAL chip (Mosaic-compiled kernels).

The test suite verifies physics in float64 on CPU; the production hot
path is float32 Pallas on TPU.  The reference ships float baselines
precisely so the f32 plateau can be checked
(prm/verification/euler-isentropic_vortex-erk33.baseline:33-50); this
script runs full verification problems on the chip in f32 and asserts
against them:

  1. Euler 2D isentropic vortex, ERK(3,3), CFL 0.2, t=2.0 — levels
     5/6/7 vs the reference's committed FLOAT baselines (the l7 value,
     L1 = 2.876e-5, IS the float plateau: double reaches 6.54e-6).
     f32 rounding differs across machines/ISAs (the reference commits
     per-SIMD-ISA test outputs for the same reason), so the acceptance
     band is L1 within 1.3x of the reference float value.
  2. Shallow water 2D smooth vortex, ERK(3,3), CFL 0.25, t=2.0, level 6
     vs the committed DOUBLE baseline (no float section exists; at 4225
     dofs the discretization error (6.28e-4) dwarfs f32 rounding, so a
     5% band on the double value is a sound f32 acceptance bar).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/test_f32_hardware.py

Exit code 0 = pass.  Results recorded in PARITY.md §5.
"""

import sys
import time


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        return 0

    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.equations.euler_initial_states import make_initial_state
    from ryujin_tpu.offline import assembly, geometry, structured
    from ryujin_tpu.offline.mesh import Boundary
    from ryujin_tpu.postprocess.error import compute_error, interpolate_nodal
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule
    from ryujin_tpu.solver.integrator import TimeIntegrator

    failures = 0

    def run(eq, init, mesh, cfl, t_final, components, bathymetry=None):
        data = assembly.assemble(mesh)
        packed = structured.pack_structured(data, mesh)
        ip = None
        if bathymetry is not None:
            pos = jnp.asarray(packed.positions.T, jnp.float32)
            ip = bathymetry(pos)[None]
        hm = HyperbolicModule(eq, packed, init, dtype=jnp.float32,
                              backend="pallas", initial_precomputed=ip)
        ti = TimeIntegrator(hm, "erk 33", cfl_min=cfl, cfl_max=cfl,
                            cfl_recovery_strategy="none")
        U = interpolate_nodal(init, packed, eq, 0.0, jnp.float32)
        t = 0.0
        t0 = time.perf_counter()
        # device-resident chunks; the final partial steps run one by one
        while t < t_final - 1e-6:
            U, _, t_j, _, _, _ = ti.advance(
                U, t, n_steps=200, t_final=t_final
            )
            t = float(t_j)
        Up, _ = hm.prepare_state_vector(U, t)
        err = compute_error(eq, mesh, packed, np.asarray(Up), t, init,
                            components=list(components))
        return err, time.perf_counter() - t0

    # -- Euler isentropic vortex vs the committed FLOAT baselines --------
    # (Linf, L1, L2) per refinement, keyed so that refinement 6 = 4225
    # dofs like the reference's first baseline row
    # (euler-isentropic_vortex-erk33.baseline:33-50); refinement 8
    # (66049 dofs) is the float plateau (double reaches L1 6.54e-6)
    ref_float = {
        6: (5.4715e-3, 4.03722e-4, 9.44413e-4),
        7: (6.57314e-4, 5.98743e-5, 1.18905e-4),
        8: (1.63494e-4, 2.87595e-5, 3.67441e-5),  # the f32 plateau
    }
    eq = Euler(dim=2)
    init = make_initial_state(
        eq, "isentropic vortex", direction=[1, 1], position=[-1, -1],
        mach_number=1.0, beta=5.0,
    )
    for level, (ri, r1, r2) in sorted(ref_float.items()):
        mesh = geometry.rectangular_domain(
            [-5, -5], [5, 5], [1, 1], refinement=level,
            boundary_conditions=[Boundary.dirichlet] * 4,
        )
        (linf, l1, l2), wall = run(eq, init, mesh, 0.2, 2.0,
                                   ("rho", "m_1", "m_2", "E"))
        ok = l1 < 1.3 * r1 and linf < 1.5 * ri and l2 < 1.3 * r2
        print(f"vortex f32 l{level}: Linf {linf:.4e} (ref {ri:.4e})  "
              f"L1 {l1:.4e} (ref {r1:.4e})  L2 {l2:.4e} (ref {r2:.4e})  "
              f"[{wall:.0f}s]  {'PASS' if ok else 'FAIL'}", flush=True)
        failures += 0 if ok else 1

    # -- Shallow water smooth vortex vs the double baseline --------------
    from ryujin_tpu.equations import shallow_water_initial_states as sws
    from ryujin_tpu.equations.shallow_water import (
        ShallowWater, ShallowWaterParams,
    )

    sw = ShallowWater(dim=2, params=ShallowWaterParams(gravity=9.81))
    sw_init = sws.make_initial_state(
        sw, "smooth vortex", direction=[1.0, 1.0], position=[-1.0, -1.0],
        reference_depth=2.0, mach_number=1.0, beta=2.0,
    )
    mesh = geometry.rectangular_domain(
        [-6, -6], [6, 6], [1, 1], refinement=6,
        boundary_conditions=[Boundary.dirichlet] * 4,
    )
    (linf, l1, l2), wall = run(sw, sw_init.state, mesh, 0.25, 2.0,
                               ("h", "q_1", "q_2"),
                               bathymetry=sw_init.bathymetry)
    ok = abs(l1 / 6.27538e-4 - 1.0) < 0.05
    print(f"sw smooth vortex f32 l6: L1 {l1:.4e} (ref double 6.2754e-4)  "
          f"[{wall:.0f}s]  {'PASS' if ok else 'FAIL'}", flush=True)
    failures += 0 if ok else 1

    print(f"f32 hardware verification: "
          f"{'PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
