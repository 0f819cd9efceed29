"""Hardware check for the Mosaic-compiled Pallas kernels.

The test suite validates the kernels in interpreter mode on CPU
(tests/test_pallas.py); divergences that only exist on hardware
(uninitialized-margin handling, out-of-bounds VMEM slices, DMA races in
the sliding-stripe windows) would ship silently.  This script runs the
same 2D and 3D comparisons on the real chip:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/test_pallas_hardware.py

Exit code 0 = pass.  (Must run outside pytest: tests/conftest.py pins the
CPU platform for the suite.)
"""

import sys


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
    from ryujin_tpu.postprocess.error import interpolate_nodal
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule
    from ryujin_tpu.solver.integrator import TimeIntegrator

    failures = 0

    def compare(tag, mesh, eq, init, bump_center=None, steps=3,
                bathymetry=None):
        nonlocal failures
        data = assembly.assemble(mesh)
        packed = structured.pack_structured(data, mesh)
        ip = None
        if bathymetry is not None:
            pos = jnp.asarray(packed.positions.T, jnp.float32)
            ip = bathymetry(pos)[None]
        res = {}
        for be in ("xla", "pallas"):
            hm = HyperbolicModule(
                eq, packed, init, dtype=jnp.float32, backend=be,
                initial_precomputed=ip,
            )
            ti = TimeIntegrator(hm, "erk 33", cfl_min=0.3, cfl_max=0.3,
                                cfl_recovery_strategy="none")
            U = interpolate_nodal(init, packed, eq, 0.0, jnp.float32)
            if bump_center is not None:
                pos = jnp.asarray(packed.positions.T, jnp.float32)
                c = jnp.asarray(bump_center, jnp.float32)[:, None]
                bump = 1.0 + 0.3 * jnp.exp(
                    -20.0 * jnp.sum((pos - c) ** 2, axis=0)
                )
                U = U.at[0].mul(bump)
                U = U.at[eq.n_comp - 1].mul(bump)
            out = ti.advance(U, 0.0, steps)
            tau = float(out[3])
            res[be] = (np.asarray(out[0]), tau)
        real = np.asarray(packed.node_mask) > 0
        d = np.abs(res["xla"][0][:, real] - res["pallas"][0][:, real]).max()
        dt = abs(res["xla"][1] / res["pallas"][1] - 1.0)
        ok = (
            np.isfinite(res["pallas"][0][:, real]).all()
            and d < 2e-4
            and dt < 1e-4
        )
        print(f"{tag}: maxdiff {d:.2e}  tau rel {dt:.2e}  "
              f"{'PASS' if ok else 'FAIL'}", flush=True)
        failures += 0 if ok else 1

    # 2D Mach-3 step (the production config):
    compare(
        "2d step",
        geometry.step(refinement=1),
        Euler(dim=2),
        make_initial_state(
            Euler(dim=2), "uniform", primitive_state=(1.4, 3.0, 1.0)
        ),
        bump_center=(1.0, 0.5),
    )
    # 2D fully periodic vortex (ghost bands).  refinement 7 -> period
    # 128 (lane-aligned exact width, the wrap IS the identification):
    compare(
        "2d periodic",
        geometry.rectangular_domain(
            [-5, -5], [5, 5], [1, 1], refinement=7,
            boundary_conditions=[Boundary.periodic] * 4,
        ),
        Euler(dim=2),
        make_initial_state(
            Euler(dim=2), "isentropic vortex", direction=[1, 1],
            position=[0, 0],
        ),
    )
    # 2D fully periodic vortex at a NON-lane-aligned period (refinement 6
    # -> period 64): the minor axis is padded to 128 with the two
    # minor_wrap ghost columns (offline/structured.py), so the compiled
    # kernels stay available instead of bouncing to the XLA fallback:
    compare(
        "2d periodic unaligned (minor_wrap)",
        geometry.rectangular_domain(
            [-5, -5], [5, 5], [1, 1], refinement=6,
            boundary_conditions=[Boundary.periodic] * 4,
        ),
        Euler(dim=2),
        make_initial_state(
            Euler(dim=2), "isentropic vortex", direction=[1, 1],
            position=[0, 0],
        ),
    )
    # 3D box (z-slab windows):
    compare(
        "3d box",
        geometry.rectangular_domain(
            [0, 0, 0], [1, 1, 1], [1, 1, 1], 3,
            [Boundary.dirichlet] * 6, dim=3,
        ),
        Euler(dim=3),
        make_initial_state(
            Euler(dim=3), "uniform",
            primitive_state=(1.4, 1.0, 0.2, 0.1, 1.0),
        ),
        bump_center=(0.5, 0.5, 0.5),
    )
    # 2D shallow water w/ bathymetry + Manning friction: exercises the
    # initial-precomputed and m_ij kernel windows (sources, equilibrated
    # states, affine shift) under Mosaic:
    from ryujin_tpu.equations import shallow_water_initial_states as sw
    from ryujin_tpu.equations.shallow_water import (
        ShallowWater, ShallowWaterParams,
    )

    sw_eq = ShallowWater(dim=2, params=ShallowWaterParams(
        gravity=9.81, manning_friction_coefficient=0.02,
    ))
    sw_init = sw.make_initial_state(sw_eq, "circular dam break")
    compare(
        "2d shallow water",
        geometry.rectangular_domain(
            [-5, -5], [5, 5], [1, 1], refinement=5,
            boundary_conditions=[Boundary.do_nothing] * 4,
        ),
        sw_eq,
        sw_init.state,
        bathymetry=sw_init.bathymetry,
    )
    print("hardware pallas:", "PASS" if failures == 0 else "FAIL")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
