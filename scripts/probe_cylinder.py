"""TPU throughput probe for the Mach-3 cylinder benchmark (O-grid).

The flagship reference benchmark (prm/benchmarks/euler-mach3-cylinder-2d.prm
and -3d.prm) on the logically-structured O-grid channel mesh
(geometry.cylinder_ogrid) — runs the fused Pallas kernels.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/probe_cylinder.py &

Envs: R (refinement, default 7 ~ 1.05M nodes 2D), DIM (2), STEPS (20),
WARMUP (1500, develop the bow shock before timing), BE (pallas).
"""

import json
import os
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp

    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.equations.euler_initial_states import make_initial_state
    from ryujin_tpu.offline import assembly, geometry, structured
    from ryujin_tpu.postprocess.error import interpolate_nodal
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule
    from ryujin_tpu.solver.integrator import TimeIntegrator

    refinement = int(os.environ.get("R", "7"))
    dim = int(os.environ.get("DIM", "2"))
    n_steps = int(os.environ.get("STEPS", "20"))
    warmup = int(os.environ.get("WARMUP", "1500"))
    backend = os.environ.get("BE", "pallas")
    dtype = jnp.float32

    eq = Euler(dim=dim)
    t0 = time.perf_counter()
    mesh = geometry.cylinder(refinement=refinement, dim=dim)
    data = assembly.assemble(mesh)
    from ryujin_tpu.solver.pallas_step import pallas_default_margin

    packed = structured.pack_structured(
        data, mesh, margin=pallas_default_margin(eq, dim)
    )
    print(
        f"mesh: {packed.n_nodes} nodes, canvas {packed.shape} "
        f"(pad ratio {packed.n_pad / packed.n_nodes:.2f}), "
        f"assembly {time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    init = make_initial_state(
        eq, "uniform", direction=[1] + [0] * (dim - 1),
        position=[1] + [0] * (dim - 1),
        primitive_state=[1.4, 3.0, 1.0],
    )
    hm = HyperbolicModule(eq, packed, init, dtype=dtype, backend=backend)
    ti = TimeIntegrator(
        hm, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
        cfl_recovery_strategy="bang bang control",
    )
    U = interpolate_nodal(init, packed, eq, 0.0, dtype)

    t0 = time.perf_counter()
    U, _, t, _, nr_, _ = ti.advance(U, 0.0, n_steps=max(warmup, 2))
    print(
        f"warmup {max(warmup, 2)} steps to t={float(t):.4f} "
        f"({time.perf_counter() - t0:.1f}s, restarts {int(nr_)})",
        flush=True,
    )

    for rep in range(3):
        t0 = time.perf_counter()
        out = ti.advance(U, t, n_steps=n_steps)
        float(out[2])
        wall = time.perf_counter() - t0
        mqs = packed.n_nodes * n_steps * 3 / wall / 1e6
        print(f"rep {rep}: {wall:.3f}s  {mqs:.1f} MQ/s", flush=True)

    import numpy as np

    Uh = np.asarray(out[0])[:, np.asarray(packed.node_mask) > 0]
    print("finite:", np.isfinite(Uh).all(), "rho range:",
          Uh[0].min(), Uh[0].max(), flush=True)
    print(json.dumps({"metric": f"euler{dim}d_mach3_cylinder", "mqs": mqs}))


if __name__ == "__main__":
    main()
