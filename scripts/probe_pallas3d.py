"""TPU throughput probe for the 3D Pallas path.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/probe_pallas3d.py &

Builds a 3D rectangular lattice (the Mach-3 box analog of the reference's
euler-mach3-cylinder-3d.prm benchmark scale), runs the fused Pallas kernels
and reports MQ/s.
"""

import json
import os
import sys
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp
    import numpy as np

    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.equations.euler_initial_states import make_initial_state
    from ryujin_tpu.offline import assembly, geometry, structured
    from ryujin_tpu.offline.mesh import Boundary
    from ryujin_tpu.postprocess.error import interpolate_nodal
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule
    from ryujin_tpu.solver.integrator import TimeIntegrator

    subdiv = json.loads(os.environ.get("SUBDIV", "[31, 16, 16]"))
    refinement = int(os.environ.get("R", "2"))
    n_steps = int(os.environ.get("STEPS", "10"))
    backend = os.environ.get("BE", "pallas")
    dtype = jnp.float32

    eq = Euler(dim=3)
    t0 = time.perf_counter()
    from ryujin_tpu.solver.pallas_step import pallas_default_margin

    eqm = pallas_default_margin(eq, 3)  # (TD, 2) for the z-slab kernels
    margin = json.loads(os.environ.get("MARGIN", json.dumps(list(eqm))))
    if isinstance(margin, list):
        margin = tuple(margin)
    padm = int(os.environ.get("PADM", "8"))

    def build():
        mesh = geometry.rectangular_domain(
            [0.0, 0.0, 0.0], [3.0, 1.0, 1.0], subdiv,
            refinement=refinement,
            boundary_conditions=[
                Boundary.dirichlet, Boundary.do_nothing,
                Boundary.slip, Boundary.slip, Boundary.slip, Boundary.slip,
            ],
            dim=3,
        )
        data = assembly.assemble(mesh)
        return structured.pack_structured(
            data, mesh, margin=margin, pad_major=padm
        )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _probe_cache import cached

    packed = cached(
        f"p3d_{'x'.join(map(str, subdiv))}_r{refinement}"
        f"_m{'x'.join(map(str, margin))}_p{padm}", build
    )
    print(
        f"mesh: {packed.n_nodes} nodes, canvas {packed.shape} "
        f"(pad ratio {packed.n_pad / packed.n_nodes:.2f}), "
        f"assembly {time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))
    from ryujin_tpu.solver.hyperbolic import HyperbolicModuleParams

    params = HyperbolicModuleParams(
        limiter_iterations=int(os.environ.get("LIM_IT", "2")),
    )
    hm = HyperbolicModule(eq, packed, init, dtype=dtype, backend=backend,
                          params=params)
    ti = TimeIntegrator(
        hm, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
        cfl_recovery_strategy="none",
    )
    U = interpolate_nodal(init, packed, eq, 0.0, dtype)
    # density/energy bump so the limiter Newton does real work:
    pos = jnp.asarray(packed.positions.T, dtype)
    bump = 1.0 + 0.3 * jnp.exp(
        -20.0 * jnp.sum((pos - jnp.asarray([[1.0], [0.5], [0.5]], dtype)) ** 2,
                        axis=0)
    )
    U = U.at[0].mul(bump)
    U = U.at[4].mul(bump)

    t0 = time.perf_counter()
    U, _, t, tau, _, _ = ti.advance(U, 0.0, n_steps=2)
    print(f"compile+2 steps: {time.perf_counter() - t0:.1f}s "
          f"tau={float(tau):.3e}", flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        out = ti.advance(U, float(t), n_steps=n_steps)
        float(out[2])
        wall = time.perf_counter() - t0
        mqs = packed.n_nodes * n_steps * 3 / wall / 1e6
        print(f"rep {rep}: {wall:.3f}s  {mqs:.1f} MQ/s", flush=True)
    Uh = np.asarray(out[0])
    print("finite:", np.isfinite(Uh).all(), "rho range:",
          Uh[0][np.asarray(packed.node_mask) > 0].min(),
          Uh[0][np.asarray(packed.node_mask) > 0].max(), flush=True)

    # per-kernel DMA traffic + whole-substep HBM roofline fraction
    if backend.startswith("pallas"):
        from ryujin_tpu.solver import pallas_step as _ps

        _ps.TRAFFIC_LOG = log = []
        # fresh function object (a bound method would hit the tracing
        # cache and skip the trace-time traffic accounting):
        compiled = jax.jit(
            lambda *a: ti._advance_impl(*a)
        ).lower(
            hm.stencil, ti._parrays(), out[0], out[2],
            jnp.asarray(jnp.inf, dtype), 1,
        ).compile()
        _ps.TRAFFIC_LOG = None
        kern_dma = sum(b for _, b, _ in log)
        kern_flat = sum(f for _, _, f in log)
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        glue = max(float(cost.get("bytes accessed", 0.0)) - kern_flat, 0.0)
        per_sub = (kern_dma + glue) / 3.0
        by_k = {}
        for name, b, _ in log:
            name = "pk1" if name == "<lambda>" else name
            by_k[name] = by_k.get(name, 0.0) + b / 3.0
        hbm = float(os.environ.get("HBM_GBPS", "819")) * 1e9
        sps = mqs * 1e6 / packed.n_nodes
        print(
            f"HBM GB/substep: {per_sub / 1e9:.3f} "
            f"(kernels { {k: round(v / 1e9, 3) for k, v in sorted(by_k.items())} }, "
            f"glue {glue / 3e9:.3f}); roofline frac at {mqs:.1f} MQ/s: "
            f"{per_sub * sps / hbm:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
