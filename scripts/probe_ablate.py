"""Per-phase cost breakdown of the fused Pallas kernels on hardware.

Builds the flagship mesh, develops the flow with the full stepper, then
re-traces the step with RYUJIN_PK_ABLATE = pk1 / pk2 / pk3 / "" and
times each from the same developed state.  Differences between
successive rows give the cost of each kernel phase (PK1+tau, PK2,
PK3, PK4+PK5).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_ablate.py

Envs: DIM (2), R (3 for 2D / 2 for 3D), STEPS (20), WARMUP (1500 in 2D,
300 in 3D), NOSYM (also run the RYUJIN_NO_SYM=1 variants).
"""

import json
import os
import time


def build(dim, refinement, dtype):
    import jax.numpy as jnp

    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.equations.euler_initial_states import make_initial_state
    from ryujin_tpu.offline import assembly, geometry, structured
    from ryujin_tpu.offline.mesh import Boundary
    from ryujin_tpu.solver.pallas_step import pallas_default_margin

    eq = Euler(dim=dim)
    if dim == 2:
        mesh = geometry.step(refinement=refinement)
    else:
        mesh = geometry.rectangular_domain(
            [0.0, 0.0, 0.0], [3.0, 1.0, 1.0], [31, 16, 16],
            refinement=refinement,
            boundary_conditions=[
                Boundary.dirichlet, Boundary.do_nothing,
                Boundary.slip, Boundary.slip, Boundary.slip, Boundary.slip,
            ],
            dim=3,
        )
    data = assembly.assemble(mesh)
    packed = structured.pack_structured(
        data, mesh, margin=pallas_default_margin(eq, dim)
    )
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))
    return eq, packed, init


def make_ti(eq, packed, init, dtype):
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule
    from ryujin_tpu.solver.integrator import TimeIntegrator

    hm = HyperbolicModule(eq, packed, init, dtype=dtype, backend="pallas")
    return TimeIntegrator(hm, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
                          cfl_recovery_strategy="none")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp

    from ryujin_tpu.postprocess.error import interpolate_nodal

    dim = int(os.environ.get("DIM", "2"))
    refinement = int(os.environ.get("R", "3" if dim == 2 else "2"))
    n_steps = int(os.environ.get("STEPS", "20"))
    warmup = int(os.environ.get("WARMUP", "1500" if dim == 2 else "300"))
    dtype = jnp.float32

    eq, packed, init = build(dim, refinement, dtype)
    print(f"dim {dim} nodes {packed.n_nodes} canvas {packed.shape} "
          f"pad {packed.n_pad / packed.n_nodes:.2f}", flush=True)

    U0 = interpolate_nodal(init, packed, eq, 0.0, dtype)
    ti = make_ti(eq, packed, init, dtype)
    U, _, t, _, _, _ = ti.advance(U0, 0.0, n_steps=warmup)
    t = float(t)
    print(f"developed to t={t:.4f}", flush=True)

    variants = [("pk1",), ("pk2",), ("pk3",), ("",)]
    sym_modes = [None, "1"] if os.environ.get("NOSYM") else [None]
    rows = []
    for nosym in sym_modes:
        if nosym is None:
            os.environ.pop("RYUJIN_NO_SYM", None)
        else:
            os.environ["RYUJIN_NO_SYM"] = nosym
        for (abl,) in variants:
            if abl:
                os.environ["RYUJIN_PK_ABLATE"] = abl
            else:
                os.environ.pop("RYUJIN_PK_ABLATE", None)
            ti_v = make_ti(eq, packed, init, dtype)
            out = ti_v.advance(U, t, n_steps=2)  # compile + warm
            float(out[2])
            t0 = time.perf_counter()
            out = ti_v.advance(U, t, n_steps=n_steps)
            float(out[2])
            wall = time.perf_counter() - t0
            mqs = packed.n_nodes * n_steps * 3 / wall / 1e6
            ms = wall / (n_steps * 3) * 1e3
            tag = ("nosym " if nosym else "") + (abl or "full")
            rows.append((tag, ms, mqs))
            print(f"{tag:12s} {ms:8.3f} ms/substep  {mqs:8.1f} MQ/s",
                  flush=True)
    # phase deltas:
    base = dict((r[0], r[1]) for r in rows if not r[0].startswith("nosym"))
    if all(k in base for k in ("pk1", "pk2", "pk3", "full")):
        print(json.dumps({
            "pk1_tau_ms": round(base["pk1"], 3),
            "pk2_ms": round(base["pk2"] - base["pk1"], 3),
            "pk3_ms": round(base["pk3"] - base["pk2"], 3),
            "pk45_ms": round(base["full"] - base["pk3"], 3),
            "full_ms": round(base["full"], 3),
        }))


if __name__ == "__main__":
    main()
