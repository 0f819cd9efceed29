"""Slab-canvas overhead on the real chip (multi-chip fast path cost).

The multi-chip production path packs the canvas into n_dev ghost-banded
slabs (pack_structured(slabs=n)) and runs the fused kernels per-device
under shard_map with a slab-axis roll as the halo exchange.  Real
multi-chip hardware is unavailable here; what CAN be measured on one
chip is the cost of the slab *machinery itself* — ghost bands, the
per-kernel refresh rolls, the extra masked rows — by running the same
flagship problem on a plain canvas vs slab canvases (no device mesh;
identical kernels).  Together with the virtual-mesh equality tests
(tests/test_sharding.py) and the HLO collective-permute assertion, this
bounds the single-chip side of the multi-chip story.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_slab.py

Envs: R (2), STEPS (20), WARMUP (300), SLABS ("1,2,4,8").
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

    refinement = int(os.environ.get("R", "2"))
    n_steps = int(os.environ.get("STEPS", "20"))
    warmup = int(os.environ.get("WARMUP", "300"))
    slab_list = [
        int(s) for s in os.environ.get("SLABS", "1,2,4,8").split(",")
    ]
    dtype = jnp.float32

    eq = Euler(dim=2)
    mesh = geometry.step(refinement=refinement)
    data = assembly.assemble(mesh)
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))

    rows = {}
    for slabs in slab_list:
        packed = structured.pack_structured(data, mesh, slabs=slabs)
        hm = HyperbolicModule(eq, packed, init, dtype=dtype,
                              backend="pallas")
        ti = TimeIntegrator(hm, "erk 33", cfl_min=0.45, cfl_max=0.9,
                            cfl_recovery_strategy="none")
        U = interpolate_nodal(init, packed, eq, 0.0, dtype)
        U, _, t, _, _, _ = ti.advance(U, 0.0, n_steps=warmup)
        t = float(t)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            out = ti.advance(U, t, n_steps=n_steps)
            float(out[2])
            wall = time.perf_counter() - t0
            best = max(best, packed.n_nodes * n_steps * 3 / wall / 1e6)
        rows[slabs] = (best, packed.n_pad / packed.n_nodes)
        print(f"slabs {slabs}: {best:6.1f} MQ/s  "
              f"(pad {packed.n_pad / packed.n_nodes:.3f})", flush=True)
    base = rows.get(1, (None,))[0]
    print(json.dumps({
        "metric": "slab_canvas_overhead",
        "mqs": {str(k): round(v[0], 1) for k, v in rows.items()},
        "overhead_vs_plain": {
            str(k): round(1.0 - v[0] / base, 4) for k, v in rows.items()
        } if base else None,
    }))


if __name__ == "__main__":
    main()
