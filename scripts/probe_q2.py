"""Throughput probe: 2D Euler Mach-3 step with a higher-order / dG
ansatz on the canvas fast path.

VERDICT r4 item 1: cG Q2/Q3 and dG Q0-Q3 previously fell off the canvas
gate (driver required cG Q1) onto the ~1.8 MQ/s ELL path; the node
lattice (offline/assembly._node_lattice) + reach-p offsets put them on
the same fused kernels the reference's single SIMD loop gives every
ansatz (hyperbolic_module.template.h:417-420).

Usage: ANSATZ="cG Q2" R=2 STEPS=20 WARMUP=1000 python scripts/probe_q2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
import jax.numpy as jnp
import numpy as np

from ryujin_tpu.equations.euler import Euler
from ryujin_tpu.equations.euler_initial_states import make_initial_state
from ryujin_tpu.offline import assembly, geometry, structured
from ryujin_tpu.postprocess.error import interpolate_nodal
from ryujin_tpu.solver.hyperbolic import HyperbolicModule
from ryujin_tpu.solver.integrator import TimeIntegrator

from _probe_cache import cached

ANSATZ = os.environ.get("ANSATZ", "cG Q2")
R = int(os.environ.get("R", "2"))
STEPS = int(os.environ.get("STEPS", "20"))
# developed-flow discipline (bench.py): the bow shock spans the domain
# before timing, so the limiter Newton runs everywhere
WARMUP = int(os.environ.get("WARMUP", "1000"))
REPS = int(os.environ.get("REPS", "3"))


def build():
    mesh = geometry.step(refinement=R)
    data = assembly.assemble(mesh, ansatz=ANSATZ)
    packed = structured.pack_structured(data, mesh)
    return data, packed  # the mesh holds manifold closures (unpicklable)


def main():
    dtype = jnp.float32
    eq = Euler(dim=2)
    data, packed = cached(f"q2step-{ANSATZ.replace(' ', '')}-R{R}", build)
    print(
        f"{ANSATZ} R={R}: n={packed.n_nodes} n_pad={packed.n_pad} "
        f"K={packed.max_degree} canvas={packed.shape} "
        f"pad_ratio={packed.n_pad / packed.n_nodes:.3f}",
        flush=True,
    )
    init = make_initial_state(eq, "uniform", primitive_state=(1.4, 3.0, 1.0))
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    hm = HyperbolicModule(eq, packed, init, dtype=dtype, backend=backend)
    ti = TimeIntegrator(hm, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
                        cfl_recovery_strategy="none")
    U = interpolate_nodal(init, packed, eq, 0.0, dtype)
    t0c = time.perf_counter()
    # chunked warmup: very long single device-resident bursts (minutes)
    # can trip the axon tunnel on big meshes
    t = 0.0
    left = max(WARMUP, 2)
    while left > 0:
        n = min(left, 200)
        U, _, t, _, _, _ = ti.advance(U, float(t), n_steps=n)
        float(t)
        left -= n
    print(f"warmup+compile {time.perf_counter() - t0c:.1f} s, "
          f"t={float(t):.4f}", flush=True)
    Uh = np.asarray(U[0])
    live = Uh[np.asarray(packed.node_mask) > 0]
    print(f"rho range {live.min():.3f} .. {live.max():.3f}", flush=True)

    for _ in range(REPS):
        t0 = time.perf_counter()
        out = ti.advance(U, t, n_steps=STEPS)
        float(out[2])
        wall = time.perf_counter() - t0
        mqs = packed.n_nodes * STEPS * 3 / wall / 1e6
        print(f"{mqs:8.2f} MQ/s  ({wall * 1e3 / (STEPS * 3):.3f} ms/substep)",
              flush=True)


if __name__ == "__main__":
    main()
