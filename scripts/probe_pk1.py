"""PK1-internal cost breakdown on hardware (3D z-slab kernels).

PK1 + the tau reduction dominate the 3D substep (probe_ablate: ~15 of
22 ms).  This probe splits that 15 ms with the RYUJIN_PK1_ABLATE /
RYUJIN_TAU_ABLATE measurement aids:

  notau    PK1 kernel alone (d/tau XLA fusion skipped)
  empty    windows DMA'd, zero compute       -> DMA + launch overhead
  center   center reads only                 -> + window slicing
  riemann  trivial bound instead of the two-rarefaction solve
  noind    indicator (EVC) skipped
  full     everything (== probe_ablate's pk1 row)

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pk1.py

Envs: DIM (3), R, STEPS (20), WARMUP (100).
"""

import json
import os
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp

    from probe_ablate import build, make_ti
    from ryujin_tpu.postprocess.error import interpolate_nodal

    dim = int(os.environ.get("DIM", "3"))
    refinement = int(os.environ.get("R", "3" if dim == 2 else "2"))
    n_steps = int(os.environ.get("STEPS", "20"))
    warmup = int(os.environ.get("WARMUP", "100"))
    dtype = jnp.float32

    eq, packed, init = build(dim, refinement, dtype)
    print(f"dim {dim} nodes {packed.n_nodes} canvas {packed.shape} "
          f"pad {packed.n_pad / packed.n_nodes:.2f}", flush=True)

    U0 = interpolate_nodal(init, packed, eq, 0.0, dtype)
    ti = make_ti(eq, packed, init, dtype)
    U, _, t, _, _, _ = ti.advance(U0, 0.0, n_steps=warmup)
    t = float(t)
    print(f"developed to t={t:.4f}", flush=True)

    os.environ["RYUJIN_PK_ABLATE"] = "pk1"
    variants = [
        ("notau", {"RYUJIN_TAU_ABLATE": "1"}),
        ("empty", {"RYUJIN_PK1_ABLATE": "empty", "RYUJIN_TAU_ABLATE": "1"}),
        ("center", {"RYUJIN_PK1_ABLATE": "center", "RYUJIN_TAU_ABLATE": "1"}),
        ("riemann", {"RYUJIN_PK1_ABLATE": "riemann",
                     "RYUJIN_TAU_ABLATE": "1"}),
        ("noind", {"RYUJIN_PK1_ABLATE": "noind", "RYUJIN_TAU_ABLATE": "1"}),
        ("full", {}),
    ]
    rows = {}
    for tag, envs in variants:
        for k in ("RYUJIN_PK1_ABLATE", "RYUJIN_TAU_ABLATE"):
            os.environ.pop(k, None)
        os.environ.update(envs)
        ti_v = make_ti(eq, packed, init, dtype)
        out = ti_v.advance(U, t, n_steps=2)  # compile + warm
        float(out[2])
        t0 = time.perf_counter()
        out = ti_v.advance(U, t, n_steps=n_steps)
        float(out[2])
        wall = time.perf_counter() - t0
        ms = wall / (n_steps * 3) * 1e3
        rows[tag] = ms
        print(f"{tag:10s} {ms:8.3f} ms/substep", flush=True)
    print(json.dumps({
        "dma_launch_ms": round(rows["empty"], 3),
        "slicing_ms": round(rows["center"] - rows["empty"], 3),
        "riemann_ms": round(rows["notau"] - rows["riemann"], 3),
        "indicator_ms": round(rows["notau"] - rows["noind"], 3),
        "tau_xla_ms": round(rows["full"] - rows["notau"], 3),
        "pk1_kernel_ms": round(rows["notau"], 3),
        "pk1_tau_ms": round(rows["full"], 3),
    }))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
