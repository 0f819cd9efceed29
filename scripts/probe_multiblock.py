"""TPU throughput probe for the multi-block canvas fast path.

Runs the fused Pallas kernels on a block-decomposed geometry (default:
the transfinite C-type airfoil, the reference's transonic benchmark
geometry, geometry_airfoil.h) and reports MQ/s.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_multiblock.py

Envs: GEOM (airfoil|disk|annulus), R (refinement), STEPS, WARMUP, BE.
"""

import json
import os
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp
    import numpy as np

    from ryujin_tpu.equations.euler import Euler
    from ryujin_tpu.equations.euler_initial_states import make_initial_state
    from ryujin_tpu.offline import assembly, geometry, multiblock
    from ryujin_tpu.postprocess.error import interpolate_nodal
    from ryujin_tpu.solver.hyperbolic import HyperbolicModule
    from ryujin_tpu.solver.integrator import TimeIntegrator

    geom = os.environ.get("GEOM", "airfoil")
    refinement = int(os.environ.get("R", "5"))
    n_steps = int(os.environ.get("STEPS", "20"))
    warmup = int(os.environ.get("WARMUP", "500"))
    backend = os.environ.get("BE", "pallas")
    dtype = jnp.float32

    dim = 3 if geom == "airfoil3d" else 2
    eq = Euler(dim=dim)
    t0 = time.perf_counter()
    if geom == "airfoil3d":
        init = make_initial_state(
            eq, "uniform", primitive_state=(1.4, 0.85, 0.0, 0.0, 1.0)
        )
    elif geom == "airfoil":
        # subsonic-ish freestream at Mach 0.72 like the reference's
        # transonic setup (airfoil runs use dynamic farfield BCs):
        init = make_initial_state(
            eq, "uniform", primitive_state=(1.4, 0.85, 1.0)
        )
    else:
        init = make_initial_state(
            eq, "uniform", primitive_state=(1.4, 3.0, 1.0)
        )

    def build():
        if geom == "cylblocks":
            # the reference-style cylinder block construction: 6
            # valence-6 extraordinary vertices -> EV side rows
            # (offline/multiblock.py ev_side)
            mesh = geometry.cylinder(refinement=refinement,
                                     variant="blocks")
        elif geom == "amr":
            # locally-refined square with 2:1 hanging-node interfaces:
            # the mesh class that used to fall off the ELL cliff
            from ryujin_tpu.offline.mesh import Boundary, refine_local

            mesh = geometry.rectangular_domain(
                [-5, -5], [5, 5], [1, 1], refinement=refinement,
                boundary_conditions=[Boundary.dirichlet] * 4,
            )
            centers = mesh.vertices[mesh.cells].mean(axis=1)
            mesh, _ = refine_local(
                mesh, (np.abs(centers) < 2.0).all(axis=1)
            )
        elif geom == "airfoil3d":
            # the reference's 3D airfoil: C-mesh x periodic z extrusion
            # (geometry_airfoil.h:1279-1290) on the quilt-x-z canvas
            mesh = geometry.airfoil(refinement=refinement, dim=3)
            data = assembly.assemble(mesh)
            packed = multiblock.pack_multiblock_extruded(data, mesh)
            return packed, -1
        else:
            mesh = getattr(geometry, geom)(refinement=refinement)
        data = assembly.assemble(mesh)
        # decompose + split_sparse_blocks = the driver's production path
        # (passing raw decompose() output skips the guillotine splitter
        # and inflates the airfoil pad ratio 1.21 -> 1.50)
        blocks = multiblock.split_sparse_blocks(multiblock.decompose(mesh))
        packed = multiblock.pack_multiblock(data, mesh, blocks=blocks)
        return packed, len(blocks)

    from _probe_cache import cached

    packed, n_blocks = cached(f"mb_{geom}_r{refinement}", build)
    print(
        f"{geom}: {packed.n_nodes} nodes, {n_blocks} blocks, canvas "
        f"{packed.shape} (pad ratio {packed.n_pad / packed.n_nodes:.2f}), "
        f"build {time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    hm = HyperbolicModule(eq, packed, init, dtype=dtype, backend=backend)
    ti = TimeIntegrator(
        hm, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
        cfl_recovery_strategy="bang bang control",
    )
    U = interpolate_nodal(init, packed, eq, 0.0, dtype)

    t0 = time.perf_counter()
    U, _, t, tau, nr, _ = ti.advance(U, 0.0, n_steps=max(warmup, 2))
    print(
        f"warmup {max(warmup, 2)} steps to t={float(t):.4f} "
        f"({time.perf_counter() - t0:.1f}s, tau={float(tau):.3e}, "
        f"restarts {int(nr)})",
        flush=True,
    )

    if os.environ.get("ABLATE") == "1":
        # per-phase breakdown x sym/nosym (cf. probe_ablate.py)
        for nosym in (None, "1"):
            if nosym is None:
                os.environ.pop("RYUJIN_NO_SYM", None)
            else:
                os.environ["RYUJIN_NO_SYM"] = nosym
            for abl in ("pk1", "pk2", "pk3", ""):
                if abl:
                    os.environ["RYUJIN_PK_ABLATE"] = abl
                else:
                    os.environ.pop("RYUJIN_PK_ABLATE", None)
                hm_v = HyperbolicModule(
                    eq, packed, init, dtype=dtype, backend=backend
                )
                ti_v = TimeIntegrator(
                    hm_v, scheme="erk 33", cfl_min=0.45, cfl_max=0.9,
                    cfl_recovery_strategy="bang bang control",
                )
                out = ti_v.advance(U, t, n_steps=2)
                float(out[2])
                t0 = time.perf_counter()
                out = ti_v.advance(U, t, n_steps=n_steps)
                float(out[2])
                wall = time.perf_counter() - t0
                ms = wall / (n_steps * 3) * 1e3
                tag = ("nosym " if nosym else "") + (abl or "full")
                print(f"{tag:12s} {ms:8.3f} ms/substep", flush=True)
        return

    mqs = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        out = ti.advance(U, t, n_steps=n_steps)
        float(out[2])
        wall = time.perf_counter() - t0
        mqs = packed.n_nodes * n_steps * 3 / wall / 1e6
        print(f"rep {rep}: {wall:.3f}s  {mqs:.1f} MQ/s", flush=True)

    Uh = np.asarray(out[0])[:, np.asarray(packed.node_mask) > 0]
    print("finite:", np.isfinite(Uh).all(), "rho range:",
          Uh[0].min(), Uh[0].max(), flush=True)
    print(json.dumps(
        {"metric": f"euler{dim}d_{geom}_multiblock", "mqs": mqs}
    ))


if __name__ == "__main__":
    main()
