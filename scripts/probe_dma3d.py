"""Microbenchmark: 3D z-slab halo-window DMA cost vs canvas layout.

probe_pk1 shows the 3D kernels are ~98% window-DMA time ("empty" ablation:
13.97 of 14.24 ms).  Hypothesis: the [planes, D, H, W] plane-major layout
makes every window DMA a strided transfer of `planes` separate
wz*H*W-chunks (and every pipelined center block `planes * TD` chunks of
H*W), and the DMA engine's per-chunk overhead — not bandwidth — bounds
the kernels.  A z-major [D, planes, H, W] layout makes the same window a
single contiguous chunk.

Three variants of the same logical transfer (a `planes`-deep window over
a (D, H, W) canvas, one z-tile per grid step, double-buffered exactly
like _tiled_call_3d_slab):

  plane-major   src [P, D, H, W], window [:, sz:sz+wz]   (P chunks)
  z-major       src [D, P, H, W], window [sz:sz+wz]      (1 chunk)
  z-major-slide z-major + sliding: DMA only the TD new planes, shift
                the wz-TD overlap VMEM-locally

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dma3d.py

Envs: P (24), D (72), H (72), W (128), TD (2), REPS (50).
"""

import json
import os
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = int(os.environ.get("P", "24"))
    D = int(os.environ.get("D", "72"))
    H = int(os.environ.get("H", "72"))
    W = int(os.environ.get("W", "128"))
    TD = int(os.environ.get("TD", "2"))
    reps = int(os.environ.get("REPS", "50"))
    wz = TD + 2
    gz = D // TD - 2  # interior tiles: window [p*TD, p*TD+wz) stays in D

    common = dict(
        grid=(gz,),
        out_shape=jax.ShapeDtypeStruct((D, H, W), jnp.float32),
        out_specs=pl.BlockSpec(
            (TD, H, W), lambda tz: (tz, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )

    def kern_plane_major(h_ref, o_ref, win, sems):
        p = pl.program_id(0)
        two = jnp.asarray(2, p.dtype)
        slot = jax.lax.rem(p, two)
        nslot = jax.lax.rem(p + jnp.asarray(1, p.dtype), two)

        def start(q, into):
            pltpu.make_async_copy(
                h_ref.at[:, pl.ds(q * TD, wz)], win.at[into], sems.at[into]
            ).start()

        @pl.when(p == 0)
        def _():
            start(p, slot)

        @pl.when(p + 1 < gz)
        def _():
            start(p + 1, nslot)

        pltpu.make_async_copy(
            h_ref.at[:, pl.ds(p * TD, wz)], win.at[slot], sems.at[slot]
        ).wait()
        o_ref[...] = win[slot, :, 1 : 1 + TD].sum(axis=0)

    f_plane = pl.pallas_call(
        kern_plane_major,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, P, wz, H, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        **common,
    )

    def kern_z_major(h_ref, o_ref, win, sems):
        p = pl.program_id(0)
        two = jnp.asarray(2, p.dtype)
        slot = jax.lax.rem(p, two)
        nslot = jax.lax.rem(p + jnp.asarray(1, p.dtype), two)

        def start(q, into):
            pltpu.make_async_copy(
                h_ref.at[pl.ds(q * TD, wz)], win.at[into], sems.at[into]
            ).start()

        @pl.when(p == 0)
        def _():
            start(p, slot)

        @pl.when(p + 1 < gz)
        def _():
            start(p + 1, nslot)

        pltpu.make_async_copy(
            h_ref.at[pl.ds(p * TD, wz)], win.at[slot], sems.at[slot]
        ).wait()
        o_ref[...] = win[slot, 1 : 1 + TD].sum(axis=1)

    f_z = pl.pallas_call(
        kern_z_major,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, wz, P, H, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        **common,
    )

    def kern_z_slide(h_ref, o_ref, win, sems):
        p = pl.program_id(0)

        @pl.when(p == 0)
        def _():
            pltpu.make_async_copy(
                h_ref.at[pl.ds(0, wz)], win.at[0], sems.at[0]
            ).start()
            pltpu.make_async_copy(
                h_ref.at[pl.ds(0, wz)], win.at[0], sems.at[0]
            ).wait()

        @pl.when(p > 0)
        def _():
            pltpu.make_async_copy(
                h_ref.at[pl.ds(p * TD + (wz - TD), TD)],
                win.at[0, pl.ds(wz - TD, TD)],
                sems.at[0],
            ).wait()

        o_ref[...] = win[0, 1 : 1 + TD].sum(axis=1)

        @pl.when(p + 1 < gz)
        def _():
            # shift the overlap VMEM-locally, then prefetch the new planes
            pltpu.make_async_copy(
                win.at[0, pl.ds(TD, wz - TD)],
                win.at[0, pl.ds(0, wz - TD)],
                sems.at[1],
            ).start()
            pltpu.make_async_copy(
                win.at[0, pl.ds(TD, wz - TD)],
                win.at[0, pl.ds(0, wz - TD)],
                sems.at[1],
            ).wait()
            pltpu.make_async_copy(
                h_ref.at[pl.ds((p + 1) * TD + (wz - TD), TD)],
                win.at[0, pl.ds(wz - TD, TD)],
                sems.at[0],
            ).start()

    f_zs = pl.pallas_call(
        kern_z_slide,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((1, wz, P, H, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        **common,
    )

    def run(tag, f, shape):
        fn = jax.jit(f)
        x = jnp.asarray(np.random.rand(*shape).astype(np.float32))
        out = fn(x)
        float(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        float(out.reshape(-1)[0])
        ms = (time.perf_counter() - t0) / reps * 1e3
        vol = P * wz * H * W * 4 * gz / 1e9
        print(f"{tag:14s} {ms:8.3f} ms  ({vol / (ms / 1e3):7.1f} GB/s eff)",
              flush=True)
        return ms

    ms_a = run("plane-major", f_plane, (P, D, H, W))
    ms_b = run("z-major", f_z, (D, P, H, W))
    ms_c = run("z-major-slide", f_zs, (D, P, H, W))
    print(json.dumps({
        "plane_major_ms": round(ms_a, 3),
        "z_major_ms": round(ms_b, 3),
        "z_major_slide_ms": round(ms_c, 3),
    }))


if __name__ == "__main__":
    main()


def pk1_shape():
    """Replicate PK1's exact transfer set with zero compute, then bisect:
    center cij (78 planes) + 3 halo windows (5/4/2 planes) + 2 outputs.

      PYTHONPATH=... python -c "import sys; sys.path.insert(0,'scripts');
      import probe_dma3d; probe_dma3d.pk1_shape()"

    Envs: D (72), H (72), W (128), TD (2), REPS (30), variant toggles
    CENter/WINdows/OUTplanes.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = int(os.environ.get("D", "72"))
    H = int(os.environ.get("H", "72"))
    W = int(os.environ.get("W", "128"))
    TD = int(os.environ.get("TD", "2"))
    reps = int(os.environ.get("REPS", "30"))
    use_cen = os.environ.get("CEN", "1") == "1"
    n_win = int(os.environ.get("NWIN", "3"))
    out_pl = int(os.environ.get("OUTPL", "14"))
    cen_pl = int(os.environ.get("CENPL", "78"))
    wz = TD + 2
    gz = D // TD - 2
    win_planes = [5, 4, 2][:n_win]

    def kernel(*refs):
        k = 0
        c_ref = refs[k] if use_cen else None
        k += 1 if use_cen else 0
        h_refs = refs[k : k + n_win]; k += n_win
        o_ref = refs[k]; k += 1
        wins = refs[k : k + n_win]; k += n_win
        sems = refs[-1]
        p = pl.program_id(0)
        two = jnp.asarray(2, p.dtype)
        slot = jax.lax.rem(p, two)
        nslot = jax.lax.rem(p + jnp.asarray(1, p.dtype), two)

        def start(q, into):
            for i in range(n_win):
                pltpu.make_async_copy(
                    h_refs[i].at[pl.ds(q * TD, wz)], wins[i].at[into],
                    sems.at[into, i],
                ).start()

        @pl.when(p == 0)
        def _():
            start(p, slot)

        @pl.when(p + 1 < gz)
        def _():
            start(p + 1, nslot)

        for i in range(n_win):
            pltpu.make_async_copy(
                h_refs[i].at[pl.ds(p * TD, wz)], wins[i].at[slot],
                sems.at[slot, i],
            ).wait()
        acc = jnp.zeros((TD, 1, H, W), jnp.float32)
        for i in range(n_win):
            acc = acc + wins[i][slot][1 : 1 + TD, :1]
        if use_cen:
            acc = acc + c_ref[:, :1]
        o_ref[...] = jnp.broadcast_to(acc, (TD, out_pl, H, W))

    in_specs = []
    args = []
    if use_cen:
        in_specs.append(pl.BlockSpec(
            (TD, cen_pl, H, W), lambda tz: (tz, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(np.random.rand(D, cen_pl, H, W).astype(np.float32))
    for pl_i in win_planes:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(np.random.rand(D, pl_i, H, W).astype(np.float32))

    f = pl.pallas_call(
        kernel,
        grid=(gz,),
        out_shape=jax.ShapeDtypeStruct((D, out_pl, H, W), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TD, out_pl, H, W), lambda tz: (tz, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wz, pl_i, H, W), jnp.float32)
            for pl_i in win_planes
        ] + [pltpu.SemaphoreType.DMA((2, max(n_win, 1)))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )
    fn = jax.jit(f)
    xs = [jnp.asarray(a) for a in args]
    out = fn(*xs)
    float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*xs)
    float(out.reshape(-1)[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"pk1-shape cen={use_cen}({cen_pl}) nwin={n_win} outpl={out_pl}: "
          f"{ms:.3f} ms", flush=True)
    return ms


def moveaxis_cost():
    """Measure the in-kernel moveaxis normalization: z-major window
    [wz, P, H, W] -> plane-major value [P, wz, H, W] (leading-dim
    relayout), summed to keep it alive.  MOV=0 sums without the
    transpose for the baseline."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = int(os.environ.get("D", "72"))
    H = int(os.environ.get("H", "72"))
    W = int(os.environ.get("W", "128"))
    TD = int(os.environ.get("TD", "2"))
    P = int(os.environ.get("P", "24"))
    reps = int(os.environ.get("REPS", "30"))
    mov = os.environ.get("MOV", "1") == "1"
    wz = TD + 2
    gz = D // TD - 2

    def kernel(h_ref, o_ref, win, sems):
        p = pl.program_id(0)
        two = jnp.asarray(2, p.dtype)
        slot = jax.lax.rem(p, two)
        nslot = jax.lax.rem(p + jnp.asarray(1, p.dtype), two)

        def start(q, into):
            pltpu.make_async_copy(
                h_ref.at[pl.ds(q * TD, wz)], win.at[into], sems.at[into]
            ).start()

        @pl.when(p == 0)
        def _():
            start(p, slot)

        @pl.when(p + 1 < gz)
        def _():
            start(p + 1, nslot)

        pltpu.make_async_copy(
            h_ref.at[pl.ds(p * TD, wz)], win.at[slot], sems.at[slot]
        ).wait()
        w = win[slot]  # [wz, P, H, W]
        if mov:
            w = jnp.moveaxis(w, 0, 1)  # [P, wz, H, W]
            o_ref[...] = w[:1, 1 : 1 + TD].sum(axis=0)
        else:
            o_ref[...] = w[1 : 1 + TD, :1].sum(axis=1)

    f = pl.pallas_call(
        kernel,
        grid=(gz,),
        out_shape=jax.ShapeDtypeStruct((D, H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (TD, H, W), lambda tz: (tz, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wz, P, H, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )
    fn = jax.jit(f)
    x = jnp.asarray(np.random.rand(D, P, H, W).astype(np.float32))
    out = fn(x)
    float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    float(out.reshape(-1)[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"moveaxis={mov} P={P}: {ms:.3f} ms", flush=True)
    return ms
