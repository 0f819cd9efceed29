"""Fused Pallas TPU kernels for the IDP substep on structured canvases.

Motivation: under plain XLA the substep lowers to ~100 small fusions per
substep, each re-reading [K, n]-sized intermediates from HBM (the
roll/concat neighbor accesses break producer-consumer fusion).  Here the
substep runs as five tiled kernels; each kernel DMAs a (TH+2, TW+2) halo
window of its inputs into VMEM once and evaluates an entire phase of
/root/reference/source/hyperbolic_module.template.h per tile:

  PK1  d_ij (both directions via static c_ji) + EVC alpha       (:341-424)
  ---  tau_max reduction (XLA, one pass over d)                 (:494-564)
  PK2  low-order update + high-order RHS F_i + limiter bounds   (:597-884)
  PK3  P_ij with mass-matrix correction + first limiter pass    (:892-1041)
  PK4  symmetrized update + next limiter pass (x n_iter-1)      (:1054-1182)
  PK5  final symmetrized update

The kernels share the phase functions of solver/hyperbolic.py — the same
math runs full-canvas under XLA (CPU/verification path) and per-tile here.
Intermediate arrays (d, alpha, F, bounds, P, l) round-trip through HBM once
per phase; everything else stays in VMEM.

2D canvases run row tiles (sliding-stripe windows when single-column); 3D
canvases run (z-slab, row-tile) grids with a one-plane z halo on the
windows (`_tiled_call_3d`).

Periodic axes: the minor (x) axis wraps for free (lane rolls of
full-width windows); periodic LEADING (y/z) axes carry ghost bands
(offline/structured.py) that are refreshed by margin-sized XLA copies
before every halo-reading kernel (`_refresh`).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..offline.structured import StructuredData
from . import hyperbolic as hyp


def pallas_default_margin(eq, dim: int, ansatz: str = "cG Q1"):
    """Canvas margins the Pallas kernels need for this equation/dim.

    2D row tiles need TH(=8)-row y margins.  The 3D z-slab kernels
    (available when the equation supports slot streaming and the ansatz
    is cG Q1 — dG incidence is not streamed) need TD(=8) planes on z but
    only 1+ rows on y — (8, 2) cuts the 3D canvas pad ratio from ~1.9 to
    ~1.5 on benchmark-sized boxes.  The 3D y-tiled fallback kernels need
    full 8-row margins on both leading axes.
    """
    import os

    if dim < 3:
        return 8
    streaming = (
        ansatz == "cG Q1"
        and hasattr(eq, "indicator_accum")
        and hasattr(eq, "limiter_bounds_accum")
        and not getattr(eq, "have_source_terms", False)
        and not getattr(eq, "have_equilibrated_states", False)
        and not getattr(eq, "have_high_order_flux", False)
        and not getattr(eq, "limiter_needs_fluxes", False)
    )
    if streaming and os.environ.get("RYUJIN_SLAB3D", "1") != "0":
        return (_tile_d_default(), 2)
    return 8


def pallas_supports(packed) -> bool:
    """True if the canvas can run the Mosaic-COMPILED kernels.

    The halo-window DMAs slice the lane (minor) canvas axis, and Mosaic
    requires lane slices aligned to the (8, 128) f32 tiling — so the
    minor axis must be a multiple of 128.  Non-periodic canvases are
    always padded to 128 (pack_structured pad_minor); periodic-x
    canvases are exactly the period wide (the lane-roll wrap IS the
    periodic identification), so small periodic meshes (period % 128
    != 0) must run the XLA fallback on hardware.  Interpret mode has no
    such constraint.

    Higher-order stencils (reach > 1: cG Q2/Q3, dG Q2/Q3 node lattices)
    run the 2D row-tiled kernels; the 3D kernels' windows carry a
    one-plane z halo and support reach 1 only."""
    shape = getattr(packed, "shape", None)
    if shape is None or shape[-1] % 128 != 0:
        return False
    reach = getattr(packed, "reach", 1)
    if reach > 1:
        if len(shape) != 2:
            return False
        # PK1/PK2/PK3 stream their slots for reach > 1, but PK4/PK5
        # still pipeline the full [C*K] P block; their program-VMEM
        # requirement is ~1.1 kB per K*column (measured: 155 MB at
        # K=48, W=2944 on v5e — over the 128 MB VMEM).  Beyond the
        # ceiling the XLA canvas path takes over.
        if 1100.0 * packed.max_degree * shape[-1] > 126e6:
            return False
    return True


def _sorted_map(m):
    """(dst, src) index pair sorted by dst, as device arrays — lets the
    ghost-refresh scatters claim unique_indices + indices_are_sorted
    (TPU scatter is substantially cheaper with both hints)."""
    dst, src = (np.asarray(a) for a in m)
    o = np.argsort(dst, kind="stable")
    return (jnp.asarray(dst[o]), jnp.asarray(src[o]))


def _tile_d_default() -> int:
    """z-slab tile depth TD, shared by margin sizing and the kernels.

    TD=2 keeps the z margins (and hence the canvas pad ratio) minimal at
    the cost of a (TD+2)/TD = 2x halo reload of the streamed windows;
    TD=8 amortizes the reload to 1.25x but pads the canvas with 8-plane
    z margins (pad 1.26 vs 1.54 on the benchmark box)."""
    return int(os.environ.get("RYUJIN_TILE_D", "2"))


class _TileView:
    """Neighbor access on halo'd VMEM windows for one canvas tile.

    When the tile spans the full canvas width (halo_x=False), x-neighbors
    use a lane roll of the window instead of a column halo — whose wrap is
    exactly the periodic identification for periodic-x canvases and hits
    masked edges otherwise (same semantics as StructuredStencil).

    3D canvases add a leading z axis: offsets are (dz, dy, dx) triples,
    windows carry a one-plane z halo (wz = TD + 2, tile planes at lz = 1),
    and tiles always span the full canvas width (x via lane rolls).
    """

    def __init__(self, offsets, ly, lx, TH, TW, halo_x=True, halo_y=True,
                 wy=None, wx=None, lz=None, TD=None, wz=None):
        self.offsets = offsets
        self.ly, self.lx = ly, lx
        self.TH, self.TW = TH, TW
        self.halo_x, self.halo_y = halo_x, halo_y
        self.wy = wy if wy is not None else 3 * TH
        self.wx = wx if wx is not None else 3 * TW
        self.lz, self.TD = lz, TD
        self.wz = wz if wz is not None else (TD + 2 if TD else None)

    def _slot(self, w, k_plane, off):
        # Clamp starts into the window: only all-margin tiles (masked
        # nodes) ever hit the clamp; real tiles have ly = lx = 1.  On
        # hardware an out-of-bounds VMEM slice faults rather than clamps.
        if len(off) == 3:
            dz, dy, dx = off
        else:
            dz, (dy, dx) = 0, off
        idx = []
        if self.TD is not None:
            z0 = self.lz + dz  # static: interior z tiles only
            idx.append(slice(z0, z0 + self.TD))
        if self.halo_y:
            r0 = self.ly + dy  # static: interior tiles only
            idx.append(slice(r0, r0 + self.TH))
        else:
            idx.append(slice(None))
        if self.halo_x:
            idx.append(pl.ds(
                jnp.clip(self.lx + dx, 0, self.wx - self.TW), self.TW
            ))
        else:
            idx.append(slice(None))
        if k_plane is None:
            sl = w[(slice(None),) + tuple(idx)]
        else:
            sl = w[(k_plane,) + tuple(idx)]
        if not self.halo_y and dy:
            sl = pltpu.roll(sl, (-dy) % self.TH, axis=sl.ndim - 2)
        if not self.halo_x and dx:
            sl = pltpu.roll(sl, (-dx) % self.TW, axis=sl.ndim - 1)
        return sl

    def center(self, w):
        if (
            w.shape[-2] == self.TH
            and (not self.halo_x or w.shape[-1] == self.TW)
            and (self.TD is None or w.shape[-3] == self.TD)
        ):
            return w[...]
        return self._slot(w, None, (0,) * (3 if self.TD is not None else 2))

    def nbr(self, w):
        """Window -> [pl, K, *tile]."""
        sls = [self._slot(w, None, off) for off in self.offsets]
        return jnp.stack(sls, axis=1)

    def transpose_edge(self, w):
        """Window of an edge array [K, ...] -> l_T [K, *tile].

        out[k] = w[K-1-k] at the off_k neighbor (lattice_offsets order).
        """
        K = len(self.offsets)
        sls = [
            self._slot(w, K - 1 - k, off)
            for k, off in enumerate(self.offsets)
        ]
        return jnp.stack(sls, axis=0)


def _tiled_call(
    compute,
    ins: Sequence,
    scalars: Sequence[jax.Array],
    out_init: Sequence[jax.Array],
    offsets,
    H: int,
    W: int,
    TH: int,
    TW: int,
    tile_rows: Tuple[int, int],
    dtype,
    interpret: bool = False,
    slab_tiles: Optional[Tuple[int, int, int, int]] = None,
):
    """Run `compute` over the interior row-tiles.

    ins: canvas arrays [pl_i, H, W], or (array, False) for inputs needed
    only at the center tile.  Center inputs are fed as pipelined BlockSpec
    blocks (auto double-buffered); halo inputs are DMA'd as (3*TH, W)
    windows into VMEM scratch (window starts 8-aligned and in-bounds by
    construction: `tile_rows` excludes the masked canvas margins).

    out_init: one entry per output: a canvas array (aliased as the output
    buffer — tiles outside `tile_rows` keep the init values, for outputs
    whose margins must hold valid data downstream) or an int plane count
    (uninitialized output — margin tiles contain garbage, so consumers
    must mask any halo read of such outputs with jnp.where; this avoids
    materializing a fresh zero canvas in HBM every substep).

    slab_tiles: (n_slabs, tps, At, gt) in TILE units for an UNSHARDED
    slab canvas (axis 0 = n_slabs blocks of At tiles: gt ghost | tps
    real | gt ghost).  The grid then enumerates only the n_slabs * tps
    REAL tiles and maps tile tq to canvas row-tile
    (tq // tps) * At + gt + tq % tps — ghost-band tiles are never
    computed (they are refreshed between kernels anyway), which removes
    the slab-machinery row tax measured in PERF_r04
    slab_canvas_overhead_1M.  tile_rows is ignored for geometry but
    still carries the computed-tile count for the traffic model.

    scalars: () arrays delivered via SMEM.
    compute(windows, scalars, tv) -> list of [pl_o, TH, TW] tiles.
    """
    if slab_tiles is None:
        t0, t1 = tile_rows
        assert t0 >= 1 and t1 * TH + TH <= H, (tile_rows, H, TH)
        tps = None

        def row_tile(tq):
            return tq + t0
    else:
        n_sl, tps, At, gt = slab_tiles
        assert gt >= 1 and n_sl * At * TH == H, (slab_tiles, H, TH)
        # tile_rows[1] may trim trailing empty tiles of the last slab
        # (Ls rounding pad) from the enumeration; the tile -> row map is
        # unchanged, those rows just stay uncomputed like canvas margins:
        t0, t1 = 0, min(tile_rows[1], n_sl * tps)

        def row_tile(tq):
            return (tq // tps) * At + gt + tq % tps
    gw = W // TW
    halo_x = gw > 1
    wy = 3 * TH
    wx = 3 * TW if halo_x else TW

    norm = [(a, True) if not isinstance(a, tuple) else a for a in ins]
    cent = [
        i for i, (a, h) in enumerate(norm)
        if a is not None and a.shape[0] > 0 and not h
    ]
    halo = [
        i for i, (a, h) in enumerate(norm)
        if a is not None and a.shape[0] > 0 and h
    ]
    ins_c = [norm[i][0] for i in cent]
    ins_h = [norm[i][0] for i in halo]
    n_c, n_h, n_sc, n_out = len(ins_c), len(ins_h), len(scalars), len(out_init)
    n_ali = sum(1 for a in out_init if not isinstance(a, int))

    gh = t1 - t0  # grid height (row tiles)

    def kernel(*refs):
        k = 0
        sc_refs = refs[k : k + n_sc]; k += n_sc
        c_refs = refs[k : k + n_c]; k += n_c
        h_refs = refs[k : k + n_h]; k += n_h
        k += n_ali  # aliased init refs (unused)
        out_refs = refs[k : k + n_out]; k += n_out
        wins_h = refs[k : k + n_h]; k += n_h
        sems = refs[-1]

        # Halo windows are double-buffered across grid steps: tile p waits
        # on the copy started at tile p-1 and prefetches tile p+1, so the
        # window DMA overlaps the previous tile's compute (BlockSpec'd
        # center inputs are pipelined by Pallas itself; these manual
        # window copies are not).
        p = pl.program_id(0) * gw + pl.program_id(1)
        n_p = gh * gw

        def window_start(q):
            """(sy, sx, lx) of flattened tile q."""
            ty = row_tile(q // gw)
            tx = q - (q // gw) * gw
            sy = (ty - 1) * TH
            if halo_x:
                sx = jnp.clip(tx * TW - TW, 0, W - wx)
                lx = tx * TW - sx
            else:
                sx, lx = tx * TW, 0
            return sy, sx, lx

        def start_copies(q, slot):
            sy_q, sx_q, _ = window_start(q)
            for i in range(n_h):
                pltpu.make_async_copy(
                    h_refs[i].at[:, pl.ds(sy_q, wy), pl.ds(sx_q, wx)],
                    wins_h[i].at[slot],
                    sems.at[slot, i],
                ).start()

        two = jnp.asarray(2, p.dtype)
        slot = jax.lax.rem(p, two)
        nslot = jax.lax.rem(p + jnp.asarray(1, p.dtype), two)

        if not halo_x:
            # Sliding window (single-column grid): consecutive windows
            # overlap by 2*TH rows, so per tile only the NEW TH-row
            # stripe (the rows of tile ty+1) is DMA'd from HBM — into
            # rows [2*TH, 3*TH) of this tile's buffer — while rows
            # [0, 2*TH) are shifted over from the previous window with a
            # VMEM-local copy.  This cuts halo-input HBM traffic 3x
            # versus re-fetching the full 3*TH window every tile.
            # Slab canvases (slab_tiles) break row contiguity at slab
            # boundaries: the first tile of each slab reloads its full
            # window instead (n_slabs extra 3-stripe loads per kernel).
            def stripe_src(q):
                return (row_tile(q) + 1) * TH  # rows of tile ty_q + 1

            if tps is None:
                is_start = p == jnp.asarray(0, p.dtype)
                nxt_start = p < jnp.asarray(0, p.dtype)  # never
            else:
                tpsd = jnp.asarray(tps, p.dtype)
                is_start = jax.lax.rem(p, tpsd) == 0
                nxt_start = (
                    jax.lax.rem(p + jnp.asarray(1, p.dtype), tpsd) == 0
                )
            sy_full = (row_tile(p) - 1) * TH

            @pl.when(is_start)
            def _():
                for i in range(n_h):
                    pltpu.make_async_copy(
                        h_refs[i].at[:, pl.ds(sy_full, wy), :],
                        wins_h[i].at[slot],
                        sems.at[slot, i],
                    ).start()
                for i in range(n_h):
                    pltpu.make_async_copy(
                        h_refs[i].at[:, pl.ds(sy_full, wy), :],
                        wins_h[i].at[slot],
                        sems.at[slot, i],
                    ).wait()

            @pl.when(jnp.logical_not(is_start))
            def _():
                # wait the stripe prefetch issued at p-1, then shift the
                # overlapping 2*TH rows from the previous buffer
                for i in range(n_h):
                    pltpu.make_async_copy(
                        h_refs[i].at[:, pl.ds(stripe_src(p), TH), :],
                        wins_h[i].at[slot, :, 2 * TH : 3 * TH],
                        sems.at[slot, i],
                    ).wait()
                for i in range(n_h):
                    pltpu.make_async_copy(
                        wins_h[i].at[nslot, :, TH : 3 * TH],
                        wins_h[i].at[slot, :, 0 : 2 * TH],
                        sems.at[2, i],
                    ).start()
                for i in range(n_h):
                    pltpu.make_async_copy(
                        wins_h[i].at[nslot, :, TH : 3 * TH],
                        wins_h[i].at[slot, :, 0 : 2 * TH],
                        sems.at[2, i],
                    ).wait()

            @pl.when(jnp.logical_and(
                p + 1 < n_p, jnp.logical_not(nxt_start)
            ))
            def _():
                # prefetch the next tile's new stripe into the other
                # buffer (safe: its source rows were just shifted out).
                # Slab-start tiles load their full window synchronously
                # instead — prefetching for them would leave an unwaited
                # DMA + semaphore racing the full load.
                for i in range(n_h):
                    pltpu.make_async_copy(
                        h_refs[i].at[:, pl.ds(stripe_src(p + 1), TH), :],
                        wins_h[i].at[nslot, :, 2 * TH : 3 * TH],
                        sems.at[nslot, i],
                    ).start()

            sy, sx, lx = window_start(p)
        else:
            @pl.when(p == 0)
            def _():
                start_copies(p, slot)

            @pl.when(p + 1 < n_p)
            def _():
                start_copies(p + 1, nslot)

            sy, sx, lx = window_start(p)
            for i in range(n_h):
                pltpu.make_async_copy(
                    h_refs[i].at[:, pl.ds(sy, wy), pl.ds(sx, wx)],
                    wins_h[i].at[slot],
                    sems.at[slot, i],
                ).wait()

        wins = [None] * len(ins)
        for j, i in enumerate(cent):
            wins[i] = c_refs[j]
        for j, i in enumerate(halo):
            wins[i] = wins_h[j][slot]
        scal = [r[0, 0] for r in sc_refs]
        tv = _TileView(offsets, TH, lx, TH, TW, halo_x, True, wy, wx)
        if getattr(compute, "takes_out_refs", False):
            # streaming kernels (large-K PK3) store slot results into the
            # output refs as they are computed instead of stacking [K,
            # tile] values — the Mosaic scoped-VMEM stack otherwise holds
            # every slot live at once (measured overflow at cG Q3's K=48)
            outs = compute(wins, scal, tv, out_refs)
        else:
            outs = compute(wins, scal, tv)
        for oref, val in zip(out_refs, outs):
            if val is not None:
                oref[...] = val

    init_arrays = [a for a in out_init if not isinstance(a, int)]
    out_shape = [
        jax.ShapeDtypeStruct((a, H, W), dtype)
        if isinstance(a, int)
        else jax.ShapeDtypeStruct(a.shape, a.dtype)
        for a in out_init
    ]
    in_specs = (
        [pl.BlockSpec((1, 1), lambda ty, tx: (0, 0),
                      memory_space=pltpu.SMEM)] * n_sc
        + [
            pl.BlockSpec(
                (a.shape[0], TH, TW),
                lambda ty, tx: (0, row_tile(ty), tx),
                memory_space=pltpu.VMEM,
            )
            for a in ins_c
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_h
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_ali  # aliased inits
    )
    out_specs = [
        pl.BlockSpec(
            (a if isinstance(a, int) else a.shape[0], TH, TW),
            lambda ty, tx: (0, row_tile(ty), tx),
            memory_space=pltpu.VMEM,
        )
        for a in out_init
    ]
    scratch = [
        pltpu.VMEM((2, a.shape[0], wy, wx), dtype) for a in ins_h
    ] + [pltpu.SemaphoreType.DMA((3, max(n_h, 1)))]
    aliases = {}
    a_idx = 0
    for o, a in enumerate(out_init):
        if not isinstance(a, int):
            aliases[n_sc + n_c + n_h + a_idx] = o
            a_idx += 1
    return pl.pallas_call(
        kernel,
        grid=(t1 - t0, gw),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *[jnp.reshape(x, (1, 1)) for x in scalars],
        *ins_c,
        *ins_h,
        *init_arrays,
    )


# Set to a list by bench/probe tooling BEFORE tracing a substep: every
# fused-kernel dispatch appends (kernel_name, dma_bytes, flat_bytes)
# computed from its DMA shapes — center blocks, halo windows (with
# their (wz/TD or 3x) reload factor), and output tiles.  The halo
# terms are UPPER bounds, not exact: the 2D gw>1 case charges full
# 3*TW-wide windows ignoring edge-column clipping, and the stacked-3D
# case charges a full (wz, 3*TH) fetch per tile although the sliding
# window refetches less — so hbm_roofline_frac values derived from
# these numbers are conservative (the true fraction can be lower, not
# higher, than reported).
# `flat_bytes` is the plain operand+result footprint (no reload factor,
# full canvases incl. margins), matching how XLA's cost analysis counts
# a custom call — bench.py uses it to splice the analytic kernel DMA
# into the whole-substep "bytes accessed" total.
TRAFFIC_LOG = None


def _traffic_account(tiled_call_fn, name, ins, out_init, common, itemsize):
    norm = [(a, True) if not isinstance(a, tuple) else a for a in ins]
    zmajor = tiled_call_fn is _tiled_call_3d_slab
    if zmajor:
        TD, H, W = common["TD"], common["H"], common["W"]
        tz0, tz1 = common["tile_planes"]
        g = tz1 - tz0
        tile, win = g * TD * H * W, g * (TD + 2) * H * W
    elif tiled_call_fn is _tiled_call:
        TH, TW, W = common["TH"], common["TW"], common["W"]
        t0, t1 = common["tile_rows"]
        gw = W // TW
        g = (t1 - t0) * gw
        tile = g * TH * TW
        if gw > 1:
            # column grids re-fetch a full (3*TH, 3*TW) window per tile
            # (upper bound: edge clipping ignored):
            win = g * 3 * TH * 3 * TW
        else:
            # single-column sliding-stripe pipeline: one full 3*TH
            # window at the start (and per slab, when slab_tiles remaps
            # the grid), then only the NEW TH-row stripe per tile:
            starts = (
                common["slab_tiles"][0]
                if common.get("slab_tiles") is not None else 1
            )
            win = (g + 2 * starts) * TH * TW
    elif tiled_call_fn is _tiled_call_3d:
        TD, TH, W = common["TD"], common["TH"], common["W"]
        tz0, tz1 = common["tile_planes"]
        t0, t1 = common["tile_rows"]
        g = (tz1 - tz0) * (t1 - t0)
        tile = g * TD * TH * W
        # sliding window: full (wz, 3*TH) fetch per slab transition,
        # TH-stripe per subsequent y tile — account the upper bound:
        win = g * (TD + 2) * 3 * TH * W
    else:
        return
    canvas_slots = (
        common["D"] * common["H"] * common["W"]
        if "D" in common else common["H"] * common["W"]
    )
    dma = flat = 0
    for a, h in norm:
        if a is None:
            continue
        planes = a.shape[1] if zmajor else a.shape[0]
        if planes == 0:
            continue
        if h == 'b':  # broadcast block: fetched once for the whole grid
            dma += a.size * itemsize
        elif zmajor:
            # per-array trailing dims (z-profile arrays are [D,PF,1,128])
            pp = int(np.prod(a.shape[2:]))
            g_ = tile // (TD * H * W)
            dma += planes * pp * itemsize * (
                g_ * (TD + 2) if h is True else g_ * TD
            )
        else:
            dma += planes * (win if h is True else tile) * itemsize
        flat += a.size * itemsize
    for a in out_init:
        planes = a if isinstance(a, int) else (
            a.shape[1] if zmajor else a.shape[0]
        )
        dma += planes * tile * itemsize
        flat += planes * canvas_slots * itemsize
    TRAFFIC_LOG.append((name, dma, flat))


def _tiled_call_3d(
    compute,
    ins: Sequence,
    scalars: Sequence[jax.Array],
    out_init: Sequence[jax.Array],
    offsets,
    D: int,
    H: int,
    W: int,
    TD: int,
    TH: int,
    tile_planes: Tuple[int, int],
    tile_rows: Tuple[int, int],
    dtype,
    interpret: bool = False,
):
    """Run `compute` over the interior (z-slab, row-tile) grid of a 3D
    canvas [planes, D, H, W].

    Tiles are [TD, TH, W] (full canvas width; x-neighbors via lane rolls).
    Halo inputs are DMA'd as [planes, TD+2, 3*TH, W] windows with a
    one-plane z halo.  Within a z-slab, consecutive y tiles slide the
    window: only the new TH-row stripe is fetched from HBM and the
    overlapping 2*TH rows are shifted over with a VMEM-local copy (the 3D
    rendition of the 2D single-column sliding-stripe path); slab
    transitions re-fetch the full window.

    See `_tiled_call` for the ins/out_init/scalars conventions.
    """
    t0, t1 = tile_rows
    tz0, tz1 = tile_planes
    assert t0 >= 1 and t1 * TH + TH <= H, (tile_rows, H, TH)
    assert tz0 * TD >= 1 and tz1 * TD + 1 <= D, (tile_planes, D, TD)
    wz, wy, wx = TD + 2, 3 * TH, W

    norm = [(a, True) if not isinstance(a, tuple) else a for a in ins]
    cent = [
        i for i, (a, h) in enumerate(norm)
        if a is not None and a.shape[0] > 0 and not h
    ]
    halo = [
        i for i, (a, h) in enumerate(norm)
        if a is not None and a.shape[0] > 0 and h
    ]
    ins_c = [norm[i][0] for i in cent]
    ins_h = [norm[i][0] for i in halo]
    n_c, n_h, n_sc, n_out = len(ins_c), len(ins_h), len(scalars), len(out_init)
    n_ali = sum(1 for a in out_init if not isinstance(a, int))

    gz = tz1 - tz0
    gy = t1 - t0

    def kernel(*refs):
        k = 0
        sc_refs = refs[k : k + n_sc]; k += n_sc
        c_refs = refs[k : k + n_c]; k += n_c
        h_refs = refs[k : k + n_h]; k += n_h
        k += n_ali  # aliased init refs (unused)
        out_refs = refs[k : k + n_out]; k += n_out
        wins_h = refs[k : k + n_h]; k += n_h
        sems = refs[-1]

        tz = pl.program_id(0)
        ty = pl.program_id(1)
        p = tz * gy + ty
        n_p = gz * gy

        def full_src(q):
            """Full-window HBM slice of flattened tile q."""
            tz_q = q // gy + tz0
            ty_q = q % gy + t0
            sz = tz_q * TD - 1
            sy = (ty_q - 1) * TH
            return sz, sy

        def stripe_src(q):
            """New-stripe rows (tile ty_q + 1) and slab z start of q."""
            tz_q = q // gy + tz0
            ty_q = q % gy + t0
            return tz_q * TD - 1, (ty_q + 1) * TH

        two = jnp.asarray(2, p.dtype)
        slot = jax.lax.rem(p, two)
        nslot = jax.lax.rem(p + jnp.asarray(1, p.dtype), two)

        def start_full(q, into):
            sz, sy = full_src(q)
            for i in range(n_h):
                pltpu.make_async_copy(
                    h_refs[i].at[:, pl.ds(sz, wz), pl.ds(sy, wy), :],
                    wins_h[i].at[into],
                    sems.at[into, i],
                ).start()

        def wait_full(q, into):
            sz, sy = full_src(q)
            for i in range(n_h):
                pltpu.make_async_copy(
                    h_refs[i].at[:, pl.ds(sz, wz), pl.ds(sy, wy), :],
                    wins_h[i].at[into],
                    sems.at[into, i],
                ).wait()

        @pl.when(p == 0)
        def _():
            start_full(p, slot)
            wait_full(p, slot)

        @pl.when((p > 0) & (ty == 0))
        def _():
            # slab start: wait the full-window prefetch issued at p-1
            wait_full(p, slot)

        @pl.when(ty > 0)
        def _():
            # wait the stripe prefetch issued at p-1, then shift the
            # overlapping 2*TH rows over from the previous buffer
            sz, sr = stripe_src(p)
            for i in range(n_h):
                pltpu.make_async_copy(
                    h_refs[i].at[:, pl.ds(sz, wz), pl.ds(sr, TH), :],
                    wins_h[i].at[slot, :, :, 2 * TH : 3 * TH],
                    sems.at[slot, i],
                ).wait()
            for i in range(n_h):
                pltpu.make_async_copy(
                    wins_h[i].at[nslot, :, :, TH : 3 * TH],
                    wins_h[i].at[slot, :, :, 0 : 2 * TH],
                    sems.at[2, i],
                ).start()
            for i in range(n_h):
                pltpu.make_async_copy(
                    wins_h[i].at[nslot, :, :, TH : 3 * TH],
                    wins_h[i].at[slot, :, :, 0 : 2 * TH],
                    sems.at[2, i],
                ).wait()

        @pl.when((p + 1 < n_p) & (ty + 1 < gy))
        def _():
            # next tile continues this slab: prefetch only its new stripe
            # (safe: the source rows of the shift were just copied out)
            sz, sr = stripe_src(p + 1)
            for i in range(n_h):
                pltpu.make_async_copy(
                    h_refs[i].at[:, pl.ds(sz, wz), pl.ds(sr, TH), :],
                    wins_h[i].at[nslot, :, :, 2 * TH : 3 * TH],
                    sems.at[nslot, i],
                ).start()

        @pl.when((p + 1 < n_p) & (ty + 1 >= gy))
        def _():
            # next tile starts a new slab: prefetch its full window
            start_full(p + 1, nslot)

        wins = [None] * len(ins)
        for j, i in enumerate(cent):
            wins[i] = c_refs[j]
        for j, i in enumerate(halo):
            wins[i] = wins_h[j][slot]
        scal = [r[0, 0] for r in sc_refs]
        tv = _TileView(offsets, TH, 0, TH, W, False, True, wy, wx,
                       lz=1, TD=TD, wz=wz)
        outs = compute(wins, scal, tv)
        for oref, val in zip(out_refs, outs):
            oref[...] = val

    init_arrays = [a for a in out_init if not isinstance(a, int)]
    out_shape = [
        jax.ShapeDtypeStruct((a, D, H, W), dtype)
        if isinstance(a, int)
        else jax.ShapeDtypeStruct(a.shape, a.dtype)
        for a in out_init
    ]
    in_specs = (
        [pl.BlockSpec((1, 1), lambda tz, ty: (0, 0),
                      memory_space=pltpu.SMEM)] * n_sc
        + [
            pl.BlockSpec(
                (a.shape[0], TD, TH, W),
                lambda tz, ty, _t0=t0, _tz0=tz0: (0, tz + _tz0, ty + _t0, 0),
                memory_space=pltpu.VMEM,
            )
            for a in ins_c
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_h
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_ali  # aliased inits
    )
    out_specs = [
        pl.BlockSpec(
            (a if isinstance(a, int) else a.shape[0], TD, TH, W),
            lambda tz, ty, _t0=t0, _tz0=tz0: (0, tz + _tz0, ty + _t0, 0),
            memory_space=pltpu.VMEM,
        )
        for a in out_init
    ]
    scratch = [
        pltpu.VMEM((2, a.shape[0], wz, wy, wx), dtype) for a in ins_h
    ] + [pltpu.SemaphoreType.DMA((3, max(n_h, 1)))]
    aliases = {}
    a_idx = 0
    for o, a in enumerate(out_init):
        if not isinstance(a, int):
            aliases[n_sc + n_c + n_h + a_idx] = o
            a_idx += 1
    return pl.pallas_call(
        kernel,
        grid=(gz, gy),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *[jnp.reshape(x, (1, 1)) for x in scalars],
        *ins_c,
        *ins_h,
        *init_arrays,
    )


def _tiled_call_3d_slab(
    compute,
    ins: Sequence,
    scalars: Sequence[jax.Array],
    out_init: Sequence[jax.Array],
    offsets,
    D: int,
    H: int,
    W: int,
    TD: int,
    tile_planes: Tuple[int, int],
    dtype,
    interpret: bool = False,
):
    """Run `compute` over full-cross-section z-slab tiles [TD, H, W].

    The second-generation 3D tiling: tiles span the full (H, W) cross
    section, so y-neighbors are sublane rolls (wrapping into the masked
    canvas margins) exactly like x-neighbors are lane rolls — no y halo,
    no (3*TH)-row windows.

    Z-MAJOR layout (third generation): every multi-plane array is stored
    [D, planes, H, W], so a tile's halo window [wz, planes, H, W] and
    every pipelined center block [TD, planes, H, W] are each ONE
    contiguous HBM transfer.  The previous [planes, D, H, W] layout
    fragmented the same transfers into `planes` (windows) and
    `planes * TD` (center blocks) separate chunks, and the DMA engine's
    per-chunk overhead — not bandwidth — bounded the kernels at ~2% of
    HBM speed (scripts/probe_dma3d.py: 67.8 ms plane-major vs 1.07 ms
    z-major for the identical logical transfer, a 63x difference; the
    probe_pk1 "empty" ablation showed PK1 at 13.97/14.24 ms pure DMA).
    Kernels normalize the loaded values back to the plane-major compute
    convention with a vreg-level moveaxis (leading dims are untiled, so
    this is register shuffling, not memory traffic).

    Compute must be slot-streaming (solver/pallas_step.py PallasStepper
    streaming kernels): with [K, tile] neighbor stacks the [TD, H, W]
    tiles would not fit VMEM.

    See `_tiled_call` for the ins/out_init/scalars conventions; arrays
    here are z-major [D, planes, H, W] (plane counts at axis 1).  A
    third input kind, (array, 'b'), is a z-independent BROADCAST block
    [1, planes, H, W]: its BlockSpec index is constant, so the pipeline
    fetches it once and it stays VMEM-resident across the whole grid
    (used for the separable-statics 2D factors).
    """
    tz0, tz1 = tile_planes
    assert tz0 * TD >= 1 and tz1 * TD + 1 <= D, (tile_planes, D, TD)
    wz = TD + 2

    norm = [(a, True) if not isinstance(a, tuple) else a for a in ins]
    cent = [
        i for i, (a, h) in enumerate(norm)
        if a is not None and a.shape[1] > 0 and h is False
    ]
    bcast = [
        i for i, (a, h) in enumerate(norm)
        if a is not None and a.shape[1] > 0 and h == 'b'
    ]
    halo = [
        i for i, (a, h) in enumerate(norm)
        if a is not None and a.shape[1] > 0 and h is True
    ]
    ins_c = [norm[i][0] for i in cent]
    ins_b = [norm[i][0] for i in bcast]
    ins_h = [norm[i][0] for i in halo]
    n_c, n_b, n_h = len(ins_c), len(ins_b), len(ins_h)
    n_sc, n_out = len(scalars), len(out_init)
    n_ali = sum(1 for a in out_init if not isinstance(a, int))
    gz = tz1 - tz0

    def kernel(*refs):
        k = 0
        sc_refs = refs[k : k + n_sc]; k += n_sc
        c_refs = refs[k : k + n_c]; k += n_c
        b_refs = refs[k : k + n_b]; k += n_b
        h_refs = refs[k : k + n_h]; k += n_h
        k += n_ali  # aliased init refs (unused)
        out_refs = refs[k : k + n_out]; k += n_out
        wins_h = refs[k : k + n_h]; k += n_h
        sems = refs[-1]

        p = pl.program_id(0)
        two = jnp.asarray(2, p.dtype)
        slot = jax.lax.rem(p, two)
        nslot = jax.lax.rem(p + jnp.asarray(1, p.dtype), two)

        def start(q, into):
            sz = (q + tz0) * TD - 1
            for i in range(n_h):
                pltpu.make_async_copy(
                    h_refs[i].at[pl.ds(sz, wz)],
                    wins_h[i].at[into],
                    sems.at[into, i],
                ).start()

        def wait(q, into):
            sz = (q + tz0) * TD - 1
            for i in range(n_h):
                pltpu.make_async_copy(
                    h_refs[i].at[pl.ds(sz, wz)],
                    wins_h[i].at[into],
                    sems.at[into, i],
                ).wait()

        @pl.when(p == 0)
        def _():
            start(p, slot)

        @pl.when(p + 1 < gz)
        def _():
            start(p + 1, nslot)

        wait(p, slot)

        # normalize to the plane-major compute convention: leading dims
        # are untiled, so the moveaxis is vreg shuffling (no HBM traffic)
        import os as _os

        raw = _os.environ.get("RYUJIN_ZM_RAW") == "1"  # measurement aid
        wins = [None] * len(ins)
        for j, i in enumerate(cent):
            x = c_refs[j][...]
            wins[i] = x if raw else jnp.moveaxis(x, 0, 1)
        for j, i in enumerate(bcast):
            wins[i] = b_refs[j][0]  # [planes, H, W], z-independent
        for j, i in enumerate(halo):
            x = wins_h[j][slot]
            wins[i] = x if raw else jnp.moveaxis(x, 0, 1)
        scal = [r[0, 0] for r in sc_refs]
        tv = _TileView(offsets, 1, 0, H, W, False, False, H, W,
                       lz=1, TD=TD, wz=wz)
        if raw:
            # measurement aid: bypass compute, touch one plane of each win
            acc = jnp.zeros((TD, H, W), dtype)
            for i, wv in enumerate(wins):
                if wv is not None and i not in bcast:
                    acc = acc + (
                        wv[:, 0] if wv.shape[0] == TD else wv[1 : 1 + TD, 0]
                    )
            outs = [
                jnp.broadcast_to(
                    acc[:, None],
                    (TD, a if isinstance(a, int) else a.shape[1], H, W),
                )
                for a in out_init
            ]
            for oref, val in zip(out_refs, outs):
                oref[...] = val
            return
        outs = compute(wins, scal, tv)
        for oref, val in zip(out_refs, outs):
            oref[...] = jnp.moveaxis(val, 0, 1)

    init_arrays = [a for a in out_init if not isinstance(a, int)]
    out_shape = [
        jax.ShapeDtypeStruct((D, a, H, W), dtype)
        if isinstance(a, int)
        else jax.ShapeDtypeStruct(a.shape, a.dtype)
        for a in out_init
    ]
    in_specs = (
        [pl.BlockSpec((1, 1), lambda tz: (0, 0),
                      memory_space=pltpu.SMEM)] * n_sc
        + [
            pl.BlockSpec(
                (TD, a.shape[1], H, W),
                lambda tz, _tz0=tz0: (tz + _tz0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for a in ins_c
        ]
        + [
            # z-independent broadcast block: constant index -> fetched
            # once, VMEM-resident across the grid
            pl.BlockSpec(
                (1, a.shape[1], H, W),
                lambda tz: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for a in ins_b
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_h
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_ali  # aliased inits
    )
    out_specs = [
        pl.BlockSpec(
            (TD, a if isinstance(a, int) else a.shape[1], H, W),
            lambda tz, _tz0=tz0: (tz + _tz0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for a in out_init
    ]
    scratch = [
        # window scratch follows each array's own trailing dims: canvas
        # arrays are [D, planes, H, W], the separable z-profiles are
        # [D, PF, 1, 128]
        pltpu.VMEM((2, wz) + tuple(a.shape[1:]), dtype) for a in ins_h
    ] + [pltpu.SemaphoreType.DMA((2, max(n_h, 1)))]
    aliases = {}
    a_idx = 0
    for o, a in enumerate(out_init):
        if not isinstance(a, int):
            aliases[n_sc + n_c + n_b + n_h + a_idx] = o
            a_idx += 1
    return pl.pallas_call(
        kernel,
        grid=(gz,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *[jnp.reshape(x, (1, 1)) for x in scalars],
        *ins_c,
        *ins_b,
        *ins_h,
        *init_arrays,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasArrays:
    """Static canvas arrays, passed as a traced pytree through the jit
    boundary (embedding them as closure constants bloats the serialized
    module past the remote-compile size limit and triggers XLA
    constant-folding over the whole mesh)."""

    g_cij: jax.Array
    g_mask: jax.Array
    g_cmax: jax.Array
    g_mij: jax.Array
    g_cii: jax.Array
    g_node: jax.Array
    g_lam: jax.Array  # 1/n_nbrs, the only node field PK4/PK5 read
    node_mask_flat: jax.Array
    m_lumped_flat: jax.Array
    # separable-statics factors (offline/separable.py), None when the
    # mesh is not an extrusion along the canvas major axis:
    #   g_sep2 [1, P2, H, W]: stacked 2D fields (cij / mij / mask / cii)
    #   f_sepz [D, PF, 1, 128]: per-offset z-profiles (lane-broadcast)
    g_sep2: Optional[jax.Array] = None
    f_sepz: Optional[jax.Array] = None
    # dG incidence canvas [K, *canvas]; None for a continuous ansatz:
    g_inc: Optional[jax.Array] = None


@dataclasses.dataclass
class _SA:
    """Per-tile static stencil arrays handed to the phase functions."""

    cij: jax.Array
    cij_t: jax.Array
    mij: jax.Array
    mask: jax.Array
    cii: jax.Array
    m_lumped: jax.Array
    m_lumped_inv: jax.Array
    n_nbrs: jax.Array
    node_mask: jax.Array
    measure_inv: float
    # dG incidence beta_ij [K, *tile] (None for a continuous ansatz):
    incidence: Optional[jax.Array] = None


class _SepTile:
    """Per-tile static-field synthesizer from separable factors.

    g2: [P2, H, W] stacked 2D fields (VMEM-resident broadcast block),
    fz: z-profile halo window [PF, wz, 1, 128] (after the z-major
    moveaxis).  Each per-offset static field is one broadcast multiply
    f[z-slice] * g[in-plane roll] — replacing a [TD, H, W] HBM plane
    read per offset per kernel (offline/separable.py)."""

    def __init__(self, ps, w_g2, w_fz, tv):
        self.g2, self.fz, self.tv = w_g2, w_fz, tv
        self.K, self.dim = ps.K, ps.dim
        self.offsets = ps.offsets
        K, d, K2D = self.K, self.dim, 9
        self._sp_mij = K2D * d
        self._sp_mask = K2D * (d + 1)
        self._sp_cii = K2D * (d + 2)
        self._fp_mij = K * d
        self._fp_mask = K * (d + 1)
        self._fp_cii = K * (d + 2)

    def _f(self, p, dz=0):
        lz = self.tv.lz  # 1: window planes [0, TD+2), center at [1, TD+1)
        return self.fz[p, lz + dz : lz + dz + self.tv.TD, :, :1]

    def _g(self, q, dy=0, dx=0):
        x = self.g2[q]
        if dy:
            x = pltpu.roll(x, (-dy) % x.shape[-2], axis=x.ndim - 2)
        if dx:
            x = pltpu.roll(x, (-dx) % x.shape[-1], axis=x.ndim - 1)
        return x

    def _q(self, k):
        dz, dy, dx = self.offsets[k]
        return (dy + 1) * 3 + (dx + 1), dz, dy, dx

    def cij_k(self, k):
        q, _, _, _ = self._q(k)
        d = self.dim
        return jnp.stack(
            [self._f(k * d + c) * self._g(q * d + c) for c in range(d)]
        )

    def mij_k(self, k):
        q, _, _, _ = self._q(k)
        return self._f(self._fp_mij + k) * self._g(self._sp_mij + q)

    def mask_k(self, k):
        q, _, _, _ = self._q(k)
        return self._f(self._fp_mask + k) * self._g(self._sp_mask + q)

    def cii(self):
        return jnp.stack([
            self._f(self._fp_cii + c) * self._g(self._sp_cii + c)
            for c in range(self.dim)
        ])

    def cmax_k(self, k):
        """max(|c_ij|, |c_ji|): |c_k| at the center node vs |c_{K-1-k}|
        at the off_k neighbor (z via the profile halo, in-plane via
        rolls — the same wrap semantics as the precomputed canvas)."""
        q, dz, dy, dx = self._q(k)
        d = self.dim
        kt = self.K - 1 - k
        qt, _, _, _ = self._q(kt)
        ni = nj = None
        for c in range(d):
            a = self._f(k * d + c) * self._g(q * d + c)
            b = self._f(kt * d + c, dz=dz) * self._g(qt * d + c, dy, dx)
            ni = a * a if ni is None else ni + a * a
            nj = b * b if nj is None else nj + b * b
        return jnp.maximum(jnp.sqrt(ni), jnp.sqrt(nj))


class PallasStepper:
    """Orchestrates the five fused kernels for HyperbolicModule.step."""

    def __init__(
        self,
        eq,
        params,
        sd: StructuredData,
        dtype=jnp.float32,
        tile: Tuple[int, int] = (16, 256),
        interpret: bool = False,
    ):
        assert sd.dim in (2, 3), "pallas backend supports 2D/3D canvases"
        self.eq = eq
        self.params = params
        self.dtype = dtype
        self.interpret = interpret
        self.canvas = tuple(sd.shape)  # (H, W) or (D, H, W)
        self.H, self.W = self.canvas[-2], self.canvas[-1]
        self.D = self.canvas[0] if sd.dim == 3 else None
        self.offsets = tuple(map(tuple, sd.offsets))
        self.K = sd.max_degree
        self.dim = sd.dim
        self.measure_inv = float(1.0 / sd.measure_of_omega)
        # stencil reach: 1 for Q1, p for the Qp node lattice.  The 2D
        # row-tiled kernels support any reach <= TH (their windows span
        # 3*TH rows and x-neighbors are lane rolls); the 3D kernels'
        # windows carry a one-plane z halo, so 3D is reach-1 only:
        self.reach = max(abs(o) for off in self.offsets for o in off)
        if sd.dim == 3 and self.reach > 1:
            raise ValueError(
                "3D pallas kernels support stencil reach 1 only (cG Q1 / "
                "dG Q0-Q1 node lattices); use the XLA backend"
            )

        # Row tiles of 8 with full canvas width: the 8-row masked margins
        # (offline/structured.py) guarantee that halo windows of tiles
        # containing real nodes stay in bounds (all-margin tiles clamp,
        # which is harmless — their nodes are masked).  x-neighbors use
        # lane rolls of the full-width window (correct for periodic-x and
        # masked otherwise).  3D adds TD-plane z slabs with a one-plane
        # z halo on the windows.
        del tile
        import os

        # second-generation 3D path: full-cross-section z-slab tiles +
        # slot-streaming kernels (no [K, tile] stacks).  Euler-family
        # equations only; RYUJIN_SLAB3D=0 falls back to the y-tiled
        # stacked kernels.  Decided up front because the slab tiling has
        # much weaker margin requirements (TD z-planes + 1 y-row instead
        # of 8-row y margins), cf. pallas_default_margin.
        self.stream_capable = (
            hasattr(eq, "indicator_accum")
            and hasattr(eq, "limiter_bounds_accum")
            and not getattr(eq, "have_source_terms", False)
            and not getattr(eq, "have_equilibrated_states", False)
            and not getattr(eq, "have_high_order_flux", False)
            and not getattr(eq, "limiter_needs_fluxes", False)
        )
        self.slab3d = (
            sd.dim == 3
            and self.stream_capable
            and sd.incidence is None  # dG factor not streamed
            # extruded multi-block gmap refresh is implemented for the
            # plane-major stacked path only:
            and getattr(sd, "gmap_edge_z", None) is None
            and os.environ.get("RYUJIN_SLAB3D", "1") != "0"
        )

        TH = int(os.environ.get("RYUJIN_TILE_H", "8"))
        TW = self.W
        if not self.interpret and self.W % 128:
            raise ValueError(
                f"canvas minor axis {self.W} not lane-aligned (128): the "
                "compiled kernels' halo-window DMAs require it (periodic-x "
                "meshes need a period that is a multiple of 128); use the "
                "XLA backend (cf. pallas_supports)"
            )
        if self.H % (8 if self.slab3d else TH):
            raise ValueError(f"canvas height {self.H} not a multiple of {TH}")
        if not self.slab3d and sd.margins[-2] < TH and self.H // TH > 1:
            raise ValueError(
                "pallas backend needs >=8-row canvas margins "
                "(pack_structured(margin=8))"
            )
        if self.slab3d and sd.margins[-2] < 1:
            raise ValueError("3D slab pallas needs >=1-row y margins")
        self.TH, self.TW = TH, TW
        if self.dim == 3:
            if self.slab3d:
                TD = _tile_d_default()
            elif "RYUJIN_TILE_D" in os.environ:
                TD = int(os.environ["RYUJIN_TILE_D"])
            else:
                # stacked path: the z-tile depth must not exceed the
                # packed z margin (tile_planes needs one masked tile of
                # slack above) — extruded multi-block canvases pack
                # 2-plane z margins (pack_multiblock_extruded), plain
                # boxes 8; also stay a divisor of the canvas depth:
                TD = 8
                while TD > 1 and (sd.margins[0] < TD or self.D % TD):
                    TD //= 2
            if self.D % TD:
                raise ValueError(
                    f"canvas depth {self.D} not a multiple of {TD}"
                )
            if sd.margins[0] < (TD if self.slab3d else 1):
                raise ValueError(
                    "3D pallas needs masked z margins (>= TD planes for "
                    "the z-slab kernels; pack_structured margin=(TD, 1+))"
                )
            self.TD = TD
            self.tile = (TD, TH, TW)
        else:
            self.TD = None
            self.tile = (TH, TW)

        H, W = self.H, self.W
        dim, K = self.dim, self.K
        canvas = self.canvas
        caxes = tuple(range(len(canvas)))

        def canv(x, planes):
            a = np.ascontiguousarray(x).reshape((planes,) + canvas)
            if self.slab3d:
                # z-major [D, planes, H, W]: one contiguous chunk per
                # kernel window / center block (_tiled_call_3d_slab)
                a = np.ascontiguousarray(np.moveaxis(a, 0, 1))
            return jnp.asarray(a, dtype)

        # separable statics: when the mesh is an extrusion along the
        # canvas major axis (3D box, o-grid x z, any tensor-product
        # lattice), c_ij / m_ij / mask / cii factor exactly into 2D
        # fields x z-profiles; the slab kernels then synthesize them in
        # VMEM instead of streaming ~130 [D, H, W] static planes from
        # HBM per substep, and the full canvases are never materialized
        # (offline/separable.py).  RYUJIN_SEP=1 opts in; measured A/B at
        # 2.09M nodes / 1.55 GB statics (PERF_r05 sep_{off,on}_2M_deepz:
        # 68.1 vs 66.3 MQ/s) shows the throughput win never materializes
        # even above the former ~1 GB auto threshold — the slab kernels
        # are not bandwidth-bound at the margin, so the in-kernel
        # synthesis VPU cost wins out.  Kept opt-in for its real -414 MB
        # / -26% HBM *capacity and traffic* savings (meshes that
        # otherwise do not fit), not as a throughput knob:
        self.sep = None
        sep_env = os.environ.get("RYUJIN_SEP", "0")
        want_sep = sep_env == "1"
        if self.slab3d and want_sep:
            from ..offline.separable import separate_z

            self.sep = separate_z(sd)

        def canv_or_empty(build, planes):
            if self.sep is not None:
                return jnp.zeros(
                    (canvas[0], 0) + canvas[1:] if self.slab3d
                    else (0,) + canvas,
                    dtype,
                )
            return canv(build(), planes)

        # static canvases (device-resident, built once):
        cij = np.moveaxis(
            sd.cij.reshape(canvas + (K, dim)), (-1, -2), (0, 1)
        )  # [dim, K, *canvas]

        def build_cmax():
            # cmax[k] = max(|c_ij|, |c_ji|): the transposed coefficient
            # lives at plane K-1-k of the off_k neighbor (symmetric d):
            norm_c = np.linalg.norm(cij, axis=0)  # [K, *canvas]
            cmax = norm_c.copy()
            for k, off in enumerate(self.offsets):
                rolled = np.roll(
                    norm_c[K - 1 - k], tuple(-o for o in off), axis=caxes
                )
                cmax[k] = np.maximum(cmax[k], rolled)
            return cmax

        lumped = sd.lumped_mass.reshape((1,) + canvas)
        self.arrays = PallasArrays(
            g_cij=canv_or_empty(lambda: cij, dim * K),
            g_mask=canv_or_empty(
                lambda: np.moveaxis(sd.mask, -1, 0), K
            ),
            g_cmax=canv_or_empty(build_cmax, K),
            g_mij=canv_or_empty(
                lambda: np.moveaxis(sd.mij, -1, 0), K
            ),
            g_cii=canv_or_empty(lambda: np.moveaxis(sd.cii, -1, 0), dim),
            g_node=canv(
                np.concatenate(
                    [
                        lumped,
                        1.0 / lumped,
                        sd.n_nbrs.reshape((1,) + canvas),
                        sd.node_mask.reshape((1,) + canvas),
                        (sd.node_mask if sd.value_mask is None
                         else sd.value_mask).reshape((1,) + canvas),
                    ],
                    axis=0,
                ),
                5,
            ),
            g_lam=canv(
                np.where(sd.n_nbrs > 0, 1.0 / np.maximum(sd.n_nbrs, 1), 1.0)
                .reshape((1,) + canvas),
                1,
            ),
            node_mask_flat=jnp.asarray(sd.node_mask, dtype),
            m_lumped_flat=jnp.asarray(sd.lumped_mass, dtype),
            g_inc=(
                None if sd.incidence is None
                else canv(np.moveaxis(sd.incidence, -1, 0), K)
            ),
        )

        if self.sep is not None:
            sep = self.sep
            D = canvas[0]
            g2 = np.concatenate([
                sep.g_cij.reshape(9 * dim, H, W),
                sep.g_mij, sep.g_mask, sep.g_cii,
            ], axis=0)[None]
            fz = np.concatenate([
                sep.f_cij.reshape(K * dim, D),
                sep.f_mij, sep.f_mask, sep.f_cii,
            ], axis=0)
            fzb = np.broadcast_to(
                fz.T[:, :, None, None], (D, fz.shape[0], 1, 128)
            )
            self.arrays = dataclasses.replace(
                self.arrays,
                g_sep2=jnp.asarray(g2, dtype),
                f_sepz=jnp.asarray(np.ascontiguousarray(fzb), dtype),
            )

        # set by HyperbolicModule when the equation's Riemann solve is
        # symmetric (lambda fixup at coupling boundary pairs; interface
        # fixup + half-canvas refresh map for the multi-block half-slot
        # path):
        self.lambda_fixup = None
        self.interface_fixup = None
        self.gmap_edge_half = None
        self.sym_enabled = True  # cleared by HyperbolicModule when the
        #                          boundary-pair fixup set is too large
        # extraordinary-vertex side rows (hyperbolic.Sideband), applied
        # as XLA glue between the kernels:
        self.sideband = None

        # multi-chip: set by parallel.sharding.shard_pallas_module —
        # kernels then run per-device under shard_map over the slab axis
        self.device_mesh = None
        self.mesh_axis = None

        # ghost bands of periodic leading axes (offline/structured.py):
        # dynamic canvases are refreshed before every halo-reading kernel
        self.ghost_bands = tuple(
            getattr(sd, "ghosts", ()) or (None,) * len(canvas)
        )
        self.slab_spec = getattr(sd, "slab_spec", None)
        # multi-block cross-interface refresh maps (offline/multiblock.py),
        # dst-sorted so the refresh scatters can claim sorted+unique:
        gm_n = getattr(sd, "gmap_node", None)
        gm_e = getattr(sd, "gmap_edge", None)
        self.gmap_node = None if gm_n is None else _sorted_map(gm_n)
        self.gmap_edge = None if gm_e is None else _sorted_map(gm_e)
        # z-vectorized maps of extruded multi-block canvases:
        gm_nz = getattr(sd, "gmap_node_z", None)
        gm_ez = getattr(sd, "gmap_edge_z", None)
        self.gmap_node_z = (
            None if gm_nz is None
            else tuple(jnp.asarray(np.asarray(a), jnp.int32)
                       for a in gm_nz)
        )
        self.gmap_edge_z = (
            None if gm_ez is None
            else tuple(jnp.asarray(np.asarray(a), jnp.int32)
                       for a in gm_ez)
        )
        self.multiblock = (
            self.gmap_edge is not None or self.gmap_edge_z is not None
        )
        self.minor_wrap = getattr(sd, "minor_wrap", None)
        self._have_ghosts = (
            any(g is not None for g in self.ghost_bands)
            or self.slab_spec is not None
            or self.gmap_node is not None
            or self.gmap_node_z is not None
            or self.minor_wrap is not None
        )

        # interior tile-row range (tiles containing real nodes); the masked
        # margins guarantee t0 >= 1 and one tile of slack below:
        nm = sd.node_mask.reshape(canvas)
        rows_with_nodes = np.flatnonzero(
            nm.any(axis=tuple(a for a in caxes if a != len(canvas) - 2))
        )
        r0, r1 = int(rows_with_nodes[0]), int(rows_with_nodes[-1]) + 1
        self.tile_rows = (r0 // self.TH, (r1 - 1) // self.TH + 1)
        # per-axis-0-row content flags (slab canvases trim trailing
        # rounding-pad tiles from the grid enumeration in step()):
        self._row_has_content = np.asarray(
            nm.any(axis=tuple(a for a in caxes if a != 0))
        )
        if not self.slab3d and (
            self.tile_rows[0] < 1
            or self.tile_rows[1] * self.TH + self.TH > H
        ):
            raise ValueError(
                "pallas backend needs >=8-row masked canvas margins "
                "(pack_structured(margin=8))"
            )
        if self.dim == 3:
            planes_with_nodes = np.flatnonzero(nm.any(axis=(1, 2)))
            z0, z1 = (
                int(planes_with_nodes[0]), int(planes_with_nodes[-1]) + 1
            )
            self.z_planes = (z0, z1)
            self.tile_planes = (z0 // self.TD, (z1 - 1) // self.TD + 1)
            # windows need one z-halo plane on each side:
            if (
                self.tile_planes[0] * self.TD < 1
                or self.tile_planes[1] * self.TD + 1 > self.D
            ):
                raise ValueError(
                    "3D pallas needs z margins >= TD planes "
                    "(pack_structured(margin=(TD, 1+)))"
                )
        else:
            self.z_planes = None
            self.tile_planes = None

    # -- helpers ----------------------------------------------------------
    def _d_win_sym(self, w_lam, cmax_t, mask, tv):
        """d from the half-slot wavespeed halo window.

        The slot k >= K/2 value is the K-1-k plane of the (dy, dx)
        neighbor (one Riemann solve per undirected edge).  cmax_t=None
        means the canvas is PRE-SCALED (PK1 folded max(|c_ij|, |c_ji|)
        into its output, so the window holds d directly — cmax_k(i) ==
        cmax_{K-1-k}(j) makes the transposed read exact); otherwise the
        window holds raw lambda and is scaled here."""
        tvd = self._derived_view(tv)
        lam_win = self._win(w_lam, tv)
        K = self.K
        K2 = K // 2
        lam_c = tvd.center(lam_win)  # [K2, *tile]
        lam_T = jnp.stack([
            tvd._slot(lam_win, K - 1 - k, off)
            for k, off in list(enumerate(self.offsets))[K2:]
        ])
        lam_full = jnp.concatenate([lam_c, lam_T], axis=0)
        if cmax_t is not None:
            lam_full = lam_full * cmax_t
        return jnp.where(mask > 0, lam_full, jnp.zeros_like(lam_full))

    def _d_win(self, w_e, mask, tv):
        """Graph viscosity d = max(e_ij, e_ji) from the e halo window.

        e_ji is the transposed-edge slot: plane K-1-k of the (dy, dx)
        neighbor.  Computing d per tile (instead of materializing the
        8-plane d canvas in an XLA fusion) removes one full HBM round
        trip; the where() guards the uninitialized margins of e exactly
        like hyperbolic.d_from_e."""
        tvd = self._derived_view(tv)
        e_win = self._win(w_e, tv)
        K = self.K
        e_c = tvd.center(e_win)
        e_T = jnp.stack([
            tvd._slot(e_win, K - 1 - k, off)
            for k, off in enumerate(self.offsets)
        ])
        return jnp.where(
            mask > 0, jnp.maximum(e_c, e_T), jnp.zeros_like(e_c)
        )

    def _derived_mask(self, w_node, tv):
        """Edge mask from mask products: mask[k] = nm_i * vm_j.

        Saves the K-plane g_mask read.  The neighbor factor is the VALUE
        mask (real + ghost rows): an edge from a real node into a ghost
        band (periodic wrap) is live and reads the refreshed ghost value.
        False extra edges (canvas-adjacent real nodes without a mesh edge,
        e.g. across the re-entrant step corner) carry c_ij = m_ij = 0, so
        every flux/viscosity/limiter term they enter vanishes; only the
        limiter *bounds* accumulation (a pure min/max over the stencil)
        distinguishes them — PK2 keeps the exact g_mask for that reason."""
        tvd = self._derived_view(tv)
        nm_win = self._win(w_node, tv)[3:5]
        nm_c = tvd.center(nm_win)[0]  # node_mask plane
        vm_j = tvd.nbr(nm_win)[1]  # value_mask plane, [K, *tile]
        return nm_c[None] * vm_j

    def _sa(self, tv, w_cij, w_mask, w_mij, w_cii, w_node, mask_arr=None,
            w_inc=None):
        c = tv.center
        dim, K = self.dim, self.K
        node = c(w_node) if w_node is not None else None
        return _SA(
            cij=c(w_cij).reshape((dim, K) + self.tile)
            if w_cij is not None
            else None,
            cij_t=None,
            mij=c(w_mij) if w_mij is not None else None,
            mask=mask_arr if mask_arr is not None else c(w_mask),
            cii=c(w_cii) if w_cii is not None else None,
            m_lumped=node[0] if node is not None else None,
            m_lumped_inv=node[1] if node is not None else None,
            n_nbrs=node[2] if node is not None else None,
            node_mask=node[3] if node is not None else None,
            measure_inv=self.measure_inv,
            incidence=c(w_inc) if w_inc is not None else None,
        )

    def _win(self, w_ref, tv):
        """The live (TH+2*reach)-row slice of a halo window ref: the rows
        a (dy in {-reach..reach}) slot of the tile (at ly = tv.ly)
        addresses.  Slice the ref ONCE and index the result with
        `_derived_view`.  3D windows keep their (already minimal) TD+2 z
        extent (3D is reach-1 only); z-slab windows (halo_y False:
        full-height tiles, y via rolls) keep the full y extent."""
        r = self.reach
        if tv.TD is not None:
            ys = (
                slice(tv.ly - r, tv.ly + self.TH + r)
                if tv.halo_y
                else slice(None)
            )
            return w_ref[:, tv.lz - 1 : tv.lz + tv.TD + 1, ys, :]
        return w_ref[:, tv.ly - r : tv.ly + self.TH + r, :]

    def _derived_view(self, tv):
        """A _TileView addressing a `_win`-sliced array (tile at row
        `reach`)."""
        r = self.reach
        return _TileView(tv.offsets, r if tv.halo_y else tv.ly, tv.lx,
                         tv.TH, tv.TW, tv.halo_x, tv.halo_y, tv.wy, tv.wx,
                         lz=(None if tv.TD is None else 1), TD=tv.TD)

    def _flux_win(self, w_U, tv, pl0=0):
        """Evaluate the flux tensor once on the halo window (planes
        [pl0, pl0+C) of the ref); return the center [C, dim, *tile] and
        neighbor [C, dim, K, *tile] views."""
        C, dim, K = self.eq.n_comp, self.dim, self.K
        tvd = self._derived_view(tv)
        win = self._win(w_U[pl0 : pl0 + C], tv)
        f_win = self.eq.f(win)  # [C, dim, (TD+2,) TH+2, TW]
        f_pl = f_win.reshape((C * dim,) + f_win.shape[2:])
        f_i = tvd.center(f_pl).reshape((C, dim) + self.tile)
        f_j = tvd.nbr(f_pl).reshape((C, dim, K) + self.tile)
        return f_i, f_j

    def _stage_flux_fns(self, w_sU, tv, S, C):
        """Per-stage lazy flux-window thunks for _stage_terms."""
        return [
            (lambda s=s: self._flux_win(w_sU, tv, pl0=s * C))
            for s in range(S)
        ]

    def _stage_views(self, tv, w_stageU, w_stageP, S, C, P):
        tile = self.tile
        if S == 0:
            z = jnp.zeros((0, C) + tile, self.dtype)
            zj = jnp.zeros((0, C, self.K) + tile, self.dtype)
            zp = jnp.zeros((0, max(P, 1)) + tile, self.dtype)[:, :P]
            zpj = jnp.zeros(
                (0, max(P, 1), self.K) + tile, self.dtype
            )[:, :P]
            return z, zp, zj, zpj
        sU = tv.center(w_stageU).reshape((S, C) + tile)
        sUj = tv.nbr(w_stageU).reshape((S, C, self.K) + tile)
        if P:
            sP = tv.center(w_stageP).reshape((S, P) + tile)
            sPj = tv.nbr(w_stageP).reshape((S, P, self.K) + tile)
        else:
            sP = jnp.zeros((S, 0) + tile, self.dtype)
            sPj = jnp.zeros((S, 0, self.K) + tile, self.dtype)
        return sU, sP, sUj, sPj

    def _refresh(self, X):
        """Copy wrapped real rows into the ghost bands of [planes, *canvas].

        Applied to every dynamic canvas before a kernel halo-reads it
        (periodic leading axes only; a no-op otherwise).  The margin-sized
        dynamic-update-slices are negligible next to the kernel traffic —
        this is the XLA-SPMD rendition of the reference's ghost-row
        update_ghost_rows_{start,finish} (sparse_matrix_simd.h:651-771)."""
        if not self._have_ghosts or X.shape[0] == 0:
            return X
        if os.environ.get("RYUJIN_REFRESH_ABLATE") == "1":
            # measurement aid: skip all ghost refreshes (results WRONG);
            # isolates the refresh-copy share of the slab machinery tax
            return X
        if self.gmap_node is not None:
            dst, src = self.gmap_node
            Xf = X.reshape(X.shape[0], -1)
            X = Xf.at[:, dst].set(
                Xf[:, src], unique_indices=True, indices_are_sorted=True
            ).reshape(X.shape)
        if self.gmap_node_z is not None:
            # extruded multi-block: one cross-section map per z plane
            dst2, src2 = self.gmap_node_z
            D = self.canvas[0]
            n2p = self.canvas[1] * self.canvas[2]
            Xr = X.reshape(X.shape[0], D, n2p)
            X = Xr.at[:, :, dst2].set(
                Xr[:, :, src2],
                unique_indices=True, indices_are_sorted=True,
            ).reshape(X.shape)
        if self.slab_spec is not None:
            # cyclic roll along the slab axis — a collective-permute when
            # that axis is sharded over the device mesh.  Only the `reach`
            # innermost rows of each g-row ghost band are ever read by the
            # kernels (tile windows reach at most `reach` rows past the
            # real range), so only those are copied — an 8x cut of the
            # refresh traffic (and of the ICI halo volume when sharded)
            # versus refreshing the full band.
            n_sl, Ls, g = self.slab_spec
            r = self.reach
            A = Ls + 2 * g
            Xs = X.reshape(X.shape[:1] + (n_sl, A) + self.canvas[1:])
            top = jnp.roll(
                jax.lax.slice_in_dim(Xs, g + Ls - r, g + Ls, axis=2),
                1, axis=1,
            )
            bot = jnp.roll(
                jax.lax.slice_in_dim(Xs, g, g + r, axis=2), -1, axis=1
            )
            Xs = jax.lax.dynamic_update_slice_in_dim(Xs, top, g - r, 2)
            Xs = jax.lax.dynamic_update_slice_in_dim(Xs, bot, g + Ls, 2)
            X = Xs.reshape(X.shape[:1] + self.canvas)
        for ax, gh in enumerate(self.ghost_bands):
            if gh is None:
                continue
            g, P = gh
            a = 1 + ax
            top = jax.lax.slice_in_dim(X, P, P + g, axis=a)
            bot = jax.lax.slice_in_dim(X, g, 2 * g, axis=a)
            X = jax.lax.dynamic_update_slice_in_dim(X, top, 0, a)
            X = jax.lax.dynamic_update_slice_in_dim(X, bot, g + P, a)
        if self.minor_wrap is not None:
            # periodic minor axis on a padded canvas: 2*reach ghost
            # columns realize the identification (offline/structured.py)
            P, W = self.minor_wrap
            r = self.reach
            a = X.ndim - 1
            c0 = jax.lax.slice_in_dim(X, 0, r, axis=a)
            X = jax.lax.dynamic_update_slice_in_dim(X, c0, P, a)
            cP = jax.lax.slice_in_dim(X, P - r, P, axis=a)
            X = jax.lax.dynamic_update_slice_in_dim(X, cP, W - r, a)
        return X

    def _refresh_zm(self, X):
        """Ghost refresh of a z-major canvas [D, planes, H, W] (the 3D
        slab layout): canvas axes are array axes (0, 2, 3), planes sit at
        axis 1.  Multi-block gmaps don't exist in 3D; bands, the slab
        decomposition and the periodic minor wrap are handled like
        `_refresh`."""
        if not self._have_ghosts or X.shape[1] == 0:
            return X
        if self.slab_spec is not None:
            # reach-row refresh, exactly as in _refresh: only the `reach`
            # innermost planes of each ghost band are read by the z-slab
            # windows
            n_sl, Ls, g = self.slab_spec
            r = self.reach
            A = Ls + 2 * g
            Xs = X.reshape((n_sl, A) + X.shape[1:])
            top = jnp.roll(
                jax.lax.slice_in_dim(Xs, g + Ls - r, g + Ls, axis=1),
                1, axis=0,
            )
            bot = jnp.roll(
                jax.lax.slice_in_dim(Xs, g, g + r, axis=1), -1, axis=0
            )
            Xs = jax.lax.dynamic_update_slice_in_dim(Xs, top, g - r, 1)
            Xs = jax.lax.dynamic_update_slice_in_dim(Xs, bot, g + Ls, 1)
            X = Xs.reshape(X.shape)
        for ax, gh in enumerate(self.ghost_bands):
            if gh is None:
                continue
            g, P = gh
            a = 0 if ax == 0 else 1 + ax  # canvas axes (0, 2, 3)
            top = jax.lax.slice_in_dim(X, P, P + g, axis=a)
            bot = jax.lax.slice_in_dim(X, g, 2 * g, axis=a)
            X = jax.lax.dynamic_update_slice_in_dim(X, top, 0, a)
            X = jax.lax.dynamic_update_slice_in_dim(X, bot, g + P, a)
        if self.minor_wrap is not None:
            P, W = self.minor_wrap
            r = self.reach
            a = X.ndim - 1
            c0 = jax.lax.slice_in_dim(X, 0, r, axis=a)
            X = jax.lax.dynamic_update_slice_in_dim(X, c0, P, a)
            cP = jax.lax.slice_in_dim(X, P - r, P, axis=a)
            X = jax.lax.dynamic_update_slice_in_dim(X, cP, W - r, a)
        return X

    def _refresh_edge(self, E):
        """Refresh ghost values of an edge canvas [K, *canvas].

        Band/slab ghosts copy whole rows (uniform slot layout, per-plane
        node refresh); multi-block ghosts apply the reader-frame slot
        permutation gmap_edge over the flattened [K * n] layout."""
        if self.gmap_edge is not None:
            dst, src = self.gmap_edge
            Ef = E.reshape(-1)
            return Ef.at[dst].set(
                Ef[src], unique_indices=True, indices_are_sorted=True
            ).reshape(E.shape)
        if self.gmap_edge_z is not None:
            # extruded multi-block: z-preserving slot permutation — a
            # batched (vmapped over z) scatter of D-length rows; then
            # the z ghost-band copies for periodic extrusions:
            kd, cd, ks, cs = self.gmap_edge_z
            K = E.shape[0]
            D = self.canvas[0]
            n2p = self.canvas[1] * self.canvas[2]
            E4 = E.reshape(K, D, n2p)

            def _sc(x):  # [K, n2p]
                return x.at[kd, cd].set(
                    x[ks, cs],
                    unique_indices=True, indices_are_sorted=True,
                )

            E4 = jax.vmap(_sc, in_axes=1, out_axes=1)(E4)
            E = E4.reshape(E.shape)
            # z band rolls (gmap_node_z must NOT re-apply to edge slots):
            save = self.gmap_node_z
            self.gmap_node_z = None
            try:
                E = self._refresh(E)
            finally:
                self.gmap_node_z = save
            return E
        return self._refresh(E)

    def _refresh_edge_half(self, E):
        """Ghost refresh of the HALF lambda canvas [K/2, *canvas]
        (multi-block symmetric path): only the gmap_edge entries whose
        destination and source slots both live in the computed half;
        broken routes are covered by interface_fixup instead."""
        if self.gmap_edge_half is None:
            return self._refresh(E)
        dst, src = self.gmap_edge_half
        Ef = E.reshape(-1)
        return Ef.at[dst].set(
            Ef[src], unique_indices=True, indices_are_sorted=True
        ).reshape(E.shape)

    def _call(self, tiled_call, compute, ins, scalars, out_init, common):
        """Dispatch one fused kernel — directly, or per-device under
        shard_map when a device mesh is attached.

        Sharded mode: the canvas leading axis is n_dev uniform ghost-banded
        slabs (StructuredData.slab_spec); each device runs the kernel on
        its local [planes, A_loc, ...] slab with uniform interior tile
        ranges.  The XLA glue between kernels (ghost refresh via slab-axis
        roll, tau/ok reductions, lambda fixup) stays in global-array land
        where GSPMD partitions it — the refresh roll becomes the
        collective-permute halo exchange of SURVEY.md §5.7."""
        if TRAFFIC_LOG is not None:
            _traffic_account(
                tiled_call, getattr(compute, "__name__", "kernel"),
                ins, out_init, common, np.dtype(self.dtype).itemsize,
            )
        if self.device_mesh is None:
            return tiled_call(compute, ins, scalars, out_init, **common)
        from jax.sharding import PartitionSpec
        from jax import shard_map

        n_sl, Ls, g = self.slab_spec
        A = Ls + 2 * g
        ax = self.mesh_axis
        lc = dict(common)
        if self.dim == 3:
            TD = lc.get("TD", self.TD)
            lc["D"] = A
            lc["tile_planes"] = (1, A // TD - 1)
        else:
            lc["H"] = A
            lc["tile_rows"] = (1, A // self.TH - 1)
            lc.pop("slab_tiles", None)  # per-device slabs: plain range

        norm = [(a, True) if not isinstance(a, tuple) else a for a in ins]
        vals = [a for a, _ in norm]
        flags = [h for _, h in norm]
        present = [v is not None for v in vals]
        arrs = tuple(v for v in vals if v is not None)
        init_arrays = tuple(a for a in out_init if not isinstance(a, int))

        zmajor = self.dim == 3 and self.slab3d

        def cspec(x, flag=True):
            if flag == 'b':  # z-independent broadcast block: replicate
                return PartitionSpec(*([None] * x.ndim))
            if zmajor:  # z-major [D, planes, H, W]: slab axis IS axis 0
                return PartitionSpec(ax, *([None] * (x.ndim - 1)))
            return PartitionSpec(None, ax, *([None] * (x.ndim - 2)))

        def local_fn(arrs_l, scal_l, inits_l):
            it = iter(arrs_l)
            ins_l = []
            for pres, flag in zip(present, flags):
                v = next(it) if pres else None
                ins_l.append(v if flag is True else (v, flag))
            it2 = iter(inits_l)
            out_l = [
                a if isinstance(a, int) else next(it2) for a in out_init
            ]
            return tuple(
                tiled_call(compute, ins_l, list(scal_l), out_l, **lc)
            )

        out = shard_map(
            local_fn,
            mesh=self.device_mesh,
            in_specs=(
                tuple(
                    cspec(a, f)
                    for a, f in zip(vals, flags) if a is not None
                ),
                tuple(PartitionSpec() for _ in scalars),
                tuple(cspec(a) for a in init_arrays),
            ),
            out_specs=tuple(
                PartitionSpec(ax, *([None] * len(self.canvas)))
                if zmajor
                else PartitionSpec(
                    None, ax, *([None] * (len(self.canvas) - 1))
                )
                for _ in out_init
            ),
            check_vma=False,
        )(arrs, tuple(scalars), init_arrays)
        return out

    def _pk1_stream(self, wins, scal, tv, sym, prescale=False):
        """Slot-streaming PK1: per-offset slices + running EVC sums
        instead of [K, tile] neighbor stacks.  Identical math to
        hyp.phase_e_alpha up to reassociation of the indicator sums; the
        VMEM working set shrinks ~K-fold (the [C, dim, K, tile] hoisted
        flux stack alone is ~13 MB at K = 26), which is what bounds the
        3D kernels."""
        eq, p = self.eq, self.params
        C, K, dim = eq.n_comp, self.K, self.dim
        dtype = self.dtype
        tile = ((tv.TD,) if tv.TD is not None else ()) + (tv.TH, tv.TW)
        if self.sep is not None:
            w_g2, w_fz, w_node, w_U, w_prec = wins
            st = _SepTile(self, w_g2, self._win(w_fz, tv), tv)
            w_cij = w_cmax = None
        else:
            w_cij, w_cmax, w_node, w_U, w_prec = wins
            st = None
        # prescale (3D slab callers only): emit PRE-SCALED wavespeeds
        # e = lambda * cmax (= the graph viscosity d): cmax_k(i) ==
        # cmax_{K-1-k}(j), so the transposed slot of e is already d and
        # PK2/PK3/tau never touch cmax again (the 2D / stacked-3D paths
        # keep plain lambda: their half-canvas machinery reads lambda
        # semantics)
        tvd = self._derived_view(tv)
        U_win = self._win(w_U, tv)
        prec_win = self._win(w_prec, tv)
        node_win = self._win(w_node, tv)
        Ut = tvd.center(U_win)
        prect = tvd.center(prec_win)
        node_c = tvd.center(node_win)
        nm_c = node_c[3]
        tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)

        import os as _os

        _abl = _os.environ.get("RYUJIN_PK1_ABLATE", "")
        K2_ = K // 2 if sym else K
        if "empty" in _abl:
            # measurement aid: windows DMA'd but untouched; zero outputs
            z = jnp.zeros((K2_,) + tile, dtype)
            return [z, nm_c[None] * 0.0]

        cij_c = (
            tv.center(w_cij).reshape((dim, K) + tile)
            if st is None else None
        )
        cmax_c = (
            tv.center(w_cmax) if (prescale and st is None) else None
        )
        pa_win = pa_i = None
        if hasattr(eq, "riemann_precompute"):
            pa_win = jnp.stack(eq.riemann_precompute(U_win))
            pa_i = tuple(tvd.center(pa_win))
        f_win = eq.f(U_win)
        f_pl = f_win.reshape((C * dim,) + f_win.shape[2:])
        f_i = tvd.center(f_pl).reshape((C, dim) + tile)

        if "center" in _abl:
            # measurement aid: only center reads, no neighbor slots
            s = jnp.sum(Ut, 0) + jnp.sum(prect, 0) + pa_i[0]
            return [jnp.zeros((K2_,) + tile, dtype) + s[None] * 1e-30,
                    nm_c[None] * 0.0]
        ind = eq.indicator_init(Ut, prect, f_i=f_i)
        left = right = None
        e_slots = []
        K2 = K // 2 if sym else K
        for k, off in enumerate(self.offsets):
            U_jk = tvd._slot(U_win, None, off)
            prec_jk = tvd._slot(prec_win, None, off)
            c_k = cij_c[:, k] if st is None else st.cij_k(k)
            vm_jk = tvd._slot(node_win, 4, off)
            mask_k = nm_c * vm_jk
            if k < K2:
                norm_k = jnp.sqrt(jnp.sum(c_k * c_k, axis=0))
                n_k = c_k / jnp.maximum(norm_k, tiny)[None]
                kwk = {}
                if pa_win is not None:
                    kwk["pa_i"] = pa_i
                    kwk["pa_j"] = tuple(
                        tvd._slot(pa_win, i, off)
                        for i in range(pa_win.shape[0])
                    )
                if "riemann" in _abl and pa_win is not None:
                    # measurement aid: trivial |u.n| + a bound instead of
                    # the two-rarefaction solve
                    pj = kwk["pa_j"]
                    u_i = jnp.sum(eq.momentum(Ut) * n_k, 0) * pa_i[2]
                    u_j = jnp.sum(eq.momentum(U_jk) * n_k, 0) * pj[2]
                    lam_k = jnp.maximum(
                        jnp.abs(u_i) + pa_i[1], jnp.abs(u_j) + pj[1]
                    )
                else:
                    lam_k = eq.riemann_lambda_max(
                        Ut, U_jk, n_k, prec_i=prect, prec_j=prec_jk,
                        newton_iterations=p.riemann_newton_max_iterations,
                        newton_tol=p.riemann_newton_tolerance, **kwk,
                    )
                if prescale:
                    cmx = st.cmax_k(k) if st is not None else cmax_c[k]
                    e_slots.append(lam_k * cmx)
                else:
                    e_slots.append(lam_k if sym else norm_k * lam_k)
            if "noind" in _abl:
                continue
            f_jk = tvd._slot(f_pl, None, off).reshape((C, dim) + tile)
            li, ri = eq.indicator_accum(ind, U_jk, prec_jk, f_jk, c_k, mask_k)
            left = li if left is None else left + li
            right = ri if right is None else right + ri
        if "noind" in _abl:
            return [jnp.stack(e_slots), nm_c[None] * 0.5]

        hd_i = node_c[0] * self.measure_inv
        alpha = eq.indicator_finalize(ind, left, right, hd_i, p.evc_factor)
        return [jnp.stack(e_slots), alpha[None]]

    # -- separable statics: full-canvas XLA synthesis (glue between
    #    kernels; the kernels themselves use _SepTile) --------------------
    def _sep_full(self, kind, k, comp=None):
        """[D, H, W] synthesis of one separable static plane (z-major)."""
        ga = self.arrays
        K, d = self.K, self.dim
        _, dy, dx = self.offsets[k]
        q = (dy + 1) * 3 + (dx + 1)
        if kind == 'mask':
            p2, pf = 9 * (d + 1) + q, K * (d + 1) + k
        elif kind == 'cij':
            p2, pf = q * d + comp, k * d + comp
        else:
            raise ValueError(kind)
        fz = ga.f_sepz[:, pf, 0, 0][:, None, None]
        return fz * ga.g_sep2[0, p2]

    def _sep_cmax_full(self, k):
        """[D, H, W] max(|c_ij|, |c_ji|) from the separable factors
        (canvas-roll wrap semantics, like the precomputed g_cmax)."""
        d, K = self.dim, self.K
        off = self.offsets[k]
        kt = K - 1 - k
        ni = jnp.sqrt(sum(
            self._sep_full('cij', k, c) ** 2 for c in range(d)
        ))
        nj = jnp.sqrt(sum(
            jnp.roll(
                self._sep_full('cij', kt, c),
                tuple(-o for o in off), axis=(0, 1, 2),
            ) ** 2
            for c in range(d)
        ))
        return jnp.maximum(ni, nj)

    # -- streamed z-slab kernels (3D second generation) ---------------------
    def _slot_d(self, tv, tvd, e_win, e_c, mask_k, k, off, sym):
        """Graph viscosity d_k for one offset from the e halo window.

        sym: e is PRE-SCALED by PK1 (e = lambda * cmax = d), and
        cmax_k(i) == cmax_{K-1-k}(j), so the transposed slot read IS
        d_k — no cmax access here at all."""
        K = self.K
        if sym:
            K2 = K // 2
            d_k = (
                e_c[k] if k < K2 else tvd._slot(e_win, K - 1 - k, off)
            )
        else:
            d_k = jnp.maximum(e_c[k], tvd._slot(e_win, K - 1 - k, off))
        return jnp.where(mask_k > 0, d_k, jnp.zeros_like(d_k))

    def _step_slab(self, Uc, precc, sUc, sPc, w_vec, tau, cfl, tau_cap,
                   compute_tau, ga):
        """The IDP substep as streamed full-cross-section z-slab kernels.

        Same five-phase structure as `step` (PK1 / tau / PK2 / PK3 /
        PK4-5, hyperbolic_module.template.h:341-1182), but every kernel
        runs on [TD, H, W] tiles via `_tiled_call_3d_slab` and streams
        the stencil one offset at a time (running sums / running min-max
        through the equation's *_accum APIs) instead of materialising
        [K, tile] neighbor stacks.  Euler-family equations only
        (no sources / equilibrated states / high-order flux)."""
        eq, p = self.eq, self.params
        C = eq.n_comp
        PP = eq.n_precomputed
        K = self.K
        dim = self.dim
        S = sUc.shape[0] // C if sUc.shape[0] else 0
        dtype = self.dtype
        canvas = self.canvas
        D, H, W = canvas
        sym = (
            bool(getattr(eq, "riemann_symmetric", False))
            and not self.multiblock  # interface frames break k<->K-1-k
            and self.sym_enabled  # boundary-pair fixup set small enough
            and os.environ.get("RYUJIN_NO_SYM") != "1"  # A/B knob
        )
        K_e = K // 2 if sym else K
        import os as _os

        TD = _tile_d_default()
        z0, z1 = self.z_planes

        def mk_common(td):
            return dict(
                offsets=self.offsets, D=D, H=H, W=W, TD=td,
                tile_planes=(z0 // td, (z1 - 1) // td + 1),
                dtype=dtype, interpret=self.interpret,
            )

        common = mk_common(TD)
        # LIGHT kernels (PK1; PK2 in separable mode — no [K, tile] P or
        # cij center blocks) run deeper z tiles when the canvas margins
        # allow: the halo-window reload factor drops from (2+2)/2 = 2x
        # to (td+2)/td and the DMA chunks grow.  The P-carrying kernels
        # (PK3/PK4/PK5) stay at the default TD for VMEM.
        def fits(td):
            return (
                D % td == 0
                and (z0 // td) * td >= 1
                and ((z1 - 1) // td + 1) * td + 1 <= D
            )

        # TD_L = 4: wz = 6 windows stay within the ~16 MB VMEM budget
        # for PK1/PK2's window set (TD = 8 would not)
        TD_L = int(os.environ.get("RYUJIN_TILE_D_LIGHT", "4"))
        if not (TD_L > TD and fits(TD_L)) or self.device_mesh is not None:
            # sharded slabs derive tile ranges from the ghost-band width
            # (== default TD); keep one tiling there
            TD_L = TD
        common_l = mk_common(TD_L) if TD_L != TD else common
        tiled_call = _tiled_call_3d_slab

        # z-major [D, planes, H, W] layout for every multi-plane canvas:
        # windows and center blocks then transfer as single contiguous
        # chunks (see _tiled_call_3d_slab).  Dynamic state enters
        # plane-major [planes, D, H, W]; one XLA transpose each way.
        def zm(X):
            return jnp.moveaxis(X, 0, 1)

        Uz = zm(Uc)
        precz = zm(precc)
        sUz = zm(sUc)

        if _os.environ.get("RYUJIN_PK_ABLATE") == "pk0":
            # measurement aid: NO kernels at all — times the substep
            # scaffolding (prepare_state_vector, integrator scan, entry
            # transposes) around the pallas calls
            return (
                (zm(Uz) + 0.0 * jnp.sum(precz[0, 0, 0, :1])).reshape(C, -1),
                tau * 1.0,
                jnp.asarray(True),
            )

        def zeros(planes):
            return jnp.zeros((D, planes, H, W), dtype)

        # ---- PK1: e + alpha (shared streaming compute) ------------------
        pk1_statics = (
            [(ga.g_sep2, 'b'), ga.f_sepz] if self.sep is not None
            else [(ga.g_cij, False),
                  (ga.g_cmax if sym else None, False)]
        )
        e, alpha = self._call(
            tiled_call,
            lambda wins, scal, tv: self._pk1_stream(
                wins, scal, tv, sym, prescale=sym
            ),
            pk1_statics + [ga.g_node, Uz, precz],
            [],
            [K_e, zeros(1)],
            # separable mode drops the [TD, dim*K, H, W] cij center
            # block, freeing the VMEM for deeper z tiles:
            common_l if self.sep is not None else common,
        )
        if sym and self.lambda_fixup is not None:
            # the fixup scatters on the plane-major flat layout; round
            # trip the (half) e canvas through two XLA transposes.
            # e is pre-scaled (d = lambda * cmax) on this path:
            e_pm = zm(e)
            e_pm = self.lambda_fixup(
                e_pm, Uc.reshape(C, -1), precc.reshape(PP, -1),
                prescaled=True,
            ).reshape((K_e,) + canvas)
            e = zm(e_pm)
        e = self._refresh_zm(e)
        alpha = self._refresh_zm(alpha)

        # ---- d + tau reduction (XLA, one fusion) ------------------------
        def roll_T(k, off):
            # transposed-slot read: plane K-1-k of the off_k neighbor
            return jnp.roll(
                e[:, K - 1 - k], tuple(-o for o in off), axis=(0, 1, 2)
            )

        # sym: e is PRE-SCALED (PK1 folded cmax in), so e / its
        # transposed slot IS the graph viscosity d already
        if self.sep is not None:
            # separable statics: accumulate row sums of d directly with
            # synthesized mask planes — no [K, D, H, W] static canvas
            # reads in the glue (the broadcasts fuse into the chain)
            acc = jnp.zeros(canvas, dtype)
            for k, off in enumerate(self.offsets):
                if sym:
                    d_k = e[:, k] if k < K_e else roll_T(k, off)
                else:
                    d_k = jnp.maximum(e[:, k], roll_T(k, off))
                acc = acc + jnp.where(
                    self._sep_full('mask', k) > 0, d_k,
                    jnp.zeros_like(d_k),
                )
            d_row_sum = acc
        elif sym:
            lam_T = jnp.stack([
                roll_T(k, off)
                for k, off in list(enumerate(self.offsets))[K_e:]
            ], axis=1)
            d_full = jnp.concatenate([e, lam_T], axis=1)
            d = jnp.where(
                ga.g_mask > 0, d_full, jnp.zeros_like(d_full)
            )
            d_row_sum = jnp.sum(d, axis=1)
        else:
            e_T = jnp.stack(
                [roll_T(k, off) for k, off in enumerate(self.offsets)],
                axis=1,
            )
            d = hyp.d_from_e(ga.g_mask, e, e_T)
            d_row_sum = jnp.sum(d, axis=1)
        if _os.environ.get("RYUJIN_TAU_ABLATE") == "1":
            # measurement aid: skip the d/tau XLA fusion (keeps e alive)
            tau = (tau + 0.0 * jnp.sum(e[0, :, 0, :1])).astype(dtype)
        else:
            # tau_max = min_i cfl m_i / (-2 d_ii), z-major reduction
            tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)
            d_sum = -d_row_sum  # [D, H, W]
            d_sum = jnp.minimum(d_sum, -1.0e6 * tiny)
            tau_i = cfl * ga.m_lumped_flat / (-2.0 * d_sum.reshape(-1))
            big = jnp.asarray(jnp.finfo(dtype).max, dtype)
            tau_max = jnp.minimum(
                jnp.min(
                    jnp.where(ga.node_mask_flat > 0, tau_i, big)
                ),
                tau_cap,
            )
            tau = jnp.where(compute_tau, tau_max, tau).astype(dtype)

        if _os.environ.get("RYUJIN_PK_ABLATE") == "pk1":
            return (Uc + 0.0 * tau).reshape(C, -1), tau, jnp.asarray(True)

        n_b = eq.n_bounds
        # plain python float: jnp scalars created here would be captured
        # constants inside the pallas kernels below
        regularization = float(100.0 * np.finfo(np.dtype(dtype)).tiny)

        def weight_of(ws):
            # 1 - sum(stage weights), from the SMEM scalar refs
            w = 1.0
            for w_s in ws:
                w = w - w_s
            return w

        sep = self.sep

        def slot_inputs(tv, wins_slices, k, off):
            """Common per-offset slices for PK2/PK3."""
            (tvd, U_win, prec_win, e_win, alpha_win, cij_c,
             mask_c, e_c, f_pl, st) = wins_slices
            tile = (tv.TD, tv.TH, tv.TW)
            U_jk = tvd._slot(U_win, None, off)
            prec_jk = tvd._slot(prec_win, None, off)
            if st is None:
                c_k = cij_c[:, k]
                mask_k = mask_c[k]
            else:
                c_k = st.cij_k(k)
                mask_k = st.mask_k(k)
            d_k = self._slot_d(
                tv, tvd, e_win, e_c, mask_k, k, off, sym
            )
            alpha_jk = tvd._slot(alpha_win, 0, off)
            f_jk = tvd._slot(f_pl, None, off).reshape((C, dim) + tile)
            return U_jk, prec_jk, c_k, mask_k, d_k, alpha_jk, f_jk

        def common_windows(tv, w_cij, w_mask, w_U, w_prec,
                           w_e, w_alpha, w_g2=None, w_fz=None):
            tvd = self._derived_view(tv)
            tile = (tv.TD, tv.TH, tv.TW)
            U_win = self._win(w_U, tv)
            prec_win = self._win(w_prec, tv)
            e_win = self._win(w_e, tv)
            alpha_win = self._win(w_alpha, tv)
            if sep is None:
                cij_c = tv.center(w_cij).reshape((dim, K) + tile)
                mask_c = tv.center(w_mask)
                st = None
            else:
                cij_c = mask_c = None
                st = _SepTile(self, w_g2, self._win(w_fz, tv), tv)
            e_c = tvd.center(e_win)
            f_win = eq.f(U_win)
            f_pl = f_win.reshape((C * dim,) + f_win.shape[2:])
            return (tvd, U_win, prec_win, e_win, alpha_win,
                    cij_c, mask_c, e_c, f_pl, st)

        def stage_windows(tv, w_sU):
            """Hoisted per-stage flux windows [S][C*dim, ...window]."""
            if S == 0:
                return []
            outs = []
            for s in range(S):
                f_s = eq.f(self._win(w_sU, tv)[s * C : (s + 1) * C])
                outs.append(f_s.reshape((C * dim,) + f_s.shape[2:]))
            return outs

        # ---- PK2: low-order + F + bounds --------------------------------
        def pk2(wins, scal, tv):
            if sep is None:
                (w_cij, w_mask, w_cii, w_node, w_U, w_prec, w_e,
                 w_alpha, w_sU) = wins
                w_g2 = w_fz = None
            else:
                (w_g2, w_fz, w_node, w_U, w_prec, w_e, w_alpha,
                 w_sU) = wins
                w_cij = w_mask = w_cii = None
            tau_s = scal[0]
            ws = scal[1:]
            weight_scalar = weight_of(ws)
            tvd = self._derived_view(tv)
            tile = (tv.TD, tv.TH, tv.TW)
            sl = common_windows(tv, w_cij, w_mask, w_U,
                                w_prec, w_e, w_alpha, w_g2, w_fz)
            (_, U_win, prec_win, e_win, alpha_win, cij_c,
             mask_c, e_c, f_pl, st) = sl
            Ut = tvd.center(U_win)
            prect = tvd.center(prec_win)
            node_c = tv.center(w_node)
            alpha_c = tvd.center(alpha_win)[0]
            f_i = tvd.center(f_pl).reshape((C, dim) + tile)
            cii_c = st.cii() if st is not None else tv.center(w_cii)
            flux_ii = eq.flux_divergence(f_i, f_i, cii_c)
            f_s_wins = stage_windows(tv, w_sU)

            low_acc = jnp.zeros((C,) + tile, dtype)
            F_acc = jnp.zeros((C,) + tile, dtype)
            bst = eq.limiter_bounds_init(Ut, prect)
            for k, off in enumerate(self.offsets):
                (U_jk, prec_jk, c_k, mask_k, d_k, alpha_jk,
                 f_jk) = slot_inputs(tv, sl, k, off)
                flux_ij_k = eq.flux_divergence(f_i, f_jk, c_k)
                dU_k = U_jk - Ut
                dH_k = d_k * (0.5 * (alpha_c + alpha_jk))
                low_acc = low_acc + (
                    flux_ij_k + d_k[None] * dU_k
                ) * mask_k[None]
                F_acc = F_acc + (
                    dH_k[None] * dU_k + weight_scalar * flux_ij_k
                ) * mask_k[None]
                for s in range(S):
                    f_s_jk = tvd._slot(f_s_wins[s], None, off).reshape(
                        (C, dim) + tile
                    )
                    f_s_i = tvd.center(f_s_wins[s]).reshape(
                        (C, dim) + tile
                    )
                    F_acc = F_acc + ws[s] * eq.flux_divergence(
                        f_s_i, f_s_jk, c_k
                    ) * mask_k[None]
                scaled_c_k = c_k / jnp.maximum(d_k, regularization)[None]
                bst = eq.limiter_bounds_accum(
                    bst, U_jk, prec_jk, scaled_c_k, mask_k
                )

            m_inv = node_c[1]
            U_low = Ut + (tau_s * m_inv)[None] * (low_acc + flux_ii)
            F = F_acc + weight_scalar * flux_ii
            for s in range(S):
                f_s_i = tvd.center(f_s_wins[s]).reshape((C, dim) + tile)
                F = F + ws[s] * eq.flux_divergence(f_s_i, f_s_i, cii_c)
            hd_i = node_c[0] * self.measure_inv
            bounds = eq.limiter_bounds_finalize(
                bst, hd_i, p.limiter_relaxation_factor
            )
            return [U_low, F, bounds]

        pk2_statics = (
            [(ga.g_sep2, 'b'), ga.f_sepz] if sep is not None else
            [(ga.g_cij, False), (ga.g_mask, False), (ga.g_cii, False)]
        )
        U_low, F, bounds = self._call(
            tiled_call, pk2,
            # node canvas only read at the tile center in pk2 -> feed it
            # as a pipelined center block (halo windows cost a
            # (TD+2)/TD reload factor on every plane)
            pk2_statics + [(ga.g_node, False), Uz, precz, e, alpha, sUz],
            [tau] + [w_vec[s] for s in range(S)],
            [Uz, zeros(C), n_b],
            common_l if sep is not None else common,
        )
        F = self._refresh_zm(F)

        ok = jnp.asarray(True)
        if p.limiter_iterations == 0 or _os.environ.get(
            "RYUJIN_PK_ABLATE"
        ) == "pk2":
            return zm(U_low).reshape(C, -1), tau, ok

        # ---- PK3: P + first limiter pass --------------------------------
        def pk3(wins, scal, tv):
            if sep is None:
                (w_cij, w_mask, w_mij, w_node, w_U, w_prec, w_e,
                 w_alpha, w_F, w_Ulow, w_bounds, w_sU) = wins
                w_g2 = w_fz = None
            else:
                (w_g2, w_fz, w_node, w_U, w_prec, w_e, w_alpha, w_F,
                 w_Ulow, w_bounds, w_sU) = wins
                w_cij = w_mask = w_mij = None
            tau_s = scal[0]
            ws = scal[1:]
            weight_scalar = weight_of(ws)
            tvd = self._derived_view(tv)
            tile = (tv.TD, tv.TH, tv.TW)
            sl = common_windows(tv, w_cij, w_mask, w_U,
                                w_prec, w_e, w_alpha, w_g2, w_fz)
            (_, U_win, prec_win, e_win, alpha_win, cij_c,
             mask_c, e_c, f_pl, st) = sl
            node_win = self._win(w_node, tv)
            Ut = tvd.center(U_win)
            node_c = tvd.center(node_win)
            alpha_c = tvd.center(alpha_win)[0]
            f_i = tvd.center(f_pl).reshape((C, dim) + tile)
            mij_c = tv.center(w_mij) if st is None else None
            F_win = self._win(w_F, tv)
            F_i = tvd.center(F_win)
            U_low_t = tv.center(w_Ulow)
            bounds_t = tv.center(w_bounds)
            m_inv = node_c[1]
            nn = node_c[2]
            nm = node_c[3]
            pfac = tau_s * m_inv * nn
            f_s_wins = stage_windows(tv, w_sU)

            P_slots = []
            l_slots = []
            ok_acc = jnp.ones(tile, dtype)
            psi0_t = (
                eq.limiter_psi0(bounds_t, U_low_t)
                if hasattr(eq, "limiter_psi0") else None
            )
            for k, off in enumerate(self.offsets):
                (U_jk, prec_jk, c_k, mask_k, d_k, alpha_jk,
                 f_jk) = slot_inputs(tv, sl, k, off)
                flux_ij_k = eq.flux_divergence(f_i, f_jk, c_k)
                dU_k = U_jk - Ut
                dH_k = d_k * (0.5 * (alpha_c + alpha_jk))
                P_k = (weight_scalar - 1.0) * flux_ij_k + (
                    dH_k - d_k
                )[None] * dU_k
                for s in range(S):
                    f_s_jk = tvd._slot(f_s_wins[s], None, off).reshape(
                        (C, dim) + tile
                    )
                    f_s_i = tvd.center(f_s_wins[s]).reshape(
                        (C, dim) + tile
                    )
                    P_k = P_k + ws[s] * eq.flux_divergence(
                        f_s_i, f_s_jk, c_k
                    )
                m_jk = tvd._slot(node_win, 0, off)
                F_jk = tvd._slot(F_win, None, off)
                mij_k = st.mij_k(k) if st is not None else mij_c[k]
                b_ij_k = -mij_k / m_jk
                b_ji_k = -mij_k * m_inv
                P_k = P_k + b_ij_k[None] * F_jk - b_ji_k[None] * F_i
                P_k = P_k * pfac[None]
                if _os.environ.get("RYUJIN_PK3_ABLATE") == "nolimit":
                    # measurement aid: skip the limiter Newton
                    l_k = jnp.sum(jnp.abs(P_k), axis=0) * 1e-30
                    succ_k = l_k < 1.0
                else:
                    l_k, succ_k = eq.limiter_limit(
                        bounds_t, U_low_t, P_k,
                        newton_iterations=p.limiter_newton_max_iterations,
                        newton_tol=p.limiter_newton_tolerance,
                        **({"psi0": psi0_t} if psi0_t is not None else {}),
                    )
                ok_acc = jnp.minimum(
                    ok_acc,
                    jnp.where(
                        (mask_k > 0) & (nm > 0),
                        succ_k.astype(dtype),
                        jnp.ones(tile, dtype),
                    ),
                )
                # fold the edge mask into P: PK4/PK5 then apply
                # l_sym * P directly and never read the 27-plane mask
                # canvas (masked slots contribute 0 regardless of l)
                P_slots.append(P_k * mask_k[None])
                l_slots.append(l_k)
            P = jnp.stack(P_slots, axis=1).reshape((C * K,) + tile)
            l = jnp.stack(l_slots, axis=0)
            return [P, l, ok_acc[None]]

        pk3_statics = (
            [(ga.g_sep2, 'b'), ga.f_sepz] if sep is not None else
            [(ga.g_cij, False), (ga.g_mask, False), (ga.g_mij, False)]
        )
        P, l_ij, okp = self._call(
            tiled_call, pk3,
            pk3_statics + [
             ga.g_node, Uz, precz, e, alpha, F,
             (U_low, False), (bounds, False), sUz],
            [tau] + [w_vec[s] for s in range(S)],
            [C * K, zeros(K), jnp.ones((D, 1, H, W), dtype)],
            common,
        )
        ok = jnp.min(okp) > 0.5
        l_ij = self._refresh_zm(l_ij)
        if _os.environ.get("RYUJIN_PK_ABLATE") == "pk3":
            return zm(U_low).reshape(C, -1), tau, ok

        # ---- PK4/PK5: symmetrized limited updates -----------------------
        U_cur = U_low
        n_iter = p.limiter_iterations
        for it in range(n_iter):
            last = it + 1 == n_iter

            def pk_up(wins, scal, tv, last=last):
                w_lam, w_Ucur, w_bounds, w_P, w_l = wins
                tvd = self._derived_view(tv)
                tile = (tv.TD, tv.TH, tv.TW)
                lam_i = tv.center(w_lam)[0]
                U_t = tv.center(w_Ucur)
                bounds_t = tv.center(w_bounds)
                P_t = tv.center(w_P).reshape((C, K) + tile)
                l_t = tv.center(w_l)
                l_win = self._win(w_l, tv)
                acc = jnp.zeros((C,) + tile, dtype)
                l_sym_slots = []
                for k, off in enumerate(self.offsets):
                    l_T_k = tvd._slot(l_win, K - 1 - k, off)
                    l_sym_k = jnp.minimum(l_t[k], l_T_k)
                    l_sym_slots.append(l_sym_k)
                    # P carries the edge mask (folded in at PK3)
                    acc = acc + l_sym_k[None] * P_t[:, k]
                U_next = U_t + lam_i[None] * acc
                if last:
                    return [U_next]
                l_new = []
                psi0_n = (
                    eq.limiter_psi0(bounds_t, U_next)
                    if hasattr(eq, "limiter_psi0") else None
                )
                for k in range(K):
                    one_m = 1.0 - l_sym_slots[k]
                    l2_k, _ = eq.limiter_limit(
                        bounds_t, U_next, one_m[None] * P_t[:, k],
                        newton_iterations=p.limiter_newton_max_iterations,
                        newton_tol=p.limiter_newton_tolerance,
                        **({"psi0": psi0_n} if psi0_n is not None else {}),
                    )
                    l_new.append(one_m * l2_k)
                return [U_next, jnp.stack(l_new, axis=0)]

            outs = self._call(
                tiled_call, pk_up,
                [(ga.g_lam, False),
                 (U_cur, False), (bounds, False), (P, False), l_ij],
                [],
                [Uz] if last else [Uz, zeros(K)],
                common,
            )
            if last:
                (U_cur,) = outs
            else:
                U_cur, l_ij = outs
                l_ij = self._refresh_zm(l_ij)

        return zm(U_cur).reshape(C, -1), tau, ok

    # -- the five kernels ---------------------------------------------------
    def step(self, U, prec, stage_U, stage_prec, stage_weights, tau, cfl,
             tau_cap, compute_tau, stencil, init_prec=None):
        """Same contract as HyperbolicModule.step (node-last flat arrays)."""
        eq, p = self.eq, self.params
        ga = stencil if isinstance(stencil, PallasArrays) else self.arrays
        H, W, TH, TW = self.H, self.W, self.TH, self.TW
        canvas = self.canvas
        C = eq.n_comp
        PP = eq.n_precomputed
        K = self.K
        S = stage_U.shape[0]
        dtype = self.dtype
        IP = init_prec.shape[0] if init_prec is not None else 0

        Uc = U.reshape((C,) + canvas)
        precc = prec.reshape((PP,) + canvas)
        sUc = stage_U.reshape((S * C,) + canvas) if S else jnp.zeros(
            (0,) + canvas, dtype
        )
        sPc = (
            stage_prec.reshape((S * PP,) + canvas)
            if S and PP
            else jnp.zeros((0,) + canvas, dtype)
        )
        w_vec = (
            stage_weights.astype(dtype)
            if S
            else jnp.zeros((0,), dtype)
        )
        Uc = self._refresh(Uc)
        precc = self._refresh(precc)
        sUc = self._refresh(sUc)
        sPc = self._refresh(sPc)
        # bathymetry-style initial precomputes are a static per-mesh
        # canvas; threaded as an extra halo window into PK2/PK3 (the
        # reference reads them inside the step 4/5 flux contributions,
        # shallow_water/hyperbolic_system.h:481-575)
        ipc = (
            self._refresh(init_prec.reshape((IP,) + canvas).astype(dtype))
            if IP
            else None
        )

        if self.dim == 3 and self.slab3d:
            return self._step_slab(
                Uc, precc, sUc, sPc, w_vec, tau, cfl, tau_cap,
                compute_tau, ga,
            )

        if self.dim == 3:
            common = dict(
                offsets=self.offsets, D=self.D, H=H, W=W,
                TD=self.TD, TH=TH, tile_planes=self.tile_planes,
                tile_rows=self.tile_rows, dtype=dtype,
                interpret=self.interpret,
            )
            tiled_call = _tiled_call_3d
        else:
            common = dict(
                offsets=self.offsets, H=H, W=W, TH=TH, TW=TW,
                tile_rows=self.tile_rows, dtype=dtype,
                interpret=self.interpret,
            )
            if self.slab_spec is not None and self.device_mesh is None:
                # unsharded slab canvas: enumerate only the real tiles
                # of each slab — ghost-band tiles are refreshed between
                # kernels and never need computing (the single-chip slab
                # machinery tax of PERF_r04 slab_canvas_overhead_1M)
                n_sl, Ls, g = self.slab_spec
                if Ls % TH == 0 and g % TH == 0 and g >= TH:
                    tps, At, gt = Ls // TH, (Ls + 2 * g) // TH, g // TH
                    # Ls rounds content/n_sl up to a tile multiple, so the
                    # LAST slab usually ends in fully-empty tiles (the pad
                    # ratio growth of PERF_r04 slab_canvas_overhead_1M).
                    # Content fills slabs in order, so trimming the grid to
                    # the last tile with content skips them without
                    # changing the tile -> row map:
                    tile_has = self._row_has_content.reshape(
                        -1, TH
                    ).any(axis=1)
                    enum_rows = (
                        (np.arange(n_sl * tps) // tps) * At + gt
                        + np.arange(n_sl * tps) % tps
                    )
                    nz = np.flatnonzero(tile_has[enum_rows])
                    n_ct = int(nz[-1]) + 1 if len(nz) else 0
                    common["slab_tiles"] = (n_sl, tps, At, gt)
                    common["tile_rows"] = (0, n_ct)
            tiled_call = _tiled_call

        def zeros(planes):
            return jnp.zeros((planes,) + canvas, dtype)

        # ---- PK1: e (forward wavespeed products) + alpha ----------------
        def pk1(wins, scal, tv):
            w_cij, w_cmax, w_node, w_U, w_prec = wins
            sa = self._sa(tv, w_cij, None, None, None, w_node,
                          mask_arr=self._derived_mask(w_node, tv))
            Ut = tv.center(w_U)
            prect = tv.center(w_prec)
            U_j = tv.nbr(w_U)
            prec_j = tv.nbr(w_prec)
            # node-local precomputes evaluated ONCE on the halo window and
            # sliced per edge (the XLA path re-evaluates them per gathered
            # neighbor; in VMEM the window evaluation is K-fold cheaper):
            kw = {}
            if hasattr(eq, "riemann_precompute"):
                tvd = self._derived_view(tv)
                pa_win = jnp.stack(
                    eq.riemann_precompute(self._win(w_U, tv))
                )
                kw["rp"] = tuple(tvd.center(pa_win))
                pa_j = tvd.nbr(pa_win)
                kw["rp_j"] = tuple(pa_j)
            if getattr(eq, "hoist_node_flux", False):
                kw["f_i"], kw["f_j"] = self._flux_win(w_U, tv)
            e, alpha = hyp.phase_e_alpha(
                eq, p, sa, Ut, prect, U_j, prec_j, half=sym or sym_mb, **kw
            )
            if prescale:
                # fold cmax = max(|c_ij|, |c_ji|) into the output: the
                # transposed slot read then IS the graph viscosity d and
                # PK2/PK3 and the tau glue never touch the cmax canvas
                # (the 3D slab kernels' pre-scaled wavespeed trick)
                e = e * tv.center(w_cmax)[: self.K // 2]
            return [e, alpha[None]]

        no_sym = os.environ.get("RYUJIN_NO_SYM") == "1"  # A/B knob
        sym = (
            bool(getattr(eq, "riemann_symmetric", False))
            and not self.multiblock  # interface frames break k<->K-1-k
            and self.sym_enabled  # boundary-pair fixup set small enough
            and not no_sym
        )
        # multi-block half-slot path: interiors pair via the canvas
        # transpose; the O(interface) broken slots are corrected by the
        # two-direction XLA fixup (hyperbolic.py _interface_fixup):
        sym_mb = (
            bool(getattr(eq, "riemann_symmetric", False))
            and self.multiblock
            and self.interface_fixup is not None
            and not no_sym
        )
        # Large-K single-block half-slot canvases (reach > 1) fold cmax
        # into PK1's output (pre-scaled wavespeeds): PK2/PK3 and the tau
        # glue then never read the K-plane cmax canvas — necessary VMEM
        # relief for the streamed kernels.  Reach-1 keeps raw lambda:
        # its PK1 is Riemann-compute-bound and the measured flagship
        # cost of the extra cmax center block (+0.04 GB/substep in PK1)
        # outweighs the PK2/PK3 savings (143.9 -> 139.9 MQ/s A/B).
        # The multi-block interface-fixup scatter works in lambda
        # units, so sym_mb keeps the raw path too.
        prescale = sym and (
            self.reach > 1
            or os.environ.get("RYUJIN_PRESCALE_2D") == "1"
        )
        K_e = K // 2 if (sym or sym_mb) else K
        import os as _os_s

        _stream_env = _os_s.environ.get("RYUJIN_STREAM")
        stream = hasattr(eq, "indicator_accum") and (
            _stream_env == "1" if _stream_env is not None
            else (self.dim == 3 or self.reach > 1)
        )
        pk1_fn = (
            (lambda wins, scal, tv: self._pk1_stream(
                wins, scal, tv, sym or sym_mb, prescale=prescale
            ))
            if stream
            else pk1
        )
        e, alpha = self._call(
            tiled_call, pk1_fn,
            [(ga.g_cij, False),
             (ga.g_cmax if prescale else None, False),
             ga.g_node, Uc, precc],
            [],
            [K_e, zeros(1)],  # e uninit: consumers mask the halo read
            common,
        )
        if (sym or sym_mb) and self.lambda_fixup is not None:
            # coupling-boundary-pair correction (few slots, XLA scatter)
            e = self.lambda_fixup(
                e, U, prec, prescaled=prescale
            ).reshape((K_e,) + canvas)
        if sym_mb:
            # multi-block half canvas: ghost refresh (computed-slot
            # sources only) + the cmax-normalized two-direction fixup at
            # broken transpose routes (hyperbolic.py _interface_fixup) —
            # downstream, the sym d reconstruction applies unchanged
            e = self._refresh_edge_half(e)
            e = self.interface_fixup(
                e.reshape(K_e, -1), U, prec
            ).reshape((K_e,) + canvas)
        else:
            sb = self.sideband
            if sb is not None:
                # extraordinary-vertex side rows (XLA, O(#EV)): scatter
                # side edge values where readers' transpose routes expect
                # them, BEFORE the ghost refresh (owner slots propagate)
                e_s, alpha_s = sb.e_alpha(U, prec)
                e = sb.scatter_edge(
                    e.reshape(K, -1), e_s
                ).reshape((K,) + canvas)
                alpha = alpha.reshape(1, -1).at[0, sb.cells].set(
                    alpha_s
                ).reshape((1,) + canvas)
            e = self._refresh_edge(e)
        alpha = self._refresh(alpha)

        # ---- d + tau reduction (XLA, one fusion) ------------------------
        caxes = tuple(range(len(canvas)))
        if sym or sym_mb:
            lam_T = jnp.stack([
                jnp.roll(e[K - 1 - k], tuple(-o for o in off), axis=caxes)
                for k, off in list(enumerate(self.offsets))[K_e:]
            ])
            lam_full = jnp.concatenate([e, lam_T], axis=0)
            if not prescale:
                lam_full = lam_full * ga.g_cmax
            d = jnp.where(
                ga.g_mask > 0, lam_full, jnp.zeros_like(lam_full)
            )
        else:
            e_T = jnp.stack(
                [
                    jnp.roll(e[K - 1 - k], tuple(-o for o in off), axis=caxes)
                    for k, off in enumerate(self.offsets)
                ]
            )
            d = hyp.d_from_e(ga.g_mask, e, e_T)
        sa_flat = _SA(
            cij=None, cij_t=None, mij=None, mask=None, cii=None,
            m_lumped=ga.m_lumped_flat, m_lumped_inv=None, n_nbrs=None,
            node_mask=ga.node_mask_flat, measure_inv=self.measure_inv,
        )
        tau_max = hyp.tau_max_from_d(
            sa_flat, d.reshape(K, -1), cfl, tau_cap
        )
        if self.sideband is not None:
            # canvas d_ii at EV rows misses the unembedded edges:
            d_s = self.sideband.d_side(e_s, e.reshape(K, -1))
            tau_max = jnp.minimum(
                tau_max, self.sideband.tau_side(d_s, cfl, tau_cap)
            )
        tau = jnp.where(compute_tau, tau_max, tau).astype(dtype)

        import os as _os
        if _os.environ.get("RYUJIN_PK_ABLATE") == "pk1":
            # measurement aid: PK1 + tau only
            return (Uc + 0.0 * tau).reshape(C, -1), tau, jnp.asarray(True)

        # ---- PK2: low-order + F + bounds --------------------------------
        n_b = eq.n_bounds

        # nodal sources (Manning friction) read m_ij in step 4
        # (hyperbolic_module.template.h:686,816-820):
        need_mij = bool(getattr(eq, "have_source_terms", False))

        def pk2(wins, scal, tv):
            (w_cij, w_mask, w_cmax, w_cii, w_node, w_U, w_prec, w_e,
             w_alpha, w_sU, w_sP, w_ip, w_mij, w_inc) = wins
            tau_s = scal[0]
            w_arr = jnp.stack(scal[1:]) if S else jnp.zeros((0,), dtype)
            sa = self._sa(tv, w_cij, w_mask, w_mij if need_mij else None,
                          w_cii, w_node, w_inc=w_inc)
            Ut, prect = tv.center(w_U), tv.center(w_prec)
            U_j, prec_j = tv.nbr(w_U), tv.nbr(w_prec)
            ip_t = tv.center(w_ip) if IP else None
            ip_j = tv.nbr(w_ip) if IP else None
            if sym or sym_mb:
                dt_ = self._d_win_sym(
                    w_e, None if w_cmax is None else tv.center(w_cmax),
                    sa.mask, tv,
                )
            else:
                dt_ = self._d_win(w_e, sa.mask, tv)
            alpha_t = tv.center(w_alpha)[0]
            alpha_j = tv.nbr(w_alpha)[0]
            sU, sP, sUj, sPj = self._stage_views(tv, w_sU, w_sP, S, C, PP)
            kw = {}
            if getattr(eq, "hoist_node_flux", False):
                kw["fl_i"], kw["fl_j"] = self._flux_win(w_U, tv)
                if S:
                    kw["stage_fl"] = self._stage_flux_fns(w_sU, tv, S, C)
            U_low, F, bounds = hyp.phase_low_order(
                eq, p, sa, Ut, prect, U_j, prec_j, dt_, alpha_t, alpha_j,
                tau_s, sU, sP, sUj, sPj, w_arr, ip_t, ip_j, **kw,
            )
            return [U_low, F, bounds]

        # reach-1 canvases keep the vectorized PK2; large-K canvases
        # (reach > 1) stream one offset at a time — the [C, K, tile]
        # neighbor/flux stacks of the vectorized kernel overflow the
        # Mosaic scoped-VMEM stack at flagship widths (measured: 122 MB
        # at K=24, W=3968).  Stream-capable equations only (pointwise
        # eq.f flux, no sources/equilibrated states).
        def pk2_stream(wins, scal, tv):
            (w_cij, w_mask, w_cmax, w_cii, w_node, w_U, w_prec, w_e,
             w_alpha, w_sU, w_sP, w_ip, w_mij, w_inc) = wins
            del w_sP, w_ip, w_mij
            tau_s = scal[0]
            ws = scal[1:]
            weight = 1.0
            for w_s in ws:
                weight = weight - w_s
            tvd = self._derived_view(tv)
            tile = self.tile
            U_win = self._win(w_U, tv)
            prec_win = self._win(w_prec, tv)
            e_win = self._win(w_e, tv)
            alpha_win = self._win(w_alpha, tv)
            cij_c = tv.center(w_cij).reshape((self.dim, K) + tile)
            mask_c = tv.center(w_mask)
            inc_c = tv.center(w_inc) if w_inc is not None else None
            cmax_c = tv.center(w_cmax) if w_cmax is not None else None
            Ut = tvd.center(U_win)
            prect = tvd.center(prec_win)
            e_c = tvd.center(e_win)
            node_c = tv.center(w_node)  # g_node is a center block in PK2
            alpha_c = tvd.center(alpha_win)[0]
            cii_c = tv.center(w_cii)
            f_win = eq.f(U_win)
            f_pl = f_win.reshape((C * self.dim,) + f_win.shape[2:])
            f_i = tvd.center(f_pl).reshape((C, self.dim) + tile)
            flux_ii = eq.flux_divergence(f_i, f_i, cii_c)
            f_s_wins = []
            for s in range(S):
                f_s = eq.f(self._win(w_sU, tv)[s * C : (s + 1) * C])
                f_s_wins.append(
                    f_s.reshape((C * self.dim,) + f_s.shape[2:])
                )
            regularization = float(
                100.0 * np.finfo(np.dtype(dtype)).tiny
            )
            low_acc = jnp.zeros((C,) + tile, dtype)
            F_acc = jnp.zeros((C,) + tile, dtype)
            bst = eq.limiter_bounds_init(Ut, prect)
            for k, off in enumerate(self.offsets):
                U_jk = tvd._slot(U_win, None, off)
                prec_jk = tvd._slot(prec_win, None, off)
                c_k = cij_c[:, k]
                mask_k = mask_c[k]
                if sym or sym_mb:
                    lam_k = (
                        e_c[k] if k < K_e
                        else tvd._slot(e_win, K - 1 - k, off)
                    )
                    d_k = lam_k if prescale else lam_k * cmax_c[k]
                else:
                    d_k = jnp.maximum(
                        e_c[k], tvd._slot(e_win, K - 1 - k, off)
                    )
                d_k = jnp.where(mask_k > 0, d_k, jnp.zeros_like(d_k))
                alpha_jk = tvd._slot(alpha_win, 0, off)
                f_jk = tvd._slot(f_pl, None, off).reshape(
                    (C, self.dim) + tile
                )
                flux_ij_k = eq.flux_divergence(f_i, f_jk, c_k)
                dU_k = U_jk - Ut
                factor_k = 0.5 * (alpha_c + alpha_jk)
                if inc_c is not None:
                    factor_k = jnp.maximum(factor_k, inc_c[k])
                dH_k = d_k * factor_k
                low_acc = low_acc + (
                    flux_ij_k + d_k[None] * dU_k
                ) * mask_k[None]
                F_acc = F_acc + (
                    dH_k[None] * dU_k + weight * flux_ij_k
                ) * mask_k[None]
                for s in range(S):
                    f_s_jk = tvd._slot(f_s_wins[s], None, off).reshape(
                        (C, self.dim) + tile
                    )
                    f_s_i = tvd.center(f_s_wins[s]).reshape(
                        (C, self.dim) + tile
                    )
                    F_acc = F_acc + ws[s] * eq.flux_divergence(
                        f_s_i, f_s_jk, c_k
                    ) * mask_k[None]
                scaled_c_k = c_k / jnp.maximum(d_k, regularization)[None]
                bst = eq.limiter_bounds_accum(
                    bst, U_jk, prec_jk, scaled_c_k, mask_k
                )
            m_inv = node_c[1]
            U_low = Ut + (tau_s * m_inv)[None] * (low_acc + flux_ii)
            F_out = F_acc + weight * flux_ii
            for s in range(S):
                f_s_i = tvd.center(f_s_wins[s]).reshape(
                    (C, self.dim) + tile
                )
                F_out = F_out + ws[s] * eq.flux_divergence(
                    f_s_i, f_s_i, cii_c
                )
            hd_i = node_c[0] * self.measure_inv
            bounds_out = eq.limiter_bounds_finalize(
                bst, hd_i, p.limiter_relaxation_factor
            )
            return [U_low, F_out, bounds_out]

        stream_pk2 = (
            self.reach > 1 and self.stream_capable and IP == 0
            and not need_mij
        )
        U_low, F, bounds = self._call(
            tiled_call, pk2_stream if stream_pk2 else pk2,
            [(ga.g_cij, False), (ga.g_mask, False),
             (ga.g_cmax if ((sym and not prescale) or sym_mb)
              else None, False),
             (ga.g_cii, False),
             (ga.g_node, False), Uc, precc, e,
             alpha, sUc, sPc, ipc,
             (ga.g_mij if need_mij else None, False),
             (ga.g_inc, False)],
            [tau] + [w_vec[s] for s in range(S)],
            # F is halo-read in PK3 -> needs valid (zero) margins; bounds
            # are only ever read at the center tile -> uninitialized:
            [Uc, zeros(C), n_b],
            common,
        )
        sb = self.sideband
        if sb is not None:
            alpha_fl = alpha.reshape(-1)
            Ul_s, F_s, b_s = sb.low_order(
                U, prec, d_s, alpha_fl, tau, stage_U, stage_prec, w_vec
            )
            U_low = U_low.reshape(C, -1).at[:, sb.cells].set(
                Ul_s
            ).reshape((C,) + canvas)
            F = F.reshape(C, -1).at[:, sb.cells].set(
                F_s
            ).reshape((C,) + canvas)
            bounds = bounds.reshape(n_b, -1).at[:, sb.cells].set(
                b_s
            ).reshape((n_b,) + canvas)
        F = self._refresh(F)

        ok = jnp.asarray(True)
        if p.limiter_iterations == 0 or _os.environ.get(
            "RYUJIN_PK_ABLATE"
        ) == "pk2":
            return U_low.reshape(C, -1), tau, ok

        # ---- PK3: P + first limiter pass --------------------------------
        # The derived mask (node_mask_i * value_mask_j) over-approximates
        # the edge set; on single-block canvases the extras all carry
        # c_ij = m_ij = 0 AND a zero transposed wavespeed, so d and hence
        # P vanish on them.  On MULTI-BLOCK canvases a fake canvas
        # adjacency can face a ghost row whose transposed e-slot holds an
        # unrelated real edge (reader-frame slot permutation), giving
        # d > 0 and spurious P — so those canvases read the exact mask:
        # Large-K canvases (reach > 1: cG Q2/Q3, dG Q2/Q3) stream PK3's
        # per-slot results straight into the output refs: stacking K*C
        # P tiles as values overflows the Mosaic scoped-VMEM stack
        # (measured: 125 MB at K=48, W=1536).  Small-K canvases keep the
        # stacked kernel (proven + marginally better scheduling); so do
        # equations whose fluxes need precomputed values or sources
        # (not stream-capable).
        stream_pk3 = (
            self.reach > 1 and self.stream_capable and IP == 0
        )

        def pk3(wins, scal, tv, out_refs=None):
            (w_cij, w_cmax, w_mij, w_cii, w_node, w_mask, w_U, w_prec,
             w_e, w_alpha, w_F, w_Ulow, w_bounds, w_sU, w_sP, w_ip,
             w_inc) = wins
            tau_s = scal[0]
            w_arr = jnp.stack(scal[1:]) if S else jnp.zeros((0,), dtype)
            sa = self._sa(tv, w_cij, w_mask, w_mij, w_cii, w_node,
                          mask_arr=(None if w_mask is not None else
                                    self._derived_mask(w_node, tv)),
                          w_inc=w_inc)
            Ut, prect = tv.center(w_U), tv.center(w_prec)
            U_j, prec_j = tv.nbr(w_U), tv.nbr(w_prec)
            if sym or sym_mb:
                dt_ = self._d_win_sym(
                    w_e, None if w_cmax is None else tv.center(w_cmax),
                    sa.mask, tv,
                )
            else:
                dt_ = self._d_win(w_e, sa.mask, tv)
            alpha_t = tv.center(w_alpha)[0]
            alpha_j = tv.nbr(w_alpha)[0]
            Ft = tv.center(w_F)
            F_j = tv.nbr(w_F)
            m_j = tv.nbr(w_node)[0]  # lumped mass neighbors
            U_low_t = tv.center(w_Ulow)
            bounds_t = tv.center(w_bounds)
            ip_t = tv.center(w_ip) if IP else None
            ip_j = tv.nbr(w_ip) if IP else None
            sU, sP, sUj, sPj = self._stage_views(tv, w_sU, w_sP, S, C, PP)
            kw = {}
            if getattr(eq, "hoist_node_flux", False):
                kw["fl_i"], kw["fl_j"] = self._flux_win(w_U, tv)
                if S:
                    kw["stage_fl"] = self._stage_flux_fns(w_sU, tv, S, C)
            P, l, success = hyp.phase_p_l1(
                eq, p, sa, Ut, prect, U_j, prec_j, dt_, alpha_t, alpha_j,
                tau_s, Ft, F_j, m_j, U_low_t, bounds_t,
                sU, sP, sUj, sPj, w_arr, ip_t, ip_j, **kw,
            )
            okp = jnp.min(
                jnp.where(
                    (sa.mask > 0) & (sa.node_mask[None] > 0),
                    success.astype(dtype),
                    jnp.ones_like(sa.mask),
                ),
                axis=0,
            )
            return [P.reshape((C * K,) + self.tile), l, okp[None]]

        def pk3_stream(wins, scal, tv, out_refs):
            """Slot-streaming PK3 (stream-capable equations, reach > 1):
            identical math to hyp.phase_p_l1, one offset at a time, with
            P/l stored into the output refs as they are computed."""
            (w_cij, w_cmax, w_mij, w_cii, w_node, w_mask, w_U, w_prec,
             w_e, w_alpha, w_F, w_Ulow, w_bounds, w_sU, w_sP, w_ip,
             w_inc) = wins
            del w_cii, w_sP, w_ip
            tau_s = scal[0]
            ws = scal[1:]
            weight = 1.0
            for w_s in ws:
                weight = weight - w_s
            del w_prec  # stream-capable fluxes are eq.f(U) pointwise
            tvd = self._derived_view(tv)
            tile = self.tile
            U_win = self._win(w_U, tv)
            e_win = self._win(w_e, tv)
            alpha_win = self._win(w_alpha, tv)
            node_win = self._win(w_node, tv)
            F_win = self._win(w_F, tv)
            cij_c = tv.center(w_cij).reshape((self.dim, K) + tile)
            mij_c = tv.center(w_mij)
            mask_c = tv.center(w_mask) if w_mask is not None else None
            inc_c = tv.center(w_inc) if w_inc is not None else None
            cmax_c = tv.center(w_cmax) if w_cmax is not None else None
            Ut = tvd.center(U_win)
            e_c = tvd.center(e_win)
            node_c = tvd.center(node_win)
            alpha_c = tvd.center(alpha_win)[0]
            m_inv = node_c[1]
            nn = node_c[2]
            nm = node_c[3]
            pfac = tau_s * m_inv * nn
            f_win = eq.f(U_win)
            f_pl = f_win.reshape((C * self.dim,) + f_win.shape[2:])
            f_i = tvd.center(f_pl).reshape((C, self.dim) + tile)
            f_s_wins = []
            for s in range(S):
                f_s = eq.f(self._win(w_sU, tv)[s * C : (s + 1) * C])
                f_s_wins.append(
                    f_s.reshape((C * self.dim,) + f_s.shape[2:])
                )
            F_i = tvd.center(F_win)
            U_low_t = tv.center(w_Ulow)
            bounds_t = tv.center(w_bounds)
            psi0_t = (
                eq.limiter_psi0(bounds_t, U_low_t)
                if hasattr(eq, "limiter_psi0") else None
            )
            out_P, out_l, _ = out_refs
            ok_acc = jnp.ones(tile, dtype)
            for k, off in enumerate(self.offsets):
                U_jk = tvd._slot(U_win, None, off)
                c_k = cij_c[:, k]
                if mask_c is not None:
                    mask_k = mask_c[k]
                else:
                    mask_k = nm * tvd._slot(node_win, 4, off)
                if sym or sym_mb:
                    lam_k = (
                        e_c[k] if k < K_e
                        else tvd._slot(e_win, K - 1 - k, off)
                    )
                    d_k = lam_k if prescale else lam_k * cmax_c[k]
                else:
                    d_k = jnp.maximum(
                        e_c[k], tvd._slot(e_win, K - 1 - k, off)
                    )
                d_k = jnp.where(mask_k > 0, d_k, jnp.zeros_like(d_k))
                alpha_jk = tvd._slot(alpha_win, 0, off)
                f_jk = tvd._slot(f_pl, None, off).reshape((C, self.dim) + tile)
                flux_ij_k = eq.flux_divergence(f_i, f_jk, c_k)
                dU_k = U_jk - Ut
                factor_k = 0.5 * (alpha_c + alpha_jk)
                if inc_c is not None:
                    # dG: force low-order dissipation across element
                    # interfaces (hyperbolic_module.template.h:733-737)
                    factor_k = jnp.maximum(factor_k, inc_c[k])
                dH_k = d_k * factor_k
                P_k = (weight - 1.0) * flux_ij_k + (
                    dH_k - d_k
                )[None] * dU_k
                for s in range(S):
                    f_s_jk = tvd._slot(f_s_wins[s], None, off).reshape(
                        (C, self.dim) + tile
                    )
                    f_s_i = tvd.center(f_s_wins[s]).reshape(
                        (C, self.dim) + tile
                    )
                    P_k = P_k + ws[s] * eq.flux_divergence(
                        f_s_i, f_s_jk, c_k
                    )
                m_jk = tvd._slot(node_win, 0, off)
                F_jk = tvd._slot(F_win, None, off)
                mij_k = mij_c[k]
                b_ij_k = -mij_k / m_jk
                b_ji_k = -mij_k * m_inv
                P_k = P_k + b_ij_k[None] * F_jk - b_ji_k[None] * F_i
                P_k = P_k * pfac[None]
                l_k, succ_k = eq.limiter_limit(
                    bounds_t, U_low_t, P_k,
                    newton_iterations=p.limiter_newton_max_iterations,
                    newton_tol=p.limiter_newton_tolerance,
                    **({"psi0": psi0_t} if psi0_t is not None else {}),
                )
                ok_acc = jnp.minimum(
                    ok_acc,
                    jnp.where(
                        (mask_k > 0) & (nm > 0),
                        succ_k.astype(dtype),
                        jnp.ones(tile, dtype),
                    ),
                )
                # fold the edge mask into P (masked slots then contribute
                # exactly 0 in PK4/PK5 regardless of l; the mask multiply
                # there is idempotent):
                P_km = P_k * mask_k[None]
                for c in range(C):
                    out_P[c * K + k] = P_km[c]
                out_l[k] = l_k
            return [None, None, ok_acc[None]]

        pk3_stream.takes_out_refs = True
        pk3_fn = pk3_stream if stream_pk3 else pk3

        P, l_ij, okp = self._call(
            tiled_call, pk3_fn,
            [(ga.g_cij, False),
             (ga.g_cmax if ((sym and not prescale) or sym_mb)
              else None, False),
             (ga.g_mij, False),
             (ga.g_cii, False), ga.g_node,
             (ga.g_mask if self.multiblock else None, False),
             Uc, precc, e,
             alpha, F, (U_low, False), (bounds, False), sUc, sPc, ipc,
             (ga.g_inc, False)],
            [tau] + [w_vec[s] for s in range(S)],
            # P is center-read only -> uninitialized; l is halo-read in
            # PK4 (transposed) -> zero margins; okp margins enter the
            # global min -> ones:
            [C * K, zeros(K), jnp.ones((1,) + canvas, dtype)],
            common,
        )
        if sb is not None:
            P_s, l_s, succ_s = sb.p_l1(
                U, prec, d_s, alpha_fl, tau,
                F.reshape(C, -1), ga.m_lumped_flat,
                Ul_s, b_s, stage_U, stage_prec, w_vec,
            )
            l_ij = sb.scatter_edge(
                l_ij.reshape(K, -1), l_s
            ).reshape((K,) + canvas)
            # neutralize the EV rows' partial canvas success:
            okp = okp.reshape(1, -1).at[0, sb.cells].set(
                jnp.ones((), dtype)
            ).reshape((1,) + canvas)
        ok = jnp.min(okp) > 0.5
        if sb is not None:
            ok = ok & jnp.all(succ_s | (sb.st.mask == 0.0))
        l_ij = self._refresh_edge(l_ij)
        if _os.environ.get("RYUJIN_PK_ABLATE") == "pk3":
            # `ok` consumes PK3's okp output, keeping the call alive
            return U_low.reshape(C, -1), tau, ok

        # ---- PK4/PK5: symmetrized limited updates -----------------------
        U_cur = U_low
        U_side = Ul_s if sb is not None else None
        n_iter = p.limiter_iterations
        for it in range(n_iter):
            last = it + 1 == n_iter

            def pk_up(wins, scal, tv, last=last):
                w_node, w_mask, w_Ucur, w_bounds, w_P, w_l = wins
                # multi-block canvases read the exact mask: a false canvas
                # adjacency into a ghost row could otherwise select NaN
                # through the l_T transpose (see phase_update's where):
                sa = self._sa(tv, None, w_mask, None, None, w_node,
                              mask_arr=(None if w_mask is not None else
                                        self._derived_mask(w_node, tv)))
                U_t = tv.center(w_Ucur)
                bounds_t = tv.center(w_bounds)
                P_t = tv.center(w_P).reshape((C, K) + self.tile)
                l_t = tv.center(w_l)
                l_T = tv.transpose_edge(w_l)
                U_next, l_new = hyp.phase_update(
                    eq, p, sa, U_t, bounds_t, P_t, l_t, l_T, last,
                    mask_lT=(self.multiblock or self.slab_spec is not None
                             or self.sideband is not None),
                )
                if last:
                    return [U_next]
                return [U_next, l_new]

            outs = self._call(
                tiled_call, pk_up,
                [ga.g_node,
                 (ga.g_mask if self.multiblock else None, False),
                 (U_cur, False), (bounds, False), (P, False), l_ij],
                [],
                [Uc] if last else [Uc, zeros(K)],
                common,
            )
            if last:
                (U_next,) = outs
                l_next = None
            else:
                U_next, l_next = outs
            if sb is not None:
                # side pass reads the SAME-pass canvas l (transpose):
                U_side, l_s_next = sb.update(
                    U_side, b_s, P_s, l_s, l_ij.reshape(K, -1), last
                )
                U_next = U_next.reshape(C, -1).at[:, sb.cells].set(
                    U_side
                ).reshape((C,) + canvas)
                if not last:
                    l_next = sb.scatter_edge(
                        l_next.reshape(K, -1), l_s_next
                    ).reshape((K,) + canvas)
                    l_s = l_s_next
            U_cur = U_next
            if not last:
                l_ij = self._refresh_edge(l_next)

        return U_cur.reshape(C, -1), tau, ok
