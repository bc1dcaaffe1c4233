"""Pallas TPU z-buffer rasterizer — SURVEY.md §3 C8, design per §9.5.

Replaces the reference's C++/CUDA z-buffer op with a tile-based Mosaic/TPU
kernel. Shares triangle setup + 2-D (band, column) binning with
ops/rasterize_tiled.py (ops/binning.py). Round-3 structure:

  - STATIC RASTER ROW ORDER: setup/record rows follow the asset's
    (mean-shape y-bin, x)-sorted, chunk-aligned-per-bin face permutation
    (utils/bfm.raster_row_order), so per-band AND per-column candidate
    windows are tight contiguous chunk spans (sort-free per frame).
  - CHUNK-GRANULAR WINDOWS: candidate windows are sized in 128-triangle
    chunks; the band's union window is one contiguous DMA.
  - COLUMN TILES + EXACT CHUNK MASKS: each band splits into n_cols
    column tiles and every column runs only the 128-triangle chunks
    whose bits are set in its EXACT per-chunk bitmask (ops/binning.py).
    A chunk outside the mask provably covers none of the column's
    pixels, so the pruning is exact; chunk granularity is the only one
    that pays (exact 4-chunk-slab masks measured x0.99 pair cut; exact
    per-chunk x2.04 at 224px/4cols frontal, x3.2 at training poses).
  - LANE-WISE CHUNK MERGE: each live chunk folds elementwise into the
    column's (col_px, 128) (z, id) accumulators; the cross-lane
    reduction runs ONCE per column instead of twice per slab.
  - ID-VALUED TIES: the carried/compared key is the ORIGINAL face id
    (setup field 12, f32-exact), and the select one-hot keys on id bytes
    embedded in the record (fields 42:45) — the oracle's lowest-face-id
    tie rule holds under ANY row order/padding with no end-of-pipe
    remapping.
  - FUSED RECORD SELECT: after the z-loop, the kernel one-hot-matmuls
    each pixel's winner render record out of the candidate chunks (the
    MXU does the gather). Records are PRE-SPLIT into exactly-bf16 field
    parts (_split_records: hi/lo pairs for 16-bit fields, 3 parts for the
    full-precision affine coefficients), so ONE bf16 pass per chunk reads
    all 48 fields with no rounding.
  - MULTI-WINDOW COVERAGE: a band whose candidate span exceeds the VMEM
    window loops further DMA windows instead of silently truncating; any
    face order is correct, incoherent orderings only degrade speed.

Data layout: the flat setup/record arrays are chunk-blocked —
(B, n_chunks, fields, 128) — so field extraction is a sublane slice and
the affine edge functions are dual-broadcast FMAs on the VPU (pixels from
a (col_px, 1) column, triangle coefficients from a (1, lanes) row).
Pixels are column-blocked y-major within a band (pix = col*col_px +
y*col_w + x): column tiles are contiguous sublane ranges and the unband
relayout keeps col_w the minor dim (minor-dim tile_h would pad 64x in
the TPU tiled layout). tri_id stays integer -> non-differentiable per
the §9.6 contract; the fused select output carries the differentiable
path (custom VJP runs the matmul ADJOINT of the select, no scatter).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facerecon_tpu.ops.binning import bin_triangles_static_t

_CHUNK = 128            # triangles per chunk (window-granularity unit)
_WINDOW = 64            # chunks per DMA window (524 KB setup scratch);
                        # covers the p99 band span of TRAINING poses at
                        # 224px (41% of bands exceed 32 chunks at pose
                        # scale 0.3), so the slow multi-window fallback is
                        # rare — segments beyond a band's span are
                        # pl.when-predicated away. 32 measured 5% faster
                        # on the frontal-pose bench but fires the fallback
                        # on 41% of training bands
_SEG = 16               # chunks per window-0 DMA segment (2 supers each)
_MWORDS = 2             # int32 chunk-mask words per (band, col): exact
                        # per-chunk hit bits over the window's first
                        # 32*_MWORDS chunks (= _WINDOW). Chunk granularity
                        # is the only one that pays: exact masks at the
                        # old 4-chunk slab granularity measured x0.99
                        # pair cut (every slab of the span has >=1 live
                        # chunk), while exact per-chunk masks cut pairs
                        # x2.04 at 224px/4cols frontal, x3.2 at training
                        # poses (benchmarks/pair_stats.py)
_BGRP = 8               # chunks per backward group (1024 lanes)
_GLANES = _BGRP * _CHUNK  # super / backward group lane width
_SELGRP = int(os.environ.get("RP_SELGRP", "16"))
                        # chunks per phase-2 select dot (2048 lanes):
                        # fewer, larger one-hot dots pipeline better on
                        # the MXU AND round the live span up less
                        # (ceil(13.7/16) = 1 group vs ceil(13.7/8) = 2 at
                        # 224px frontal); per-column (512-lane) selects
                        # were the measured opposite extreme (137.8 vs
                        # 129 ms/128 — per-dot fixed costs dominate)
_ROW_PAD = 16           # setup record fields padded 12 -> 16 for tiling
_FIELDS = 24            # caller-facing render-attribute record width
_RFIELDS = 48           # pre-split select record width (see _split_records)
_OUT_P = 8              # pos-mode output rows: pos+1 bytes 3 | z in 3
                        # exact bf16 parts | pad 2
_OUT_S = 16             # shade-mode output rows: rgb hi/lo 6 | w0/w1
                        # hi/lo 4 | pos bytes 3 | pad (the select record
                        # never leaves VMEM; ~3.5x less HBM written)


def _ctz32(m):
    """Branchless count-trailing-zeros of a nonzero int32 word using only
    plain scalar ops (no ctz/clz primitive needed; ~10 scalar ops)."""
    m = m.astype(jnp.uint32)
    k = jnp.uint32(0)
    for shift in (16, 8, 4, 2, 1):
        low = (jnp.uint32(1) << shift) - jnp.uint32(1)
        z = (m & low) == 0
        k = k + jnp.where(z, jnp.uint32(shift), jnp.uint32(0))
        m = jnp.where(z, m >> shift, m)
    return k.astype(jnp.int32)


def _popcount32(m):
    """Branchless popcount of an int32 word (plain scalar ops)."""
    m = m.astype(jnp.uint32)
    m = m - ((m >> 1) & jnp.uint32(0x55555555))
    m = (m & jnp.uint32(0x33333333)) + ((m >> 2) & jnp.uint32(0x33333333))
    m = (m + (m >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((m * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def padded_rows(n_faces: int) -> int:
    """Static row count of the padded setup/record arrays for n_faces:
    whole chunks plus a full DMA window of slack (fixed-size per-band
    fetches stay in bounds for every window of every band), rounded to the
    backward kernel's 8-chunk group so its reshape stays whole."""
    chunks = (n_faces + _CHUNK - 1) // _CHUNK + _WINDOW
    chunks = (chunks + _BGRP - 1) // _BGRP * _BGRP
    return chunks * _CHUNK


def _kernel(blo_ref, bn_ref, cmask_ref, setup_hbm, *rest, tile_h: int,
            tile_w: int, n_cols: int, band_px: int, mode: str,
            bpp: int = 1):
    """Per (image, band) program. mode: "pos" (phase 1 only), "select"
    (phase 2 emits the winner's 48-field pre-split record — the
    differentiable training path), or "shade" (phase 2 + in-kernel
    barycentric + radiance blend; emits 16 fields — the inference path,
    where the wide record never leaves VMEM).

    Phase 1 (z-test): DMA the band's UNION candidate window HBM->VMEM in
    16-chunk segments, then per COLUMN TILE run statically unrolled
    PER-CHUNK (col_px, 128) evals predicated on the column's EXACT
    chunk-mask bits, gated hierarchically (column -> word -> byte ->
    bit: flat checks cost 615 ns of scalar-core work per (band, col),
    more than the live chunks' vector work; gated ~80 ns). Each live
    chunk merges LANE-WISE into the column's (col_px, 128) (z, id)
    accumulators and ONE cross-lane reduction runs per column. Ties
    compare the carried ORIGINAL face id (setup field 12), so the
    oracle's lowest-id rule holds under any row order. Pixels are
    ROW-MAJOR within the band (pix = y*tile_w + col*col_w + x, round 5)
    so the caller's unband is a pure reshape; each column's y-major
    results scatter into tile_h static col_w-row runs at store time.
    No vector state ever rides a fori_loop
    (a vector-carried loop costs ~1.1 us PER ITERATION in VMEM
    round-trips).
    Phase 2 (select, optional): per live 16-chunk (2048-lane) group, one
    one-hot MXU dot over the lane-transposed record scratch; the one-hot
    keys on the record's embedded id bytes (fields 42:45) against the
    phase-1 winner.

    Segment/group alignment: DMA segments are 16 chunks; select groups
    _SELGRP. A group is live iff any of its mask bits is set; rows
    beyond the window inside a DMA'd segment hold neighboring bands'
    chunks or dead padding, both safe to evaluate.

    Scalars are flattened to (B, n_bands * n_cols): a short trailing dim
    would pad to 128 lanes in SMEM.
    """
    # benchmarking hook (benchmarks/stage_probe.py): RP_ABLATE=eval,sel,dma
    # compiles the SHIPPED kernel with phases removed so stage deltas are
    # measured on the real code, not a drifting harness copy. Read at
    # trace time; never set in production (results are garbage).
    abl = set(os.environ.get("RP_ABLATE", "").split(","))
    with_select = mode != "pos"
    if with_select:
        (rec_hbm, packed_ref, scr_s, scr_r, scr_zb, scr_pb, scr_az,
         scr_ai, scr_acc, sem) = rest
    else:
        pos_ref, scr_s, scr_zb, scr_pb, scr_az, scr_ai, sem = rest
    b = pl.program_id(0)
    col_w = tile_w // n_cols
    col_px = tile_h * col_w


    n_seg = _WINDOW // _SEG

    def _dma(tb, hbm, scr, blo, wbase, lo, size, s):
        # both setup and records are LANE-TRANSPOSED in HBM — (B, fields,
        # rows) — so a window segment lands as (fields, size*CHUNK) with
        # its chunks side-by-side on lanes: evals read static lane
        # slices. Band tb of the program owns lane slot tb of the
        # scratch; sem s is already slot-offset by the caller.
        sbase = tb * _WINDOW * _CHUNK
        return pltpu.make_async_copy(
            hbm.at[b, :, pl.ds((blo + wbase + lo) * _CHUNK, size * _CHUNK)],
            scr.at[:, pl.ds(sbase + lo * _CHUNK, size * _CHUNK)],
            sem.at[s])

    def _start(tb):
        # start band tb's window-0 segment DMAs into its scratch slot —
        # issued for ALL bpp bands before ANY band's compute, so band
        # k+1's fetch rides under band k's compute (the round-3 bpp=2
        # attempt serialized here: the second band's DMA only started
        # after the first band's compute, exposing its full latency)
        t = pl.program_id(1) * bpp + tb
        blo = blo_ref[b, t]
        bn = bn_ref[b, t]
        for k in range(n_seg):
            d = _dma(tb, setup_hbm, scr_s, blo, 0, k * _SEG, _SEG,
                     tb * n_seg + k)
            if k == 0:
                d.start()
            else:
                pl.when(bn > k * _SEG)(lambda d=d: d.start())
        if with_select:
            for k in range(n_seg):
                d = _dma(tb, rec_hbm, scr_r, blo, 0, k * _SEG, _SEG,
                         (bpp + tb) * n_seg + k)
                if k == 0:
                    d.start()
                else:
                    pl.when(bn > k * _SEG)(lambda d=d: d.start())

    def _band(tb):
        t = pl.program_id(1) * bpp + tb
        # band union window (the DMA span) + per-column EXACT chunk masks
        # (_MWORDS int32 words per column, bit i of word w = chunk 32w+i)
        blo = blo_ref[b, t]
        bn = bn_ref[b, t]
        sbase = tb * _WINDOW * _CHUNK
        cmask = [[cmask_ref[b, (t * n_cols + c) * _MWORDS + w]
                  for w in range(_MWORDS)] for c in range(n_cols)]

        # pixel coordinates, ROW-MAJOR within the band (pix = y*tile_w +
        # col*col_w + x, round 5): the caller's unband is then a PURE
        # RESHAPE — the old column-blocked order (pix = col*col_px +
        # y*col_w + x) needed a (n_cols, tile_h)-swapping relayout after
        # EVERY kernel (fwd select/shade AND the banding of the backward's
        # cotangent), ~205 MB a pass at 224px/128. Column tiles keep their
        # own y-major (col_px, 1) accumulators; only the final per-column
        # STORE scatters into tile_h row runs (static col_w-row slices).
        # (band_px, 1) pixel columns broadcast against (1, lanes) rows.
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (band_px, 1), 0)
        px = (pix_i % tile_w).astype(jnp.float32) + 0.5
        py = ((pix_i // tile_w).astype(jnp.float32)
              + jnp.float32(t * tile_h) + 0.5)
        cpix_i = jax.lax.broadcasted_iota(jnp.int32, (col_px, 1), 0)
        cpy = ((cpix_i // col_w).astype(jnp.float32)
               + jnp.float32(t * tile_h) + 0.5)

        scr_zb[...] = jnp.full((band_px, 1), jnp.inf, jnp.float32)
        scr_pb[...] = jnp.full((band_px, 1), -1.0, jnp.float32)

        # wait the segments (all up front; conditionals mirror the starts)
        for k in range(n_seg) if "dma" not in abl else []:
            d = _dma(tb, setup_hbm, scr_s, blo, 0, k * _SEG, _SEG,
                     tb * n_seg + k)
            if k == 0:
                d.wait()
            else:
                pl.when(bn > k * _SEG)(lambda d=d: d.wait())

        # ---- phase 1: per-column per-CHUNK evals predicated on the EXACT
        # chunk bitmask (bit i of word w = chunk 32w+i of the union window
        # hits this column — the only granularity that prunes: exact masks
        # at 4-chunk slabs measured x0.99, per-chunk x2.04-3.2 fewer pairs).
        # Each live chunk merges LANE-WISE into the column's (col_px, 128)
        # (z, id) accumulators — elementwise compare/selects only — and the
        # cross-lane reduction runs ONCE per column at the end. (The round-2
        # "deferred carry 4x slower" verdict was for (band_px, 1024) carries
        # whose round-trips dwarfed 8 saved reductions; here the carry is
        # 8x smaller and replaces a reduction PER SLAB with one per column.)
        # Lexicographic (z, id) min is associative, so any merge order
        # reproduces the oracle's lowest-face-id tie rule exactly.
        # Scalar-core cost is the critical path here: flat per-chunk
        # checks measured 615 ns fixed per (band, col) — larger than the
        # 5.5 live chunks' vector work (454 ns). HIERARCHICAL gating
        # (column any-bit -> mask word -> byte -> bit) skips dead ranges
        # in O(1): dead columns (35% at 224px/4cols) cost one check.
        for c in range(n_cols) if "eval" not in abl else []:
            cpx = (cpix_i % col_w).astype(jnp.float32) + (c * col_w + 0.5)

            def column(c=c, cpx=cpx):
                scr_az[...] = jnp.full((col_px, _CHUNK), jnp.inf,
                                       jnp.float32)
                scr_ai[...] = jnp.full((col_px, _CHUNK), 3e38, jnp.float32)

                def chunk_eval(k):
                    # k may be a DYNAMIC scalar (the ctz loop below): a
                    # 128-lane-aligned dynamic lane slice costs the same
                    # as a static one (measured, benchmarks/ctzloop_probe)
                    off = pl.multiple_of(sbase + k * _CHUNK, _CHUNK)
                    cf = lambda f: scr_s[f:f + 1, pl.ds(off, _CHUNK)]
                    qx = cpx - cf(9)
                    qy = cpy - cf(10)
                    e0 = cf(0) * qx + cf(1) * qy + cf(2)
                    e1 = cf(3) * qx + cf(4) * qy + cf(5)
                    ez = cf(6) * qx + cf(7) * qy + cf(8)
                    cov = (e0 >= 0.0) & (e1 >= 0.0) & (e0 + e1 <= 1.0)
                    zm = jnp.where(cov, ez, jnp.inf)
                    az = scr_az[...]
                    ai = scr_ai[...]
                    # uncovered lanes (zm = az = inf) may adopt a bogus
                    # id; harmless — the final zmin < 3e37 guard masks
                    # them
                    better = (zm < az) | ((zm == az) & (cf(12) < ai))
                    scr_az[...] = jnp.where(better, zm, az)
                    scr_ai[...] = jnp.where(better,
                                            jnp.broadcast_to(cf(12),
                                                             az.shape), ai)

                # LOOPED live-chunk walk (round 5): fori_loop over the
                # mask word's set bits, trip count = popcount, carrying
                # the remaining mask as a SCALAR (no vector state in the
                # carry — accumulators live in scr_az/scr_ai scratch).
                # Replaces 64 statically unrolled pl.when chunk bodies
                # per column, whose Mosaic compile time blew up
                # superlinearly in n_cols x _WINDOW (tile_h=4 x 7 cols
                # exceeded 600 s; looped it compiles in seconds) at
                # MEASURED-EQUAL runtime (ctzloop_probe: looped <=
                # unrolled at every occupancy).
                for w in range(_MWORDS):
                    def word_grp(w=w):
                        def bit_body(_, m):
                            chunk_eval(w * 32 + _ctz32(m))
                            mu = m.astype(jnp.uint32)
                            return (mu & (mu - 1)).astype(jnp.int32)

                        jax.lax.fori_loop(0, _popcount32(cmask[c][w]),
                                          bit_body, cmask[c][w])

                    pl.when(cmask[c][w] != 0)(word_grp)

                az = scr_az[...]
                ai = scr_ai[...]
                zmin = jnp.min(az, axis=1, keepdims=True)   # (col_px, 1)
                idw = jnp.min(jnp.where(az == zmin, ai, 3e38),
                              axis=1, keepdims=True)
                pb = jnp.where(zmin < 3e37, idw, -1.0)
                # scatter the column's y-major (col_px, 1) results into
                # the band's row-major pixel order: tile_h static
                # col_w-row runs (col_w % 8 == 0 keeps them
                # sublane-aligned; see col_width)
                for y in range(tile_h):
                    dst = y * tile_w + c * col_w
                    scr_zb[dst:dst + col_w] = zmin[y * col_w:
                                                   (y + 1) * col_w]
                    scr_pb[dst:dst + col_w] = pb[y * col_w:
                                                 (y + 1) * col_w]

            # dead column: the band-wide inf/-1 init already holds
            pl.when((cmask[c][0] | cmask[c][1] if _MWORDS == 2
                     else functools.reduce(lambda a, b: a | b, cmask[c]))
                    != 0)(column)

        # fallback beyond the window (spatially incoherent face order):
        # sequential window DMA + per-chunk narrow band-wide evals, scalar
        # loop state only. Correctness over speed.
        needs = bn > _WINDOW if not abl & {"eval", "dma"} else (bn < -1)

        @pl.when(needs)
        def _():
            def chunk_at(rel, _):
                cf = lambda f: scr_s[f:f + 1,
                                     pl.ds(pl.multiple_of(
                                         sbase + rel * _CHUNK, _CHUNK),
                                         _CHUNK)]
                qx = px - cf(9)
                qy = py - cf(10)
                e0 = cf(0) * qx + cf(1) * qy + cf(2)
                e1 = cf(3) * qx + cf(4) * qy + cf(5)
                ez = cf(6) * qx + cf(7) * qy + cf(8)
                cov = (e0 >= 0.0) & (e1 >= 0.0) & (e0 + e1 <= 1.0)
                zm = jnp.where(cov, ez, jnp.inf)
                zmin = jnp.min(zm, axis=1, keepdims=True)    # (band_px, 1)
                idw = jnp.min(jnp.where(zm == zmin, cf(12), 3e38),
                              axis=1, keepdims=True)
                zb = scr_zb[...]
                pb = scr_pb[...]
                better = (zmin < zb) | ((zmin == zb) & (idw < pb)
                                        & (zmin < 3e37))
                scr_zb[...] = jnp.where(better, zmin, zb)
                scr_pb[...] = jnp.where(better, idw, pb)
                return 0

            n_win = (bn + _WINDOW - 1) // _WINDOW

            def win_body(w, _):
                wbase = w * _WINDOW
                d = _dma(tb, setup_hbm, scr_s, blo, wbase, 0, _WINDOW,
                         tb * n_seg)
                d.start()
                d.wait()
                nw = jnp.minimum(bn - wbase, _WINDOW)
                jax.lax.fori_loop(0, nw, chunk_at, 0)
                return 0

            jax.lax.fori_loop(1, n_win, win_body, 0)

        posbest = scr_pb[...]                    # -1.0 where never covered

        if not with_select:
            # row-form packed output [pos+1 bytes 3 | z hi/lo 2 | pad 3]:
            # separate (band_px, 1) column outputs pad their minor dim
            # 128x in the tiled HBM layout — measured 1.42 s/128 at 224px
            # for the pos-only kernel, ~18x the fused select. One
            # (band_px, 1) -> (1, band_px) in-kernel relayout per band is
            # far cheaper than 128x-padded writes.
            posr = posbest.reshape(1, band_px)
            zr = scr_zb[...].reshape(1, band_px)
            posu = posr.astype(jnp.int32) + 1    # 0 = background
            z0, z1, z2 = _split3(jnp.where(posu > 0, zr, 0.0))  # exact
            pos_ref[0, tb] = jnp.concatenate(
                [(posu & 255).astype(jnp.bfloat16),
                 ((posu >> 8) & 255).astype(jnp.bfloat16),
                 (posu >> 16).astype(jnp.bfloat16), z0, z1, z2,
                 jnp.zeros((_OUT_P - 6, band_px), jnp.bfloat16)], axis=0)
            return

        # ---- phase 2: one-hot MXU select of the winner's render record ----
        # per live slab: onehot (band_px, 1024) @ record slab (48, 1024)^T.
        # Records are PRE-SPLIT into exactly-bf16 parts so a SINGLE bf16 pass
        # reads every field exactly. The one-hot keys on the record's id+1
        # byte fields (42:45) vs the winner id: position-independent, so any
        # row order/window works; background (0) matches only all-zero pad
        # records, whose contribution is zero.
        for k in range(n_seg) if "dma" not in abl else []:
            d = _dma(tb, rec_hbm, scr_r, blo, 0, k * _SEG, _SEG,
                     (bpp + tb) * n_seg + k)
            if k == 0:
                d.wait()
            else:
                pl.when(bn > k * _SEG)(lambda d=d: d.wait())

        # the select acc is TRANSPOSED (48, band_px) in BOTH modes: the
        # packed output leaves the kernel field-major, so the caller's
        # relayout keeps the pixel axis minor (a (0,2,1,3) transpose,
        # minor dim untouched) instead of moving the 56-field axis off
        # the lanes — the old pixel-major select output cost ~20 ms/128
        # in transpose+decode at 224px. The winner's id bytes arrive in
        # row form through the select itself (record fields 42:45), so
        # no (band_px, 1) -> (1, band_px) relayout is ever needed.
        # record height comes from the scratch shape: 48 (_RFIELDS) for
        # inference records, 56 when the training record carries the
        # skin-corner rows (48:54; ops/render._pack_split_records) — the
        # select dot is one MXU tile for any height <= 128 either way
        scr_acc[...] = jnp.zeros(scr_acc.shape, jnp.float32)
        posu_f = posbest + 1.0                   # 0 = background, f32-exact

        def sel_block(rec, pos_col=None, sl=slice(None)):
            idl = (rec[42:43].astype(jnp.float32)
                   + rec[43:44].astype(jnp.float32) * 256.0
                   + rec[44:45].astype(jnp.float32) * 65536.0)
            onehot = ((posu_f if pos_col is None else pos_col)
                      == idl).astype(jnp.bfloat16)
            scr_acc[:, sl] = scr_acc[:, sl] + jax.lax.dot_general(
                rec, onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        # band-union select slabs (1024 lanes), predicated on the OR of the
        # column masks: a dead mid-window slab is skipped (the old `bn >`
        # test could not). Per-COLUMN select dots were tried TWICE and
        # measured SLOWER both times: round 3 statically unrolled
        # (col_px, 512) dots (137.8 vs 129 ms/128 at tile_h=2), round 5
        # ctz-fori-looped per-column group dots at tile_h=4/7cols with
        # full-tile N=128 (sg=2: 64.9, sg=4: 60.5, sg=8: 55.3 vs union
        # 50.0 ms/128) — ~3x fewer one-hot MACs never beat the serial
        # loop-carried acc RMW + per-dot onehot setup; the monotone trend
        # toward bigger groups says the MXU wants few, large, pipelined
        # dots.
        umask = [functools.reduce(lambda a, b: a | b,
                                  [cmask[c][w] for c in range(n_cols)])
                 for w in range(_MWORDS)]
        sup_lanes = _SELGRP * _CHUNK

        def _grp_live(s):
            # any mask bit set in chunk range [s*_SELGRP, (s+1)*_SELGRP)
            if _SELGRP >= 32:                 # whole words
                ws = range(s * _SELGRP // 32, (s + 1) * _SELGRP // 32)
                return functools.reduce(lambda a, b: a | b,
                                        [umask[w] for w in ws]) != 0
            rmask = (1 << _SELGRP) - 1
            return ((umask[(s * _SELGRP) // 32] >> ((s * _SELGRP) % 32))
                    & rmask) != 0

        for s in range(_WINDOW // _SELGRP) if "sel" not in abl else []:
            def ssel(s=s):
                sel_block(scr_r[:, sbase + s * sup_lanes:
                                sbase + (s + 1) * sup_lanes])

            pl.when(_grp_live(s))(ssel)

        @pl.when(needs if "sel" not in abl else (bn < -1))
        def _():
            def sel_chunk(rel, _):
                sel_block(scr_r[:, pl.ds(pl.multiple_of(
                    sbase + rel * _CHUNK, _CHUNK), _CHUNK)])
                return 0

            n_win = (bn + _WINDOW - 1) // _WINDOW

            def sel_win_body(w, _):
                wbase = w * _WINDOW
                d = _dma(tb, rec_hbm, scr_r, blo, wbase, 0, _WINDOW,
                         (bpp + tb) * n_seg)
                d.start()
                d.wait()
                nw = jnp.minimum(bn - wbase, _WINDOW)
                jax.lax.fori_loop(0, nw, sel_chunk, 0)
                return 0

            jax.lax.fori_loop(1, n_win, sel_win_body, 0)

        if "pack" in abl:
            return

        if mode == "shade":
            # finish shading IN-KERNEL from the selected record in ROW form —
            # every value below is a (1, band_px) full-lane-width row (same
            # float ops, same order as ops/render._shade_from_sel reading the
            # packed fields; each pre-split part is exactly bf16, so the f32
            # row sums equal the field-reconstruction sums exactly). The
            # 48-wide record never leaves VMEM; the output carries only
            # [rgb hi/lo 6 | w0/w1 hi/lo 4 | pos 3 | pad] — the winner's id
            # bytes arrive in row form through the select itself (record
            # fields 42:45), and z is not emitted (no inference consumer).
            acc = scr_acc[...]

            def row(k):
                return acc[k:k + 1, :]

            def w(k):
                return row(18 + k) + row(24 + k) + row(30 + k)

            pixr = jax.lax.broadcasted_iota(jnp.int32, (1, band_px), 1)
            pxr = (pixr % tile_w).astype(jnp.float32) + 0.5
            pyr = ((pixr // tile_w).astype(jnp.float32)
                   + jnp.float32(t * tile_h) + 0.5)
            x0 = row(36) + row(37) + row(38)
            y0 = row(39) + row(40) + row(41)
            qx = pxr - x0
            qy = pyr - y0
            w0 = w(0) * qx + w(1) * qy + w(2)
            w1 = w(3) * qx + w(4) * qy + w(5)
            w2 = 1.0 - w0 - w1
            parts = []
            for c in range(3):
                cc = (w0 * (row(c) + row(c + 9)) + w1 * (row(c + 3)
                      + row(c + 12)) + w2 * (row(c + 6) + row(c + 15)))
                parts.extend(_split2(cc))
            for v in (w0, w1):
                parts.extend(_split2(v))
            idb = [acc[k:k + 1, :].astype(jnp.bfloat16) for k in (42, 43, 44)]
            packed_ref[0, tb] = jnp.concatenate(
                [*parts, *idb,
                 jnp.zeros((_OUT_S - 13, band_px), jnp.bfloat16)], axis=0)
            return

        # field-major (48, band_px) bf16 rows: every selected field is a
        # single pre-split record part, so the cast is exact; the winner
        # id bytes (rows 42:45) and raster-row bytes (45:48) ride the
        # select itself — no pixel-major pack, no separate pos/z planes
        # (a (.., 1) f32 plane pads 128x in tiled HBM; z has no training
        # consumer and rasterize_batch keeps the §9.5 zbuf contract).
        packed_ref[0, tb] = scr_acc[...].astype(jnp.bfloat16)


    if "dma" not in abl:
        for tb in range(bpp):
            _start(tb)
    for tb in range(bpp):
        _band(tb)


def is_available() -> bool:
    """Used by ops/render.py to pick the hard-visibility backend: the Pallas
    kernel on real TPU, the tiled-jnp path elsewhere (interpret mode stays
    available for explicit CPU testing via rasterize())."""
    return jax.default_backend() in ("tpu", "axon")


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _trunc_bf16(x):
    """Truncate an f32 to its top 16 bits (an exactly-bf16-representable
    f32) via OPAQUE integer ops. The obvious `x - f32(bf16(x))` is NOT
    safe here: this environment compiles with
    --xla_allow_excess_precision=true, which lets XLA treat intermediate
    bf16 casts as value-preserving and fold the residual to zero —
    silently collapsing every split to its first 8-bit part (render PSNR
    dropped 96 -> 30 dB before this was bit-masked)."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        b & jnp.uint32(0xFFFF0000), jnp.float32)


def _split2(x):
    """f32 -> (hi, lo) bf16 parts with x == f32(hi) + f32(lo) to >=16
    significand bits; each part is EXACTLY representable in bf16, so a
    single bf16 MXU pass reads it without rounding."""
    hi = _trunc_bf16(x)
    lo = x - hi                       # exact; <= 16 significand bits left
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _split3(x):
    """f32 -> 3 bf16 parts (8+8+8 truncated bits + final rounding = full
    f32 significand; reconstruction by plain f32 summation is exact)."""
    p0 = _trunc_bf16(x)
    r = x - p0
    p1 = _trunc_bf16(r)
    p2 = r - p1                       # <= 8 significand bits: exact in bf16
    return (p0.astype(jnp.bfloat16), p1.astype(jnp.bfloat16),
            p2.astype(jnp.bfloat16))


def _split_records(records, row_id):
    """Build the (B, 48, rows) bf16 pre-split select record from the
    24-field differentiable attribute record (_pack_render_records).

    Layout (all parts exactly bf16; reconstruction is a plain f32 sum):
      0:9    radiance corner hi    9:18   radiance corner lo (16-bit)
      18:24  affine w-coeff p0     24:30  p1     30:36  p2
             (wa0, wb0, wc0, wa1, wb1, wc1 at FULL f32 — 3x8 = 24
              significand bits; sliver triangles have O(1/area)
              coefficients, so 16 bits exploded their barycentrics)
      36:39  anchor x0 in 3 parts  39:42  anchor y0 in 3 parts
      42:45  bytes of (face id + 1) — the select one-hot's key (position-
             independent: any raster row order works), and the winner id
             in row orientation for the transposed shade-mode select.
             0 = none; bin-pad rows carry the F+2 sentinel via row_id.
      45:48  bytes of (raster ROW index + 1): the select delivers the
             winner's row for free, so the backward one-hot keys on a
             plain in-kernel iota — no row->id table, no id DMA (a
             (rows, 1) id-table DMA also cannot tile on TPU)

    records are FIELD-MAJOR (B, 24, rows); the output is (B, 48, rows) —
    exactly the lane-transposed layout the kernel DMAs, so no transpose
    ever materializes (the old feature-minor layout + transpose cost
    ~40 ms/128 at 224px in padded-tile traffic).

    row_id (rows',) int32: original face id per record row (rows' <= rows;
    trailing all-zero pad records keep byte value 0 = background key,
    which only ever matches uncovered pixels and contributes zeros).
    """
    rad_hi, rad_lo = _split2(records[:, 0:9])
    w0p, w1p, w2p = _split3(records[:, 9:15])
    x0 = _split3(records[:, 15:16])
    y0 = _split3(records[:, 16:17])
    rows = records.shape[-1]
    # slack rows beyond the row table key to an UNMATCHABLE sentinel (not
    # 0): a background pixel's key 0 must select NOTHING, so its whole
    # selected record — including the row bytes below — stays exactly zero
    rid = jnp.full((rows,), 0xFFFFFF, jnp.int32).at[:row_id.shape[0]].set(
        row_id + 1)[None, None, :]
    idb = jnp.concatenate(
        [rid & 255, (rid >> 8) & 255, rid >> 16],
        axis=1).astype(jnp.bfloat16)                 # byte-valued: exact
    idb = jnp.broadcast_to(idb, (records.shape[0], 3, rows))
    rowi = (jnp.arange(rows, dtype=jnp.int32) + 1)[None, None, :]
    rwb = jnp.concatenate(
        [rowi & 255, (rowi >> 8) & 255, rowi >> 16],
        axis=1).astype(jnp.bfloat16)
    rwb = jnp.broadcast_to(rwb, (records.shape[0], 3, rows))
    return jnp.concatenate(
        [rad_hi, rad_lo, w0p, w1p, w2p, *x0, *y0, idb, rwb], axis=1)


def col_width(width: int, n_cols: int) -> int:
    """Per-column pixel width: ceil(width / n_cols) rounded up to the
    8-sublane granularity; the padded tile is n_cols * col_width wide."""
    return ((width + n_cols - 1) // n_cols + 7) // 8 * 8


def _band_windows(verts_ndc, row_faces, row_id, height, width, tile_h,
                  n_cols, cull_backfaces):
    """Sort-free static binning over the RASTER ROW ORDER (a static
    (y-bin, x)-sorted, chunk-aligned-per-bin face permutation built from
    the mean shape — utils/bfm.raster_row_order; identity for plain
    `faces`). Returns the per-band UNION windows (blo, bn) (B, n_bands)
    (the DMA span, also the backward's), the per-(band, column) EXACT
    per-chunk BITMASKS (B, n_bands * n_cols * _MWORDS) int32 flattened
    for scalar prefetch (bit i of word w = the union window's chunk
    32w+i hits the column), and the padded flat setup array whose field
    12 carries the ORIGINAL face id (f32-exact): the kernel's z-test
    ties and the select one-hot key on the id value, so any row order —
    however padded or shuffled — reproduces the oracle's lowest-face-id
    rule exactly."""
    bsz = verts_ndc.shape[0]
    tile_w = col_width(width, n_cols)
    setup = bin_triangles_static_t(verts_ndc, row_faces, height, width,
                                   tile_h, _CHUNK, cull_backfaces,
                                   tile_w=tile_w, mask_words=_MWORDS)
    f = setup.coeffs_t[0].shape[1]
    blo = setup.band_lo.astype(jnp.int32)        # (B, n_bands)
    bn = setup.n_chunks.astype(jnp.int32)
    cmask = setup.chunk_mask                # (B, n_bands, n_cols, _MWORDS)

    rows = padded_rows(f)
    # field-major assembly [setup 12 | id 1 | pad 3]: ONE stack of the
    # unpadded (B, F) blocks, then ONE minor-axis pad; the two -inf pad
    # rows (wc0/wc1 — dead rows must never cover) via a strided row-slice
    # set. NB the ISOLATED windows probe prefers pad-each-then-stack
    # (8.2 vs 13.8 ms/128) but the FULL CHAIN prefers this form (ishade
    # 73.8 vs 81.1, headline 1295 vs 1228 — chain fusion differs from
    # the probe's); trust the chain. Piecewise axis-1 concats at sublane
    # offsets remain the known-worst form (RMW tile amplification).
    idf = jnp.broadcast_to(row_id.astype(jnp.float32)[None, :], (bsz, f))
    zerof = jnp.zeros((bsz, f), jnp.float32)
    flds = list(setup.coeffs_t) + [idf] + [zerof] * (_ROW_PAD - 13)
    pad = rows - f
    coeffs = jnp.pad(jnp.stack(flds, axis=1),
                     ((0, 0), (0, 0), (0, pad)))  # (B, 16, rows)
    if pad:
        coeffs = coeffs.at[:, 2:6:3, f:].set(-3e38)
    return (blo, bn), cmask.reshape(bsz, -1), coeffs


def _unband(arr, bsz, n_bands, tile_h, tile_w, n_cols, height, width,
            fields=None):
    """Invert the kernel's ROW-MAJOR band pixel layout (pix = y*tile_w +
    col*col_w + x) back to (B, [F,] H, W): a PURE RESHAPE + crop. The
    kernel emitted column-blocked order through round 4 and this was a
    (n_cols, tile_h)-swapping relayout (~205 MB a pass at 224px/128) on
    every kernel output; the round-5 in-kernel store remap moved that
    cost to tile_h static scratch stores."""
    del n_cols
    if fields is None:
        a = arr.reshape(bsz, n_bands * tile_h, tile_w)
        return a[:, :height, :width]
    a = arr.reshape(bsz, fields, n_bands * tile_h, tile_w)
    return a[:, :, :height, :width]


def _identity_rows(faces):
    return faces, jnp.arange(faces.shape[0], dtype=jnp.int32)


def banded_plane(packed, k, height, width, tile_h):
    """Field k of a BANDED kernel output (B, n_bands, F, band_px) as a
    cropped (B, height, width) image plane — slice + pure reshape (the
    kernel's band pixel order is row-major), NO field-axis transpose:
    decoding plane-by-plane from the banded output replaced the round-4
    (0,2,1,3) transpose + unband relayout pair (~2x 205 MB a pass)."""
    bsz, n_bands, _, band_px = packed.shape
    tile_w = band_px // tile_h
    a = packed[:, :, k, :].reshape(bsz, n_bands * tile_h, tile_w)
    return a[:, :height, :width]


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "n_cols",
                     "cull_backfaces"))
def rasterize_positions(verts_ndc, faces, *, height: int, width: int,
                        tile_h: int = 2, n_cols: int = 1,
                        cull_backfaces: bool = False,
                        row_faces=None, row_id=None):
    """Batched hard-visibility pass.

    verts_ndc (B,N,3), faces (F,3) -> (tri_id (B,H,W) i32 winning face
    index in ORIGINAL face order (-1 = background), setup records
    (B,rows,16) in RASTER ROW order (= face order when row_faces is
    None), zbuf (B,H,W) f32, (blo, bn) band union chunk windows).

    row_faces/row_id: optional static raster row order (DeviceBFM
    raster_rows/raster_row_id) enabling tight per-column windows.
    """
    if row_faces is None:
        row_faces, row_id = _identity_rows(faces)
    bsz = verts_ndc.shape[0]
    tile_w = col_width(width, n_cols) * n_cols
    n_bands = (height + tile_h - 1) // tile_h
    # bands per program. bpp=2 with up-front dual-slot DMA starts was
    # REMEASURED round 4 and is still 2.5x SLOWER (shade chain 104.6 ->
    # 250.7 ms/128 at 224px) even with both bands' window fetches issued
    # before any compute — the doubled output block defeats the
    # revolving out-write pipeline (the round-3 diagnosis), not the DMA
    # ordering. The slot machinery stays (degenerate at bpp=1).
    bpp = 1
    band_px = tile_h * tile_w
    col_px = band_px // n_cols

    (blo, bn), cmask, coeffs = _band_windows(
        verts_ndc, row_faces, row_id, height, width, tile_h, n_cols,
        cull_backfaces)
    setup_t = coeffs                             # (B, 16 fields, rows)

    packed = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w,
                          n_cols=n_cols, band_px=band_px, mode="pos",
                          bpp=bpp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,      # blo, bn, cmask
            grid=(bsz, n_bands // bpp),
            in_specs=[
                # full array stays in HBM; the kernel DMAs per-band slices
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((_ROW_PAD, bpp * _WINDOW * _CHUNK),
                           jnp.float32),
                pltpu.VMEM((band_px, 1), jnp.float32),
                pltpu.VMEM((band_px, 1), jnp.float32),
                pltpu.VMEM((col_px, _CHUNK), jnp.float32),
                pltpu.VMEM((col_px, _CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((bpp * (_WINDOW // _SEG),)),
            ],
            out_specs=[
                pl.BlockSpec((1, bpp, _OUT_P, band_px),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_bands, _OUT_P, band_px),
                                 jnp.bfloat16),
        ],
        interpret=_interpret(),
    )(blo, bn, cmask, setup_t)[0]

    def pf(k):
        return banded_plane(packed, k, height, width,
                            tile_h).astype(jnp.float32)

    pos = (pf(0) + pf(1) * 256.0 + pf(2) * 65536.0).astype(jnp.int32) - 1
    zbuf = pf(3) + pf(4) + pf(5)                        # exact 3-part sum
    # ids beyond the live face count are dead padding (can never win —
    # but guard anyway); pos IS the face id in original order
    hit = (pos >= 0) & (pos < faces.shape[0])
    pos = jnp.where(hit, pos, -1)
    zbuf = jnp.where(hit, zbuf, jnp.inf)
    return pos, coeffs, zbuf, (blo, bn)


@functools.partial(
    jax.jit,
    static_argnames=("n_faces", "height", "width", "tile_h", "n_cols",
                     "cull_backfaces"))
def _fused_impl(rec_t, verts_ndc, row_faces, row_id, *, n_faces: int,
                height: int, width: int, tile_h: int, n_cols: int,
                cull_backfaces: bool = False):
    """Forward of the fused raster+select: rec_t (B,48,rows) PRE-SPLIT
    bf16 kernel records in raster row order (rows = padded_rows(F');
    _split_records layout), verts_ndc non-differentiable positions ->
    (tri_id (B,H,W) original face ids, sel BANDED
    (B, n_bands, 48, band_px) f32 pre-split winner record — plane k of
    the image is banded_plane(sel, k, ...), a slice + pure reshape —
    band union windows). No zbuf: depth has no gradient and no training
    consumer (§9.6); rasterize_batch serves the §9.5 zbuf contract."""
    bsz = verts_ndc.shape[0]
    tile_w = col_width(width, n_cols) * n_cols
    n_bands = (height + tile_h - 1) // tile_h
    # bands per program. bpp=2 with up-front dual-slot DMA starts was
    # REMEASURED round 4 and is still 2.5x SLOWER (shade chain 104.6 ->
    # 250.7 ms/128 at 224px) even with both bands' window fetches issued
    # before any compute — the doubled output block defeats the
    # revolving out-write pipeline (the round-3 diagnosis), not the DMA
    # ordering. The slot machinery stays (degenerate at bpp=1).
    bpp = 1
    band_px = tile_h * tile_w
    col_px = band_px // n_cols
    # record height: 48 (_RFIELDS) inference frame, or 56 when the
    # training record appends the exact hi/lo skin-corner rows (the
    # select's MXU dot is one <=128-row tile either way — measured
    # row-count independent, STATUS round-5)
    rfields = rec_t.shape[1]

    (blo, bn), cmask, coeffs = _band_windows(
        verts_ndc, row_faces, row_id, height, width, tile_h, n_cols,
        cull_backfaces)
    # setup and records LANE-TRANSPOSED: (B, fields, rows) — a window DMA
    # lands all its chunks side-by-side on lanes so slabs read static
    # lane slices
    setup_t = coeffs                   # already (B, 16 fields, rows)

    packed = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w,
                          n_cols=n_cols, band_px=band_px, mode="select",
                          bpp=bpp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bsz, n_bands // bpp),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # setup, HBM
                pl.BlockSpec(memory_space=pl.ANY),   # records, HBM
            ],
            scratch_shapes=[
                pltpu.VMEM((_ROW_PAD, bpp * _WINDOW * _CHUNK),
                           jnp.float32),
                pltpu.VMEM((rfields, bpp * _WINDOW * _CHUNK),
                           jnp.bfloat16),
                pltpu.VMEM((band_px, 1), jnp.float32),
                pltpu.VMEM((band_px, 1), jnp.float32),
                pltpu.VMEM((col_px, _CHUNK), jnp.float32),
                pltpu.VMEM((col_px, _CHUNK), jnp.float32),
                pltpu.VMEM((rfields, band_px), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * bpp * (_WINDOW // _SEG),)),
            ],
            out_specs=[
                pl.BlockSpec((1, bpp, rfields, band_px),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_bands, rfields, band_px),
                                 jnp.bfloat16),
        ],
        interpret=_interpret(),
    )(blo, bn, cmask, setup_t, rec_t)[0]

    # the select output stays BANDED (B, n_bands, 48, band_px): the
    # kernel's band pixel order is row-major (round 5), so every consumer
    # decodes plane k by slice + pure reshape (banded_plane) — no
    # field-axis transpose, no unband relayout (the round-4 pair cost
    # ~2x 205 MB a pass), and the backward's cotangent arrives already
    # banded, exactly the layout the adjoint kernel DMAs. f32 here keeps
    # the custom-VJP boundary (and thus the cotangent) full-precision.
    prec = packed.astype(jnp.float32)
    # winner id + 1 rides the selected record's byte fields (42:45);
    # 0 = background (the zero record — its one-hot key matches nothing)
    pos = (banded_plane(prec, 42, height, width, tile_h)
           + banded_plane(prec, 43, height, width, tile_h) * 256.0
           + banded_plane(prec, 44, height, width, tile_h)
           * 65536.0).astype(jnp.int32) - 1
    hit = (pos >= 0) & (pos < n_faces)
    pos = jnp.where(hit, pos, -1)
    # (blo, bn) ride along for the VJP residuals: re-binning in _rs_fwd
    # would redo full triangle setup per training forward (nothing
    # guarantees CSE across the custom_vjp boundary)
    return pos, prec, blo, bn


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "n_cols",
                     "cull_backfaces"))
def rasterize_shaded(records, verts_ndc, faces, *, height: int, width: int,
                     tile_h: int, n_cols: int = 1,
                     cull_backfaces: bool = False,
                     row_faces=None, row_id=None):
    """Fused raster + select + IN-KERNEL shading — the inference hot path.

    Same phase 1/2 as rasterize_select, but the winner's record is blended
    into the final per-pixel color and barycentrics inside the kernel
    (mode="shade"), so only 16 output fields per pixel reach HBM instead
    of the 48-field record plus a separate shade stage. NON-differentiable
    (inference only — training uses rasterize_select, whose custom VJP is
    the select's matmul adjoint). The shade select runs TRANSPOSED
    (acc (48, band_px)) so the in-kernel shade math is full-lane-width
    row ops, and the winner id arrives in row form through the record's
    id bytes; depth is not emitted (no inference consumer).

    Returns (tri_id (B,H,W) i32, color (B,H,W,3) f32, bary (B,H,W,3)).
    """
    records = jax.lax.stop_gradient(records)
    verts_ndc = jax.lax.stop_gradient(verts_ndc)
    if row_faces is None:
        row_faces, row_id = _identity_rows(faces)
    # accept either the 24-field attribute record (legacy; split here)
    # or the 48-field pre-split kernel record (ops/render builds it
    # directly from the shared field blocks — one materialization)
    rec_t = (_split_records(records, row_id)
             if records.shape[1] == _FIELDS else records)
    bsz = verts_ndc.shape[0]
    tile_w = col_width(width, n_cols) * n_cols
    n_bands = (height + tile_h - 1) // tile_h
    # bands per program. bpp=2 with up-front dual-slot DMA starts was
    # REMEASURED round 4 and is still 2.5x SLOWER (shade chain 104.6 ->
    # 250.7 ms/128 at 224px) even with both bands' window fetches issued
    # before any compute — the doubled output block defeats the
    # revolving out-write pipeline (the round-3 diagnosis), not the DMA
    # ordering. The slot machinery stays (degenerate at bpp=1).
    bpp = 1
    band_px = tile_h * tile_w
    col_px = band_px // n_cols

    (blo, bn), cmask, coeffs = _band_windows(
        verts_ndc, row_faces, row_id, height, width, tile_h, n_cols,
        cull_backfaces)
    setup_t = coeffs                   # already (B, 16 fields, rows)

    packed = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w,
                          n_cols=n_cols, band_px=band_px, mode="shade",
                          bpp=bpp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bsz, n_bands // bpp),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # setup, HBM
                pl.BlockSpec(memory_space=pl.ANY),   # records, HBM
            ],
            scratch_shapes=[
                pltpu.VMEM((_ROW_PAD, bpp * _WINDOW * _CHUNK),
                           jnp.float32),
                pltpu.VMEM((rec_t.shape[1], bpp * _WINDOW * _CHUNK),
                           jnp.bfloat16),
                pltpu.VMEM((band_px, 1), jnp.float32),
                pltpu.VMEM((band_px, 1), jnp.float32),
                pltpu.VMEM((col_px, _CHUNK), jnp.float32),
                pltpu.VMEM((col_px, _CHUNK), jnp.float32),
                pltpu.VMEM((rec_t.shape[1], band_px), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * bpp * (_WINDOW // _SEG),)),
            ],
            out_specs=[
                pl.BlockSpec((1, bpp, _OUT_S, band_px),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_bands, _OUT_S, band_px),
                                 jnp.bfloat16),
        ],
        interpret=_interpret(),
    )(blo, bn, cmask, setup_t, rec_t)[0]

    def plane(k):
        return banded_plane(packed, k, height, width,
                            tile_h).astype(jnp.float32)

    pos = (plane(10).astype(jnp.int32)
           + plane(11).astype(jnp.int32) * 256
           + plane(12).astype(jnp.int32) * 65536) - 1
    hit = (pos >= 0) & (pos < faces.shape[0])
    pos = jnp.where(hit, pos, -1)
    w0 = plane(6) + plane(7)
    w1 = plane(8) + plane(9)
    # mask per scalar plane BEFORE stacking (minor-dim padding, see
    # _shade_from_sel)
    color = jnp.stack([jnp.where(hit, plane(2 * c) + plane(2 * c + 1), 0.0)
                       for c in range(3)], axis=-1)
    bary = jnp.stack([jnp.where(hit, v, 0.0)
                      for v in (w0, w1, 1.0 - w0 - w1)], axis=-1)
    return pos, color, bary


def rasterize_select(records, verts_ndc, faces, height: int, width: int,
                     tile_h: int, cull_backfaces: bool = False,
                     n_cols: int = 1, row_faces=None, row_id=None,
                     rec48=None):
    """Fused hard-visibility + per-pixel record select (the TPU render hot
    path): records (B, 24, padded_rows(F')) render attributes [radiance
    corners 9 | affine w-coeffs 6 | anchor 2 | pad] in raster row order ->
    (tri_id, sel BANDED (B, n_bands, 48, band_px) f32),
    where sel is the winner's pre-split record in the kernel's row-major
    band pixel order (_split_records field layout; plane k of the image
    is banded_plane(sel, k, ...), a slice + pure reshape — ops/render.py
    reconstructs radiance/barycentrics/corners from it). No zbuf: depth
    carries no gradient (§9.6) and the §9.5 (tri_id, bary, zbuf) contract
    is rasterize_batch's.

    Differentiable in `records` only (SURVEY.md §9.6: tri_id frozen).
    The backward is the matmul ADJOINT of the one-hot select, computed by
    a group-blocked Pallas kernel (_grad_kernel) instead of the reference
    family's scatter-add — TPU scatters run at ~element/cycle. In the
    hi/lo field decomposition x == hi + lo, hi is a staircase of x (zero
    derivative a.e.), so the cotangent of x is the LO part's alone.

    rec48: optional precomputed (B,48,rows) bf16 pre-split kernel record
    (ops/render._pack_split_records, built from the same field blocks as
    `records`). The kernel DMAs ONLY rec48; `records` is the gradient
    carrier — its stacked value is dead in the forward, so XLA DCEs the
    24-field materialization and keeps just the autodiff residuals."""
    if row_faces is None:
        row_faces, row_id = _identity_rows(faces)
    if rec48 is None:
        rec48 = jax.lax.stop_gradient(_split_records(records, row_id))
    return _rs_core(records, rec48, verts_ndc, row_faces, row_id,
                    faces.shape[0], height, width, tile_h, n_cols,
                    cull_backfaces)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _rs_core(records, rec48, verts_ndc, row_faces, row_id, n_faces: int,
             height: int, width: int, tile_h: int, n_cols: int,
             cull_backfaces: bool):
    return _fused_impl(rec48, jax.lax.stop_gradient(verts_ndc),
                       row_faces, row_id, n_faces=n_faces, height=height,
                       width=width, tile_h=tile_h, n_cols=n_cols,
                       cull_backfaces=cull_backfaces)[:2]


def _rs_fwd(records, rec48, verts_ndc, row_faces, row_id, n_faces, height,
            width, tile_h, n_cols, cull_backfaces):
    pos, prec, blo, bn = _fused_impl(
        rec48, jax.lax.stop_gradient(verts_ndc), row_faces, row_id,
        n_faces=n_faces, height=height, width=width, tile_h=tile_h,
        n_cols=n_cols, cull_backfaces=cull_backfaces)
    # the winner's RASTER ROW rides the select in record fields 45:48
    # (see _split_records), so the backward keys its one-hot on a plain
    # row iota — no raster-row -> face-id table, no id DMA. Kept BANDED
    # (B, n_bands, band_px) — exactly the layout the adjoint kernel
    # DMAs. Background pixels select the all-zero record (row decodes to
    # -1, matches nothing); out-of-image pad pixels may carry a live row
    # but their cotangent is identically zero (consumers only read
    # cropped planes), so they add nothing to the adjoint dots.
    rowp = (prec[:, :, 45] + prec[:, :, 46] * 256.0
            + prec[:, :, 47] * 65536.0).astype(jnp.int32) - 1
    return (pos, prec), (rowp, records.shape, blo, bn)


def _grad_kernel(blo_ref, bhi_ref, pos_hbm, g_hbm, out_ref,
                 scr_pos, scr_g, sem, *, band_px: int):
    """Backward of the one-hot select WITHOUT a scatter: the adjoint of
    sel = onehot @ rec is d_rec = onehot^T @ g — another one-hot matmul.
    Per (image, 8-chunk group) program: accumulate over the bands whose
    candidate window intersects the group (2-3 on coherent meshes). The
    one-hot keys the winner RASTER ROW (delivered by the forward select
    through record fields 45:48) against a plain row iota — exact under
    any row order, and needs no raster-row -> face-id table (whose
    (rows, 1) DMA also cannot tile on TPU). This replaces the XLA
    segment-sum scatter, which ran at ~element/cycle (~200 ms per
    batch-32 train step); the MXU form is ~50x faster."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    lo = blo_ref[b, g]
    hi = bhi_ref[b, g]
    tri_i = (jax.lax.broadcasted_iota(jnp.int32, (_GLANES, 1), 0)
             + g * _GLANES)                 # (GLANES, 1) row indices

    # the accumulator lives in the (VMEM-resident) output block — a
    # (24, 1024) f32 value carried through the fori_loop paid ~1 us of
    # VMEM round-trips PER band. Band fetches are double-buffered into
    # slot A/B scratch halves (scr_pos/scr_g are (2, ...)), so band k+1's
    # DMA overlaps band k's dots: the serial start/wait loop exposed
    # ~2 us of DMA latency per band (~12 covered bands/group at training
    # poses).
    out_ref[0, 0] = jnp.zeros((_FIELDS, _GLANES), jnp.float32)

    def start(band, slot):
        pltpu.make_async_copy(pos_hbm.at[b, band],
                              scr_pos.at[slot], sem.at[2 * slot]).start()
        pltpu.make_async_copy(g_hbm.at[b, band],
                              scr_g.at[slot], sem.at[2 * slot + 1]).start()

    def wait(band, slot):
        pltpu.make_async_copy(pos_hbm.at[b, band],
                              scr_pos.at[slot], sem.at[2 * slot]).wait()
        pltpu.make_async_copy(g_hbm.at[b, band],
                              scr_g.at[slot], sem.at[2 * slot + 1]).wait()

    def accumulate(slot):
        # pixel winner ROWS of this band vs this group's row range
        onehot_t = (scr_pos[slot] == tri_i).astype(jnp.bfloat16)
        gt = scr_g[slot]                        # (fields, band_px) f32
        hi_f = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(gt, jnp.uint32)
            & jnp.uint32(0xFFFF0000), jnp.float32)   # opaque truncation
        hi_p = hi_f.astype(jnp.bfloat16)
        lo_p = (gt - hi_f).astype(jnp.bfloat16)
        acc = out_ref[0, 0]
        for part in (hi_p, lo_p):               # 16-bit gradient precision
            acc = acc + jax.lax.dot_general(
                part, onehot_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0, 0] = acc

    pl.when(lo <= hi)(lambda: start(lo, 0))

    def pair(k, _):
        i0 = lo + 2 * k                        # slot 0 DMA in flight
        pl.when(i0 + 1 <= hi)(lambda: start(i0 + 1, 1))
        wait(i0, 0)
        accumulate(0)
        pl.when(i0 + 2 <= hi)(lambda: start(i0 + 2, 0))

        @pl.when(i0 + 1 <= hi)
        def _():
            wait(i0 + 1, 1)
            accumulate(1)

        return 0

    jax.lax.fori_loop(0, (hi + 2 - lo) // 2, pair, 0)


@functools.partial(jax.jit,
                   static_argnames=("rows", "height", "width", "tile_h",
                                    "n_cols"))
def _select_grad(pos, g_sel, blo, bn, *, rows: int, height: int,
                 width: int, tile_h: int, n_cols: int):
    """pos (B, n_bands, band_px) BANDED winner RASTER ROWS (-1 =
    background), g_sel (B, n_bands, 48, band_px) BANDED cotangent, band
    union chunk windows -> d attribute-records (B, 24, rows) field-major
    (raster row order): radiance lo-fields 9:18 and corner lo-fields of
    the split layout, group-blocked matmul adjoint. Since the round-5
    row-major band pixel order, both inputs arrive ALREADY banded from
    the forward (no re-banding transposes — the round-4 path relaid
    ~820 MB of f32 cotangent per step here)."""
    bsz = pos.shape[0]
    tile_w = col_width(width, n_cols) * n_cols
    band_px = tile_h * tile_w
    n_bands = (height + tile_h - 1) // tile_h
    ngrp = rows // _GLANES
    # the per-band DMA's minor extent must be 128-aligned (Mosaic rejects
    # a 448-wide slice of a 512-padded tiled buffer), so the band arrays
    # pad to the next lane multiple; the pad columns carry pos = -1 and
    # zero cotangent, so they only widen the dot's K dim (~14% at 224px)
    bpad = (-band_px) % 128
    band_k = band_px + bpad

    # gather the differentiable cotangent fields into the 24-wide
    # attribute layout. In an exact multi-part split x = p0 + ... + pk,
    # every part but the LAST is a staircase of x (zero derivative a.e.),
    # so the last part's cotangent is the cotangent of x.
    g24 = jnp.concatenate(
        [g_sel[:, :, 9:18],                    # radiance (lo part)
         g_sel[:, :, 30:36],                   # w-coeffs (p2)
         g_sel[:, :, 38:39], g_sel[:, :, 41:42],  # anchors x0, y0 (p2)
         jnp.zeros_like(g_sel[:, :, :7])],
        axis=2)                                # (B, n_bands, 24, band_px)
    g_b = jnp.pad(g24, ((0, 0), (0, 0), (0, 0), (0, bpad)))
    pos_b = jnp.pad(pos[:, :, None, :],
                    ((0, 0), (0, 0), (0, 0), (0, bpad)),
                    constant_values=-1)

    # per 8-chunk group: the contiguous range of bands whose chunk window
    # intersects it (every band on incoherent meshes — slow but correct)
    grp = jnp.arange(ngrp)[None, None, :]                # (1, 1, ngrp)
    cover = ((blo[:, :, None] < (grp + 1) * _BGRP)
             & (grp * _BGRP < (blo + bn)[:, :, None]))   # (B, nb, ngrp)
    any_c = jnp.any(cover, axis=1)
    first = jnp.argmax(cover, axis=1).astype(jnp.int32)
    last = (n_bands - 1
            - jnp.argmax(cover[:, ::-1], axis=1)).astype(jnp.int32)
    b_lo = jnp.where(any_c, first, 1)
    b_hi = jnp.where(any_c, last, 0)                     # empty -> hi < lo

    grad = pl.pallas_call(
        functools.partial(_grad_kernel, band_px=band_px),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz, ngrp),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),       # pos, HBM
                pl.BlockSpec(memory_space=pl.ANY),       # g, HBM
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 1, band_k), jnp.int32),
                pltpu.VMEM((2, _FIELDS, band_k), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, _FIELDS, _GLANES),
                             lambda b, g, *_: (b, g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, ngrp, _FIELDS, _GLANES),
                                 jnp.float32),
        ],
        interpret=_interpret(),
    )(b_lo, b_hi, pos_b, g_b)[0]

    # (B, ngrp, 24, GLANES) -> (B, 24, rows): field-major like the
    # records (rows = ngrp * GLANES concatenated along the minor axis)
    grad = grad.reshape(bsz, ngrp, _FIELDS, _GLANES)
    grad = grad.transpose(0, 2, 1, 3).reshape(bsz, _FIELDS, rows)
    return grad


def _rs_bwd(n_faces, height, width, tile_h, n_cols, cull_backfaces, res,
            g):
    rowp, rec_shape, blo, bn = res
    _, g_sel = g            # g_sel is BANDED (B, n_bands, 48, band_px)
    # hi split parts are staircases of the source value (zero derivative
    # a.e.), so only the LO fields carry the cotangent — _select_grad
    # gathers them and runs the matmul adjoint (no scatter)
    grad = _select_grad(rowp, g_sel, blo, bn, rows=rec_shape[2],
                        height=height, width=width, tile_h=tile_h,
                        n_cols=n_cols)
    return grad, None, None, None, None


_rs_core.defvjp(_rs_fwd, _rs_bwd)


def _pack_contract_records(coeffs_t, row_id, pad_rows: int):
    """(B, 48, rows) bf16 pre-split CONTRACT record for the §9.5
    (tri_id, bary, zbuf) path, built from the binning field blocks
    (ops/binning.bin_triangles_static_t coeffs_t layout: wa0, wb0, wc0,
    wa1, wb1, wc1, za, zb, zc, x0, y0, ymin).

    Same 48-row frame as _split_records so mode="select" serves it
    unchanged (the one-hot keys on fields 42:45; everything else is
    caller-defined payload):
      0:3/3:6/6:9   za/zb/zc in 3 exact bf16 parts (full-f32 depth affine)
      18:36         w-coefficients p0 x6 | p1 x6 | p2 x6 (matches the
                    render record's slots, so the decode shares indexing)
      36:39/39:42   anchor x0 / y0 in 3 parts
      42:45/45:48   (face id + 1) bytes / (raster row + 1) bytes
    Rows 9:18 are zero. Every part is exactly bf16, so the f32
    reconstruction — and hence the decoded bary/zbuf — equals a direct
    f32 evaluation of the setup fields bit for bit."""
    b, f = coeffs_t[0].shape
    pad = pad_rows - f

    z_sp = [_split3(coeffs_t[k]) for k in (6, 7, 8)]      # za, zb, zc
    w_sp = [_split3(coeffs_t[k]) for k in range(6)]       # wa0..wc1
    x_sp = _split3(coeffs_t[9])
    y_sp = _split3(coeffs_t[10])
    def pd(a):
        return jnp.pad(a, ((0, 0), (0, pad)))

    zero = jnp.zeros((b, pad_rows), jnp.float32)
    # pad-each-then-stack (the fused form; see _pack_split_records)
    parts = ([pd(p) for z in z_sp for p in z] + [zero] * 9
             + [pd(w[0]) for w in w_sp] + [pd(w[1]) for w in w_sp]
             + [pd(w[2]) for w in w_sp]
             + [pd(p) for p in x_sp] + [pd(p) for p in y_sp])
    rid = jnp.full((pad_rows,), 0xFFFFFF,
                   jnp.int32).at[:row_id.shape[0]].set(row_id + 1)
    rowi = jnp.arange(pad_rows, dtype=jnp.int32) + 1
    stat = [jnp.broadcast_to(a.astype(jnp.bfloat16)[None, :],
                             (b, pad_rows))
            for a in (rid & 255, (rid >> 8) & 255, rid >> 16,
                      rowi & 255, (rowi >> 8) & 255, rowi >> 16)]
    return jnp.stack([p.astype(jnp.bfloat16) for p in parts] + stat,
                     axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "cfg", "tile_h", "n_cols",
                     "cull_backfaces"))
def rasterize_batch(verts_ndc, faces, *, height: int, width: int, cfg=None,
                    tile_h: int = 2, n_cols: int = 1,
                    cull_backfaces: bool = False,
                    row_faces=None, row_id=None):
    """Full SURVEY.md §9.5 contract: (tri_id, bary, zbuf), batched.

    Routed through the FUSED SELECT kernel (mode="select") with a
    contract record carrying the depth and barycentric affine forms
    (_pack_contract_records): the old dedicated pos-mode pass cost
    ~14x the fused path — its per-band (band_px, 1) -> (1, band_px)
    in-kernel relayout serialized on the scalar core — and its decode
    needed a per-pixel record row gather (~element/cycle on TPU). Here
    the MXU select delivers each pixel's winner fields in dense planes
    and the decode is pure elementwise math. Values are bit-identical:
    same phase-1 z-test, and the affine forms are carried at full f32
    precision in exact bf16 parts.

    Fully jitted — eager dispatch over the axon tunnel costs seconds per op.
    """
    if cfg is not None:
        tile_h = cfg.tile_h
    if row_faces is None:
        row_faces, row_id = _identity_rows(faces)
    setup = bin_triangles_static_t(
        verts_ndc, row_faces, height, width, tile_h, _CHUNK,
        cull_backfaces, tile_w=col_width(width, n_cols),
        mask_words=_MWORDS)  # CSE'd with _fused_impl's identical call
    rec = _pack_contract_records(setup.coeffs_t, row_id,
                                 padded_rows(row_faces.shape[0]))
    tri_id, prec, _, _ = _fused_impl(
        rec, verts_ndc, row_faces, row_id, n_faces=faces.shape[0],
        height=height, width=width, tile_h=tile_h, n_cols=n_cols,
        cull_backfaces=cull_backfaces)
    hit = tri_id >= 0

    def f(k):       # banded (B, n_bands, 48, band_px) -> (B, H, W) plane
        return banded_plane(prec, k, height, width, tile_h)

    def w(k):     # affine coefficient k: 3 exact bf16 parts = full f32
        return f(18 + k) + f(24 + k) + f(30 + k)

    jj, ii = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
    qx = (jj + 0.5).astype(jnp.float32)[None] - (f(36) + f(37) + f(38))
    qy = (ii + 0.5).astype(jnp.float32)[None] - (f(39) + f(40) + f(41))
    w0 = w(0) * qx + w(1) * qy + w(2)
    w1 = w(3) * qx + w(4) * qy + w(5)
    za = f(0) + f(1) + f(2)
    zb = f(3) + f(4) + f(5)
    zc = f(6) + f(7) + f(8)
    zbuf = jnp.where(hit, za * qx + zb * qy + zc, jnp.inf)
    bary = jnp.stack([jnp.where(hit, v, 0.0)
                      for v in (w0, w1, 1.0 - w0 - w1)], axis=-1)
    return tri_id, bary, zbuf


def rasterize(verts_ndc, faces, *, height: int, width: int,
              tile_h: int = 2, cull_backfaces: bool = False):
    """Single-mesh wrapper matching rasterize_jnp/rasterize_tiled."""
    tid, bary, z = rasterize_batch(
        verts_ndc[None], faces, height=height, width=width, tile_h=tile_h,
        cull_backfaces=cull_backfaces)
    return tid[0], bary[0], z[0]
