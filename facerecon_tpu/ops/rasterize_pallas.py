"""Pallas TPU z-buffer rasterizer — SURVEY.md §3 C8, design per §9.5.

Replaces the reference's C++/CUDA z-buffer op with a tile-based Mosaic/TPU
kernel. Shares triangle setup + y-band binning with ops/rasterize_tiled.py
(ops/binning.py). Round-2 structure:

  - GROUPED LANE EVAL: 8 triangle chunks are laid side-by-side on the lane
    axis (8x128 = 1024 lanes per eval step), so the two cross-lane
    reductions (depth argmin + winner lane) run once per 8 chunks instead of
    once per chunk — reductions were ~60% of round-1 kernel time.
  - FUSED RECORD SELECT: after the z-loop, the same kernel one-hot-matmuls
    the per-pixel winner's render record out of the band's candidate window
    (MXU does the gather). This removes the separate select kernel: its
    duplicate window DMA, its per-band fixed cost, and the HBM round-trip
    of the winner positions. The dot's cost is the stationary-weight load
    (proportional to passes x K and INDEPENDENT of the record width), so
    records are PRE-SPLIT into exactly-bf16-representable field parts
    (_split_records: hi/lo pairs for 16-bit fields, 3 parts for the
    pixel-coordinate anchors) and ONE bf16 pass reads all 48 fields with
    no rounding: each product is an exact bf16 value, each pixel row has
    exactly one nonzero product.
  - MULTI-WINDOW COVERAGE: a band whose candidate span exceeds the VMEM
    window loops further DMA windows instead of silently truncating
    (round-1 clamped to the window — wrong pixels for spatially incoherent
    face orderings). Any input is now correct; incoherent orderings only
    degrade speed.

Data layout: per-band candidates are a contiguous group-aligned slice of
the setup array in ORIGINAL face order (sort-free binning); within a group,
records are (16 fields x 1024 triangles) so field extraction is a sublane
slice and the affine edge functions are dual-broadcast FMAs on the VPU
(pixels from a (band_px,1) column, triangle coefficients from a (1,1024)
row — no materialized (band_px, lanes) iotas). tri_id stays integer ->
non-differentiable per the §9.6 contract; the fused select output carries
the differentiable path (custom VJP scatter-adds record cotangents).

Tie rule: equal depth resolves to the lowest lane within a group (= lowest
face id, original order) and strict < across groups — matching the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facerecon_tpu.ops.binning import SETUP_WIDTH, bin_triangles_static

_CHUNK = 128            # triangles per chunk (= base lane count)
_GRP = 8                # chunks fused side-by-side on the lane axis
_GLANES = _GRP * _CHUNK  # 1024 lanes per eval step
_WINDOW = 16            # groups per DMA window (= 128 chunks, 1 MB scratch)
_HEAD = 2               # groups in the eager head DMA (covers typical bands)
_MID = 2                # groups in the second eager DMA (gn in (2,4])
_ROW_PAD = 16           # setup record fields padded 12 -> 16 for tiling
_FIELDS = 24            # caller-facing render-attribute record width
_RFIELDS = 48           # pre-split select record width (see _split_records)
_OUT_F = 56             # packed bf16 output row: sel 48 | pos 3 | z 2 | pad


def padded_rows(n_faces: int) -> int:
    """Static row count of the padded setup/record arrays for n_faces:
    whole groups plus a full DMA window of slack so fixed-size per-band
    fetches stay in bounds for every window of every band."""
    ngrp = (n_faces + _GLANES - 1) // _GLANES + _WINDOW
    return ngrp * _GLANES


def _kernel(glo_ref, gn_ref, setup_hbm, *rest, tile_h: int, tile_w: int,
            band_px: int, with_select: bool):
    """Per (image, band) program.

    Phase 1 (z-test): DMA the band's candidate window(s) of setup records
    HBM->VMEM and keep a running (depth, position) winner per pixel.
    Phase 2 (select, optional): one-hot-matmul each pixel's winner render
    record out of the record window(s), which were DMA'd during phase 1.

    Scalars are flattened to (B, n_bands): a short trailing dim would pad
    to 128 lanes in SMEM (64x memory blowup).
    """
    if with_select:
        rec_hbm, packed_ref, scr_s, scr_r, sem = rest
    else:
        pos_ref, z_ref, scr_s, sem = rest
    b = pl.program_id(0)
    t = pl.program_id(1)
    glo = glo_ref[b, t]          # first candidate group (global index)
    gn = gn_ref[b, t]            # live group count (may exceed _WINDOW)

    def dma(hbm, scr, wbase, lo, size, s):
        return pltpu.make_async_copy(
            hbm.at[b, pl.ds(glo + wbase + lo, size)],
            scr.at[pl.ds(lo, size)], sem.at[s])

    # window-0 transfers, sized to the common case: head (2 groups) always,
    # mid (2 more) when the band needs them, tail (rest of the window) only
    # for wide spans — typical bands move 128-256 KB, not the whole 1 MB.
    head = dma(setup_hbm, scr_s, 0, 0, _HEAD, 0)
    head.start()
    has_mid = gn > _HEAD
    has_tail = gn > _HEAD + _MID

    @pl.when(has_mid)
    def _():
        dma(setup_hbm, scr_s, 0, _HEAD, _MID, 1).start()

    @pl.when(has_tail)
    def _():
        dma(setup_hbm, scr_s, 0, _HEAD + _MID,
            _WINDOW - _HEAD - _MID, 2).start()

    if with_select:
        # record window DMAs overlap phase-1 compute
        rhead = dma(rec_hbm, scr_r, 0, 0, _HEAD, 3)
        rhead.start()

        @pl.when(has_mid)
        def _():
            dma(rec_hbm, scr_r, 0, _HEAD, _MID, 4).start()

        @pl.when(has_tail)
        def _():
            dma(rec_hbm, scr_r, 0, _HEAD + _MID,
                _WINDOW - _HEAD - _MID, 5).start()

    # pixel coordinates as a (band_px, 1) column — broadcast across lanes
    # inside the affine ops (materializing (band_px, GLANES) iotas costs
    # ~6 MB of vregs/VMEM and spills)
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (band_px, 1), 0)
    px = (pix_i % tile_w).astype(jnp.float32) + 0.5
    py = (pix_i // tile_w).astype(jnp.float32) + jnp.float32(t * tile_h) + 0.5
    # f32 lane indices (1, GLANES): cross-lane min is native for f32 but
    # emulated (~10x slower) for int32; lane values (<1024) are exact in f32
    lane_f = jax.lax.broadcasted_iota(
        jnp.int32, (1, _GLANES), 1).astype(jnp.float32)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, _GLANES), 1)

    def eval_group(g, carry, wbase):
        """One 1024-triangle group at window-relative index g (traced)."""
        zbest, posbest = carry
        c = scr_s[g]                              # (16 fields, GLANES tris)
        # anchored dual-broadcast affine eval -> (band_px, GLANES)
        qx = px - c[9:10]
        qy = py - c[10:11]
        e0 = c[0:1] * qx + c[1:2] * qy + c[2:3]
        e1 = c[3:4] * qx + c[4:5] * qy + c[5:6]
        ez = c[6:7] * qx + c[7:8] * qy + c[8:9]
        cov = (e0 >= 0.0) & (e1 >= 0.0) & (e0 + e1 <= 1.0)
        zm = jnp.where(cov, ez, jnp.inf)
        zmin = jnp.min(zm, axis=1, keepdims=True)            # (band_px, 1)
        win_f = jnp.min(jnp.where(zm == zmin, lane_f, 3e38),
                        axis=1, keepdims=True)
        better = zmin < zbest
        zbest = jnp.where(better, zmin, zbest)
        posbest = jnp.where(
            better,
            (glo + wbase + g) * _GLANES + win_f.astype(jnp.int32),
            posbest)
        return zbest, posbest

    init = (jnp.full((band_px, 1), jnp.inf, jnp.float32),
            jnp.full((band_px, 1), -1, jnp.int32))
    gn0 = jnp.minimum(gn, _WINDOW)               # live groups in window 0

    # ONE loop with in-body waits at the head/mid/tail DMA boundaries:
    # separate fori constructs per DMA segment cost ~µs each in fixed
    # overhead, which dominates at 2-3 live groups per band
    def eval_body(g, carry):
        @pl.when(g == _HEAD)
        def _():
            dma(setup_hbm, scr_s, 0, _HEAD, _MID, 1).wait()

        @pl.when(g == _HEAD + _MID)
        def _():
            dma(setup_hbm, scr_s, 0, _HEAD + _MID,
                _WINDOW - _HEAD - _MID, 2).wait()

        return eval_group(g, carry, 0)

    head.wait()
    carry = jax.lax.fori_loop(0, gn0, eval_body, init)

    # overflow windows (rare: spatially incoherent face order / extreme
    # rotation). Sequential DMA + eval; correctness over speed.
    n_win = (gn + _WINDOW - 1) // _WINDOW

    def win_body(w, carry):
        wbase = w * _WINDOW
        d = dma(setup_hbm, scr_s, wbase, 0, _WINDOW, 0)
        d.start()
        d.wait()
        nw = jnp.minimum(gn - wbase, _WINDOW)
        return jax.lax.fori_loop(
            0, nw, lambda g, c: eval_group(g, c, wbase), carry)

    zbest, posbest = jax.lax.fori_loop(1, n_win, win_body, carry)

    if not with_select:
        pos_ref[0, 0] = posbest
        z_ref[0, 0] = zbest
        return

    # ---- phase 2: one-hot MXU select of the winner's render record ----
    # The dot's cost is the stationary-weight load, proportional to
    # passes x K — the records are PRE-SPLIT into exactly-bf16-representable
    # field parts (hi/lo pairs; 3 parts for the pixel-scale anchors), so a
    # SINGLE bf16 pass reads every field exactly (measured: one pass of
    # N=48 costs the same as one pass of N=16; three passes cost 3x).
    # Restricting the loop to the winner group range costs nothing but
    # prunes nothing on single-layer surfaces — kept for the pathological
    # multi-layer case.
    pv = jnp.where(posbest >= 0, posbest, jnp.int32(2 ** 30))
    g_min = jnp.min(pv) // _GLANES - glo            # window-relative
    g_max = jnp.max(jnp.where(posbest >= 0, posbest, -1)) // _GLANES - glo

    def sel_group(g, acc, wbase):
        base = (glo + wbase + g) * _GLANES
        onehot = ((posbest - base) == lane_i).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            onehot, scr_r[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # every eagerly-started record DMA is waited BEFORE the loop (the data
    # arrived during phase-1 compute; a wait on a finished transfer is a
    # cheap semaphore op, and semaphores must balance even when the winner
    # range skips groups)
    acc = jnp.zeros((band_px, _RFIELDS), jnp.float32)
    rhead.wait()

    @pl.when(has_mid)
    def _():
        dma(rec_hbm, scr_r, 0, _HEAD, _MID, 4).wait()

    @pl.when(has_tail)
    def _():
        dma(rec_hbm, scr_r, 0, _HEAD + _MID,
            _WINDOW - _HEAD - _MID, 5).wait()

    acc = jax.lax.fori_loop(
        jnp.maximum(g_min, 0), jnp.minimum(g_max + 1, gn0),
        lambda g, a: sel_group(g, a, 0), acc)

    def sel_win_body(w, acc):
        wbase = w * _WINDOW
        d = dma(rec_hbm, scr_r, wbase, 0, _WINDOW, 3)
        d.start()
        d.wait()
        lo_g = jnp.maximum(g_min - wbase, 0)
        hi_g = jnp.minimum(jnp.minimum(g_max + 1, gn) - wbase, _WINDOW)
        return jax.lax.fori_loop(
            lo_g, hi_g, lambda g, a: sel_group(g, a, wbase), acc)

    acc = jax.lax.fori_loop(1, n_win, sel_win_body, acc)

    # ONE packed bf16 output row per pixel: separate narrow outputs pad
    # their minor dim to 128 lanes in the tiled HBM layout (a (.., 1) f32
    # plane costs 128x its size — batch-256 overflowed HBM by gigabytes of
    # padding). All sel values are exact bf16 by construction; pos packs
    # into 3 byte-valued fields and z into a bf16 hi/lo pair.
    posu = posbest + 1                       # 0 = background
    p0 = (posu & 255).astype(jnp.bfloat16)
    p1 = ((posu >> 8) & 255).astype(jnp.bfloat16)
    p2 = (posu >> 16).astype(jnp.bfloat16)
    zsafe = jnp.where(posbest >= 0, zbest, 0.0)
    zhi_f = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(zsafe, jnp.uint32)
        & jnp.uint32(0xFFFF0000), jnp.float32)     # opaque truncation —
    # x - f32(bf16(x)) folds to 0 under --xla_allow_excess_precision
    zhi = zhi_f.astype(jnp.bfloat16)
    zlo = (zsafe - zhi_f).astype(jnp.bfloat16)
    packed_ref[0, 0] = jnp.concatenate(
        [acc.astype(jnp.bfloat16), p0, p1, p2, zhi, zlo,
         jnp.zeros((band_px, _OUT_F - _RFIELDS - 5), jnp.bfloat16)],
        axis=1)


def is_available() -> bool:
    """Used by ops/render.py to pick the hard-visibility backend: the Pallas
    kernel on real TPU, the tiled-jnp path elsewhere (interpret mode stays
    available for explicit CPU testing via rasterize())."""
    return jax.default_backend() in ("tpu", "axon")


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _group_layout(arr_flat):
    """(B, rows, F) -> (B, n_groups, F fields, GLANES) — fields on
    sublanes, triangles on lanes, 8 chunks side-by-side per group."""
    bsz, rows, fields = arr_flat.shape
    ngrp = rows // _GLANES
    a = arr_flat.reshape(bsz, ngrp, _GRP, _CHUNK, fields)
    return a.transpose(0, 1, 4, 2, 3).reshape(bsz, ngrp, fields, _GLANES)


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


def _split_records(records):
    """Build the (B, rows, 48) bf16 pre-split select record from the
    24-wide differentiable attribute record (_pack_render_records).

    Layout (all parts exactly bf16; reconstruction is a plain f32 sum):
      0:9    radiance corner hi    9:18   radiance corner lo (16-bit)
      18:24  affine w-coeff p0     24:30  p1     30:36  p2
             (wa0, wb0, wc0, wa1, wb1, wc1 at FULL f32 — 3x8 = 24
              significand bits; sliver triangles have O(1/area)
              coefficients, so 16 bits exploded their barycentrics)
      36:39  anchor x0 in 3 parts  39:42  anchor y0 in 3 parts
      42:48  pad
    """
    rad_hi, rad_lo = _split2(records[..., 0:9])
    w0p, w1p, w2p = _split3(records[..., 9:15])
    x0 = _split3(records[..., 15:16])
    y0 = _split3(records[..., 16:17])
    pad = jnp.zeros((*records.shape[:-1], 6), jnp.bfloat16)
    return jnp.concatenate(
        [rad_hi, rad_lo, w0p, w1p, w2p, *x0, *y0, pad], axis=-1)


def _band_windows(verts_ndc, faces, height, width, tile_h, tile_w,
                  cull_backfaces):
    """Run the sort-free static binning and convert its chunk-level windows
    to group-aligned (glo, gn) plus the padded flat setup array."""
    bsz = verts_ndc.shape[0]
    setup = jax.vmap(
        lambda v: bin_triangles_static(v, faces, height, width, tile_h,
                                       _CHUNK, cull_backfaces,
                                       tile_w=tile_w))(verts_ndc)
    f = setup.coeffs.shape[1]
    lo_chunk = setup.band_lo[:, :, 0]            # (B, n_bands)
    n_chunks = setup.n_chunks[:, :, 0]
    glo = lo_chunk // _GRP
    ghi = (lo_chunk + n_chunks + _GRP - 1) // _GRP
    gn = jnp.where(n_chunks > 0, ghi - glo, 0).astype(jnp.int32)
    glo = jnp.where(n_chunks > 0, glo, 0).astype(jnp.int32)

    rows = padded_rows(f)
    coeffs = jnp.pad(setup.coeffs, ((0, 0), (0, rows - f),
                                    (0, _ROW_PAD - SETUP_WIDTH)))
    # dead padding must never cover: wc0 = wc1 = -inf
    if rows - f:
        coeffs = coeffs.at[:, f:, 2].set(-3e38)
        coeffs = coeffs.at[:, f:, 5].set(-3e38)
    return glo, gn, coeffs


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "cull_backfaces"))
def rasterize_positions(verts_ndc, faces, *, height: int, width: int,
                        tile_h: int = 2, cull_backfaces: bool = False):
    """Batched hard-visibility pass.

    verts_ndc (B,N,3), faces (F,3) -> (tri_id (B,H,W) i32 winning face index
    in ORIGINAL face order (-1 = background), setup records (B,rows,16) in
    face order, zbuf (B,H,W) f32, (glo, gn) group windows).
    """
    bsz = verts_ndc.shape[0]
    # pixels live on SUBLANES (8-multiple suffices): padding the row to a
    # 128-lane column tile wasted 14% of all eval/select work at 224
    tile_w = ((width + 7) // 8) * 8
    n_bands = (height + tile_h - 1) // tile_h
    band_px = tile_h * tile_w

    glo, gn, coeffs = _band_windows(verts_ndc, faces, height, width,
                                    tile_h, tile_w, cull_backfaces)
    setup_g = _group_layout(coeffs)

    pos, zbuf = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w,
                          band_px=band_px, with_select=False),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,              # group window lo, counts
            grid=(bsz, n_bands),
            in_specs=[
                # full array stays in HBM; the kernel DMAs per-band slices
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((_WINDOW, _ROW_PAD, _GLANES), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, band_px, 1),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, band_px, 1),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_bands, band_px, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, n_bands, band_px, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(glo, gn, setup_g)

    pos = pos.reshape(bsz, n_bands * tile_h, tile_w)[:, :height, :width]
    zbuf = zbuf.reshape(bsz, n_bands * tile_h, tile_w)[:, :height, :width]
    # positions beyond the live face count are dead padding (can never win
    # — but guard anyway); pos IS the face id in original order
    pos = jnp.where(pos < faces.shape[0], pos, -1)
    return pos, coeffs, zbuf, (glo, gn)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "cull_backfaces"))
def _fused_impl(records, verts_ndc, faces, *, height: int, width: int,
                tile_h: int, cull_backfaces: bool = False):
    """Forward of the fused raster+select: records (B,rows,24) differentiable
    render attributes in face order (rows = padded_rows(F)), verts_ndc
    non-differentiable positions -> (tri_id (B,H,W), sel (B,H,W,48)
    pre-split winner record, zbuf (B,H,W))."""
    bsz = verts_ndc.shape[0]
    tile_w = ((width + 7) // 8) * 8     # sublane-aligned, not lane-padded
    n_bands = (height + tile_h - 1) // tile_h
    band_px = tile_h * tile_w

    glo, gn, coeffs = _band_windows(verts_ndc, faces, height, width,
                                    tile_h, tile_w, cull_backfaces)
    setup_g = _group_layout(coeffs)
    rec_g = _group_layout(_split_records(records))

    packed = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w,
                          band_px=band_px, with_select=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz, n_bands),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # setup, HBM
                pl.BlockSpec(memory_space=pl.ANY),   # records, HBM
            ],
            scratch_shapes=[
                pltpu.VMEM((_WINDOW, _ROW_PAD, _GLANES), jnp.float32),
                pltpu.VMEM((_WINDOW, _RFIELDS, _GLANES), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((6,)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, band_px, _OUT_F),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_bands, band_px, _OUT_F),
                                 jnp.bfloat16),
        ],
        interpret=_interpret(),
    )(glo, gn, setup_g, rec_g)[0]

    # ONE transpose to field-major (B, F, H, W): per-field slices of a
    # feature-minor array materialize (B,H,W,1)-shaped temps whose minor
    # dim pads 128x in the TPU tiled layout (4 GB apiece at 512x512);
    # field-major slices keep W minor and pad nothing
    packed = jnp.transpose(packed, (0, 3, 1, 2))
    packed = packed.reshape(bsz, _OUT_F, n_bands * tile_h, tile_w)
    packed = packed[:, :, :height, :width]
    pos = (packed[:, 48].astype(jnp.int32)
           + packed[:, 49].astype(jnp.int32) * 256
           + packed[:, 50].astype(jnp.int32) * 65536) - 1
    zbuf = (packed[:, 51].astype(jnp.float32)
            + packed[:, 52].astype(jnp.float32))
    # background pixels already selected the zero record in-kernel (their
    # one-hot matches no lane), so sel needs no mask
    hit = (pos >= 0) & (pos < faces.shape[0])
    pos = jnp.where(hit, pos, -1)
    prec = packed[:, :_RFIELDS].astype(jnp.float32)
    zbuf = jnp.where(hit, zbuf, jnp.inf)
    # (glo, gn) ride along for the VJP residuals: re-binning in _rs_fwd
    # would redo full triangle setup per training forward (nothing
    # guarantees CSE across the custom_vjp boundary)
    return pos, prec, zbuf, glo, gn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def rasterize_select(records, verts_ndc, faces, height: int, width: int,
                     tile_h: int, cull_backfaces: bool = False):
    """Fused hard-visibility + per-pixel record select (the TPU render hot
    path): records (B, padded_rows(F), 24) render attributes [radiance
    corners 9 | affine w-coeffs 6 | anchor 2 | pad] -> (tri_id,
    sel (B,48,H,W), zbuf),
    where sel is the winner's pre-split record, FIELD-MAJOR so per-field
    reads slice on the W-minor axis (_split_records layout; ops/render.py
    reconstructs radiance/barycentrics/corners from it).

    Differentiable in `records` only (SURVEY.md §9.6: tri_id frozen).
    The backward is the matmul ADJOINT of the one-hot select, computed by
    a group-blocked Pallas kernel (_grad_kernel) instead of the reference
    family's scatter-add — TPU scatters run at ~element/cycle. In the
    hi/lo field decomposition x == hi + lo, hi is a staircase of x (zero
    derivative a.e.), so the cotangent of x is the LO part's alone."""
    return _fused_impl(records, jax.lax.stop_gradient(verts_ndc), faces,
                       height=height, width=width, tile_h=tile_h,
                       cull_backfaces=cull_backfaces)[:3]


def _rs_fwd(records, verts_ndc, faces, height, width, tile_h,
            cull_backfaces):
    pos, prec, zbuf, glo, gn = _fused_impl(
        records, jax.lax.stop_gradient(verts_ndc), faces,
        height=height, width=width, tile_h=tile_h,
        cull_backfaces=cull_backfaces)
    return (pos, prec, zbuf), (pos, records.shape, glo, gn)




def _grad_kernel(blo_ref, bhi_ref, pos_hbm, g_hbm, out_ref, scr_pos, scr_g,
                 sem, *, band_px: int):
    """Backward of the one-hot select WITHOUT a scatter: the adjoint of
    sel = onehot @ rec is d_rec = onehot^T @ g — another one-hot matmul.
    Per (image, group) program: accumulate over the bands whose candidate
    window contains the group (2-3 on coherent meshes). This replaces the
    XLA segment-sum scatter, which ran at ~element/cycle (~200 ms per
    batch-32 train step); the MXU form is ~50x faster."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    lo = blo_ref[b, g]
    hi = bhi_ref[b, g]

    tri_i = (jax.lax.broadcasted_iota(jnp.int32, (_GLANES, 1), 0)
             + g * _GLANES)

    def body(band, acc):
        dp = pltpu.make_async_copy(pos_hbm.at[b, band], scr_pos, sem.at[0])
        dg = pltpu.make_async_copy(g_hbm.at[b, band], scr_g, sem.at[1])
        dp.start()
        dg.start()
        dp.wait()
        dg.wait()
        # pixel winners of this band vs this group's triangle rows
        onehot_t = (scr_pos[...] == tri_i).astype(jnp.bfloat16)
        gt = scr_g[...]                         # (fields, band_px) f32
        hi_f = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(gt, jnp.uint32)
            & jnp.uint32(0xFFFF0000), jnp.float32)   # opaque truncation
        hi_p = hi_f.astype(jnp.bfloat16)
        lo_p = (gt - hi_f).astype(jnp.bfloat16)
        for part in (hi_p, lo_p):               # 16-bit gradient precision
            acc = acc + jax.lax.dot_general(
                part, onehot_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc

    acc = jnp.zeros((_FIELDS, _GLANES), jnp.float32)
    out_ref[0, 0] = jax.lax.fori_loop(lo, hi + 1, body, acc)


@functools.partial(jax.jit,
                   static_argnames=("rows", "height", "width", "tile_h"))
def _select_grad(pos, g_sel, glo, gn, *, rows: int, height: int, width: int,
                 tile_h: int):
    """pos (B,H,W) winner ids, g_sel (B,48,H,W) cotangent, band windows ->
    d attribute-records (B, rows, 16): radiance lo-fields 9:18 and corner
    lo-fields 42:48 of the split layout, group-blocked matmul adjoint."""
    bsz = pos.shape[0]
    # sublane-aligned like the forward: band_px is the matmul'S contraction
    # dim here, so the old 128-lane rounding paid 12.5% extra MXU passes at
    # 224 for columns whose pos is -1 (the HBM buffer still tiles to 128
    # internally, but the DMA and the dot only touch the live columns)
    tile_w = ((width + 7) // 8) * 8
    band_px = tile_h * tile_w
    n_bands = (height + tile_h - 1) // tile_h
    ngrp = rows // _GLANES

    # gather the differentiable cotangent fields into the 24-wide
    # attribute layout. In an exact multi-part split x = p0 + ... + pk,
    # every part but the LAST is a staircase of x (zero derivative a.e.),
    # so the last part's cotangent is the cotangent of x.
    g24 = jnp.concatenate(
        [g_sel[:, 9:18],                   # radiance (lo part)
         g_sel[:, 30:36],                  # w-coeffs (p2)
         g_sel[:, 38:39], g_sel[:, 41:42],  # anchors x0, y0 (p2)
         jnp.zeros_like(g_sel[:, :7])], axis=1)          # (B, 24, H, W)
    pad_h = n_bands * tile_h - height
    pad_w = tile_w - width
    g24 = jnp.pad(g24, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
    g_b = g24.reshape(bsz, _FIELDS, n_bands, band_px)
    g_b = jnp.transpose(g_b, (0, 2, 1, 3))               # (B, nb, 16, band_px)
    pos_p = jnp.pad(pos, ((0, 0), (0, pad_h), (0, pad_w)),
                    constant_values=-1)
    pos_b = pos_p.reshape(bsz, n_bands, 1, band_px)

    # per group: the contiguous range of bands whose candidate window
    # contains it (every band on incoherent meshes — slow but correct)
    grp = jnp.arange(ngrp)[None, None, :]                # (1, 1, ngrp)
    cover = ((glo[:, :, None] <= grp)
             & (grp < (glo + gn)[:, :, None]))           # (B, nb, ngrp)
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
                pltpu.VMEM((1, band_px), jnp.int32),
                pltpu.VMEM((_FIELDS, band_px), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
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

    # (B, ngrp, 16, GLANES) -> (B, rows, 16): inverse of _group_layout
    grad = grad.reshape(bsz, ngrp, _FIELDS, _GRP, _CHUNK)
    grad = grad.transpose(0, 1, 3, 4, 2).reshape(bsz, rows, _FIELDS)
    return grad


def _rs_bwd(height, width, tile_h, cull_backfaces, res, g):
    pos, rec_shape, glo, gn = res
    _, g_sel, _ = g                    # g_sel is field-major (B, 48, H, W)
    # hi split parts are staircases of the source value (zero derivative
    # a.e.), so only the LO fields carry the cotangent — _select_grad
    # gathers them and runs the matmul adjoint (no scatter)
    grad = _select_grad(pos, g_sel, glo, gn, rows=rec_shape[1],
                        height=height, width=width, tile_h=tile_h)
    return grad, None, None


rasterize_select.defvjp(_rs_fwd, _rs_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "cfg", "tile_h", "cull_backfaces"))
def rasterize_batch(verts_ndc, faces, *, height: int, width: int, cfg=None,
                    tile_h: int = 2, cull_backfaces: bool = False):
    """Full SURVEY.md §9.5 contract: (tri_id, bary, zbuf), batched.

    Fully jitted — eager dispatch over the axon tunnel costs seconds per op.
    """
    if cfg is not None:
        tile_h = cfg.tile_h
    tri_id, records, zbuf, _ = rasterize_positions(
        verts_ndc, faces, height=height, width=width, tile_h=tile_h,
        cull_backfaces=cull_backfaces)
    hit = tri_id >= 0
    safe = jnp.maximum(tri_id, 0)
    # barycentrics from the winner's affine record (non-differentiable path;
    # render.py recomputes them differentiably from tri_id)
    rec = jnp.take_along_axis(
        records, safe.reshape(records.shape[0], -1, 1), axis=1
    ).reshape(*tri_id.shape, _ROW_PAD)
    jj, ii = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
    qx = (jj + 0.5).astype(jnp.float32)[None] - rec[..., 9]
    qy = (ii + 0.5).astype(jnp.float32)[None] - rec[..., 10]
    w0 = rec[..., 0] * qx + rec[..., 1] * qy + rec[..., 2]
    w1 = rec[..., 3] * qx + rec[..., 4] * qy + rec[..., 5]
    bary = jnp.stack([w0, w1, 1.0 - w0 - w1], axis=-1)
    bary = jnp.where(hit[..., None], bary, 0.0)
    zbuf = jnp.where(hit, zbuf, jnp.inf)
    return tri_id, bary, zbuf


def rasterize(verts_ndc, faces, *, height: int, width: int,
              tile_h: int = 2, cull_backfaces: bool = False):
    """Single-mesh wrapper matching rasterize_jnp/rasterize_tiled."""
    tid, bary, z = rasterize_batch(
        verts_ndc[None], faces, height=height, width=width, tile_h=tile_h,
        cull_backfaces=cull_backfaces)
    return tid[0], bary[0], z[0]
