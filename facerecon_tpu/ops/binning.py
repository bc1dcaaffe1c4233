"""Triangle setup + y-band binning for the tiled/Pallas rasterizers.

TPU-first design (SURVEY.md §9.5): scatter-with-depth-test does not map to
the hardware, so rasterization is gather-style per image tile. To keep the
per-tile candidate fetch a *contiguous* slice (DMA-friendly, no random
gathers), triangles are sorted by screen-space ymin once per frame; each
tile row ("band", tile_h pixels tall) then reads the sorted range
  [searchsorted(ymin, band_top - max_tri_height), searchsorted(ymin, band_bottom)]
which is conservative-exact: it contains every triangle whose bbox meets the
band (plus a small spill set that the per-pixel coverage test rejects).

Per-triangle setup precomputes the affine forms (SURVEY.md §9.5 edge
functions, normalized by signed area):
  w0(x,y) = wa0*x + wb0*y + wc0      (barycentric of vertex 0)
  w1(x,y) = wa1*x + wb1*y + wc1
  w2      = 1 - w0 - w1
  z (x,y) = za*x  + zb*y  + zc       (screen-space linear depth)
Coverage is w0>=0 & w1>=0 & w2>=0 — equivalent to the oracle's
"all edge functions carry the area's sign" rule. Degenerate (and optionally
back-facing) triangles get wc0=wc1=-inf so they never cover any pixel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from facerecon_tpu.ops.rasterize_jnp import ndc_to_screen

# triangle setup record layout (last axis of `coeffs`). The affine forms are
# ANCHORED at the triangle's vertex 0 (evaluate at q = p - (x0, y0)): the
# globally-expanded constant (x1*y2 - x2*y1) suffers catastrophic f32
# cancellation for ~1px triangles at ~200px coordinates (barycentric errors
# up to ~0.1); anchored constants are built from O(triangle-size) magnitudes.
# [wa0, wb0, wc0, wa1, wb1, wc1, za, zb, zc(=z0), x0, y0, ymin]
SETUP_WIDTH = 12
YMIN_IDX = 11
_NEG = -3e38  # effectively -inf in f32, kills coverage for dead triangles


class TriSetup(NamedTuple):
    coeffs: jnp.ndarray      # (F, SETUP_WIDTH) f32, sorted by ymin
    ids: jnp.ndarray         # (F,) int32 original triangle ids, same order
    band_lo: jnp.ndarray     # (n_bands,) int32 slice starts into coeffs
    band_hi: jnp.ndarray     # (n_bands,) int32 slice ends


def affine_forms(p0, p1, p2, dead=None):
    """Vertex-0-anchored barycentric affine forms from screen corners.

    p0/p1/p2 (..., 2) screen positions -> (wa0, wb0, wc0, wa1, wb1, wc1)
    with w0(q) = wa0 qx + wb0 qy + wc0 evaluated at q = pixel - p0.
    Shared by the rasterizer setup AND the differentiable render-record
    pack (same float ops -> identical forward values). Differentiable:
    the degenerate-area reciprocal is operand-guarded (d(1/area) at 0 is
    inf, and a where() alone still NaNs the gradient).
    """
    u1 = p1[..., 0] - p0[..., 0]
    v1 = p1[..., 1] - p0[..., 1]
    u2 = p2[..., 0] - p0[..., 0]
    v2 = p2[..., 1] - p0[..., 1]
    area = u1 * v2 - v1 * u2
    dead_a = jnp.abs(area) <= 1e-12
    if dead is not None:
        dead_a = dead_a | dead
    inv_area = jnp.where(dead_a, 0.0,
                         1.0 / jnp.where(dead_a, 1.0, area))
    # anchored edge functions of q = p - v0:
    # e0 (opposite v0, edge p1->p2) = (u2-u1)(qy-v1) - (v2-v1)(qx-u1)
    wa0 = (v1 - v2) * inv_area
    wb0 = (u2 - u1) * inv_area
    wc0 = (u1 * v2 - u2 * v1) * inv_area   # = 1.0 up to rounding
    # e1 (opposite v1, edge p2->v0): passes through the anchor -> no constant
    wa1 = v2 * inv_area
    wb1 = -u2 * inv_area
    wc1 = jnp.zeros_like(wa1)
    return wa0, wb0, wc0, wa1, wb1, wc1, area


def triangle_setup(verts_ndc, faces, height: int, width: int,
                   cull_backfaces: bool = False, with_x: bool = False):
    """Per-triangle affine coefficients + extents. Unsorted.

    Returns (coeffs (F, SETUP_WIDTH), ymax) or, with with_x=True,
    (coeffs, (ymax, xmin, xmax)).
    """
    screen = ndc_to_screen(verts_ndc, height, width)     # (N,2)
    depth = verts_ndc[:, 2]
    p0 = jnp.take(screen, faces[:, 0], axis=0)
    p1 = jnp.take(screen, faces[:, 1], axis=0)
    p2 = jnp.take(screen, faces[:, 2], axis=0)
    z0 = jnp.take(depth, faces[:, 0], axis=0)
    z1 = jnp.take(depth, faces[:, 1], axis=0)
    z2 = jnp.take(depth, faces[:, 2], axis=0)

    x0, y0 = p0[:, 0], p0[:, 1]
    u1 = p1[:, 0] - x0
    v1 = p1[:, 1] - y0
    u2 = p2[:, 0] - x0
    v2 = p2[:, 1] - y0
    # signed area*2 (same value as the oracle's global form up to rounding)
    area = u1 * v2 - v1 * u2

    dead = jnp.abs(area) <= 1e-12
    if cull_backfaces:
        # front faces are CCW in world (+z toward camera); the y-down screen
        # flip makes them negative-area in screen space
        dead = dead | (area > 0)

    wa0, wb0, wc0, wa1, wb1, wc1, _ = affine_forms(
        p0, p1, p2, dead=dead)
    # depth affine in q: z(0) = z0 exactly at the anchor
    za = wa0 * (z0 - z2) + wa1 * (z1 - z2)
    zb = wb0 * (z0 - z2) + wb1 * (z1 - z2)
    zc = jnp.broadcast_to(z0, wa0.shape)

    wc0 = jnp.where(dead, _NEG, wc0)
    wc1 = jnp.where(dead, _NEG, wc1)
    wa0 = jnp.where(dead, 0.0, wa0)
    wb0 = jnp.where(dead, 0.0, wb0)
    wa1 = jnp.where(dead, 0.0, wa1)
    wb1 = jnp.where(dead, 0.0, wb1)

    ymin = jnp.minimum(jnp.minimum(p0[:, 1], p1[:, 1]), p2[:, 1])
    ymax = jnp.maximum(jnp.maximum(p0[:, 1], p1[:, 1]), p2[:, 1])
    # dead triangles sort to the very end and never enter any band
    big = jnp.float32(3e38)
    ymin = jnp.where(dead, big, ymin)
    ymax = jnp.where(dead, -big, ymax)

    coeffs = jnp.stack(
        [wa0, wb0, wc0, wa1, wb1, wc1, za, zb, zc, x0, y0, ymin], axis=-1)
    if with_x:
        xmin = jnp.minimum(jnp.minimum(p0[:, 0], p1[:, 0]), p2[:, 0])
        xmax = jnp.maximum(jnp.maximum(p0[:, 0], p1[:, 0]), p2[:, 0])
        xmin = jnp.where(dead, big, xmin)
        xmax = jnp.where(dead, -big, xmax)
        return coeffs, (ymax, xmin, xmax)
    return coeffs, ymax


class StaticSetup(NamedTuple):
    coeffs: jnp.ndarray      # (F, SETUP_WIDTH) f32, ORIGINAL face order
    band_lo: jnp.ndarray     # (n_bands, n_cols) int32 first chunk per tile
    n_chunks: jnp.ndarray    # (n_bands, n_cols) int32 window chunk count


def bin_triangles_static(verts_ndc, faces, height: int, width: int,
                         tile_h: int, chunk: int,
                         cull_backfaces: bool = False,
                         tile_w: int = 128) -> StaticSetup:
    """Sort-free 2-D binning for spatially coherent face orderings.

    A per-frame ymin argsort costs ~1.8 ms/face on v5e — half the rasterizer
    time. Real face meshes (and the synthetic grid generator) store faces in
    spatially coherent order (mesh-row-major), and the data pipeline ALIGNS
    faces (roll removed), so consecutive `chunk`-sized groups of faces have
    tight screen x/y extents. Each (band, column-tile)'s candidates are then
    the contiguous span of chunks whose bbox intersects it —
    conservative-exact, contiguous, and in ORIGINAL face order (ties resolve
    to the lowest face id, exactly matching the oracle). A mesh row spans
    the face width while a 128-triangle chunk spans ~1/3 of it, so column
    windows prune ~40% of candidate-pixel pairs at 224px (more at 512px).
    Under heavy in-plane rotation the spans widen (graceful perf
    degradation, never incorrectness).
    """
    coeffs, extents = triangle_setup(verts_ndc, faces, height, width,
                                     cull_backfaces, with_x=True)
    ymax, xmin, xmax = extents
    f = coeffs.shape[0]
    pad = (-f) % chunk
    big = 3e38
    ymin_t = jnp.pad(coeffs[:, YMIN_IDX], (0, pad), constant_values=big)
    ymax_t = jnp.pad(ymax, (0, pad), constant_values=-big)
    xmin_t = jnp.pad(xmin, (0, pad), constant_values=big)
    xmax_t = jnp.pad(xmax, (0, pad), constant_values=-big)
    nct = ymin_t.shape[0] // chunk
    cymin = jnp.min(ymin_t.reshape(nct, chunk), axis=1)   # (nct,)
    cymax = jnp.max(ymax_t.reshape(nct, chunk), axis=1)
    cxmin = jnp.min(xmin_t.reshape(nct, chunk), axis=1)
    cxmax = jnp.max(xmax_t.reshape(nct, chunk), axis=1)

    n_bands = (height + tile_h - 1) // tile_h
    n_cols = (width + tile_w - 1) // tile_w
    band_tops = jnp.arange(n_bands, dtype=jnp.float32) * tile_h
    col_lefts = jnp.arange(n_cols, dtype=jnp.float32) * tile_w
    hit_y = ((cymin[None, :] <= (band_tops + tile_h)[:, None])
             & (cymax[None, :] >= band_tops[:, None]))    # (n_bands, nct)
    hit_x = ((cxmin[None, :] <= (col_lefts + tile_w)[:, None])
             & (cxmax[None, :] >= col_lefts[:, None]))    # (n_cols, nct)
    hit = hit_y[:, None, :] & hit_x[None, :, :]           # (bands, cols, nct)
    any_hit = jnp.any(hit, axis=-1)
    first = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    last = (nct - 1 - jnp.argmax(hit[:, :, ::-1], axis=-1)).astype(jnp.int32)
    band_lo = jnp.where(any_hit, first, 0)
    n_chunks = jnp.where(any_hit, last - first + 1, 0).astype(jnp.int32)
    # NOTE: per-(band,col) disjoint chunk RUN lists were tried (one run per
    # mesh row crossing the tile) and measured SLOWER than the plain window:
    # runs are 1-3 chunks long while the backend's fixed cost per loop
    # iteration (~2.4us) dominates — a single contiguous window per tile
    # keeps the inner loop long and the DMA contiguous.
    return StaticSetup(coeffs=coeffs, band_lo=band_lo, n_chunks=n_chunks)


class StaticSetupT(NamedTuple):
    coeffs_t: tuple          # SETUP_WIDTH arrays of (B, F) f32 — the
                             # field rows UNSTACKED, so the caller can pad
                             # and stack them together with its extra rows
                             # in ONE (B, 16, rows) materialization
    band_lo: jnp.ndarray     # (B, n_bands) int32 band UNION first chunk
    n_chunks: jnp.ndarray    # (B, n_bands) int32 band union chunk count
    chunk_mask: jnp.ndarray  # (B, n_bands, n_cols, mask_words) int32:
                             # bit i of word w set iff chunk
                             # band_lo + 32*w + i hits the (band, col)
                             # tile — EXACT at chunk granularity (unlike
                             # a contiguous span, it prunes the dead
                             # chunks between y-bins: measured 2.0x fewer
                             # candidate-pixel pairs at 224px/4cols
                             # frontal, 3.2x at training poses). Covers
                             # the first 32*mask_words chunks of the
                             # union window; chunks beyond that are the
                             # multi-window fallback's job (n_chunks
                             # says so).


def bin_triangles_static_t(verts_ndc, faces, height: int, width: int,
                           tile_h: int, chunk: int,
                           cull_backfaces: bool = False,
                           tile_w: int = 128,
                           mask_words: int = 2) -> StaticSetupT:
    """Batched FIELD-MAJOR twin of bin_triangles_static (same setup
    values) built for the TPU memory system: the corner gather stays
    batch-major (row gathers), every derived field is a (B, F) block,
    and coeffs_t (B, 12, F) materializes ONCE by stacking fields on
    axis 1 — no B-to-rows transpose anywhere (one such transpose
    measured ~10-25 ms/128 at 224px in relayout traffic), and it is
    already the layout the Pallas kernel DMAs.

    Windows are returned as (a) the band UNION contiguous chunk span
    (band_lo, n_chunks) — the DMA fetch — and (b) a per-(band, col)
    EXACT per-chunk bitmask over the window's first 32*mask_words
    chunks (see StaticSetupT.chunk_mask). A contiguous per-column span
    cannot prune the gap between y-bins (a band's candidates live in
    2-3 bins and the span must bridge the x-remainder of each), and a
    4-chunk-slab mask rounds the scattered live chunks (mean 5.5 per
    (band, col) at 224px/4cols) back up to ~the span; only the exact
    chunk mask captures the 2-3.2x pair cut. Built bit-parallel: pack
    the absolute chunk-hit matrix into uint32 words once, then extract
    each band's window bits with a 3-word gather + funnel shift (a
    direct per-window bool gather measured ~8 ms/128 at 224px)."""
    bsz = verts_ndc.shape[0]
    f = faces.shape[0]
    screen = ndc_to_screen(verts_ndc, height, width)          # (B,N,2)
    idx = jnp.transpose(faces).reshape(-1)                    # corner-major
    # PLANE-form gather: three (B, 3F) <- (B, N) minor-axis gathers —
    # the (B, 3F, 3) row-gather form pays per ROW (~4 ms/128 at 224px
    # vs ~1 for the planes, benchmarks/gather_probe.py)
    planes = (screen[..., 0], screen[..., 1], verts_ndc[..., 2])
    corners = tuple(jnp.take(p, idx, axis=-1) for p in planes)

    def fld(c, k):
        return corners[k][:, c * f:(c + 1) * f]               # (B, F)

    x0, y0, z0 = fld(0, 0), fld(0, 1), fld(0, 2)
    x1, y1, z1 = fld(1, 0), fld(1, 1), fld(1, 2)
    x2, y2, z2 = fld(2, 0), fld(2, 1), fld(2, 2)

    u1 = x1 - x0
    v1 = y1 - y0
    u2 = x2 - x0
    v2 = y2 - y0
    area = u1 * v2 - v1 * u2
    dead = jnp.abs(area) <= 1e-12
    if cull_backfaces:
        dead = dead | (area > 0)
    inv_area = jnp.where(dead, 0.0, 1.0 / jnp.where(dead, 1.0, area))
    wa0 = (v1 - v2) * inv_area
    wb0 = (u2 - u1) * inv_area
    wc0 = (u1 * v2 - u2 * v1) * inv_area
    wa1 = v2 * inv_area
    wb1 = -u2 * inv_area
    wc1 = jnp.zeros_like(wa1)
    za = wa0 * (z0 - z2) + wa1 * (z1 - z2)
    zb = wb0 * (z0 - z2) + wb1 * (z1 - z2)
    wc0 = jnp.where(dead, _NEG, wc0)
    wc1 = jnp.where(dead, _NEG, wc1)
    wa0 = jnp.where(dead, 0.0, wa0)
    wb0 = jnp.where(dead, 0.0, wb0)
    wa1 = jnp.where(dead, 0.0, wa1)
    wb1 = jnp.where(dead, 0.0, wb1)

    big = jnp.float32(3e38)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.where(dead, big, ymin)
    ymax = jnp.where(dead, -big, ymax)
    xmin = jnp.where(dead, big, xmin)
    xmax = jnp.where(dead, -big, xmax)

    coeffs_t = (wa0, wb0, wc0, wa1, wb1, wc1, za, zb, z0, x0, y0, ymin)

    pad = (-f) % chunk
    pads = ((0, 0), (0, pad))
    ymin_t = jnp.pad(ymin, pads, constant_values=big)
    ymax_t = jnp.pad(ymax, pads, constant_values=-big)
    xmin_t = jnp.pad(xmin, pads, constant_values=big)
    xmax_t = jnp.pad(xmax, pads, constant_values=-big)
    nct = ymin_t.shape[1] // chunk
    cymin = jnp.min(ymin_t.reshape(bsz, nct, chunk), axis=2)  # (B, nct)
    cymax = jnp.max(ymax_t.reshape(bsz, nct, chunk), axis=2)
    cxmin = jnp.min(xmin_t.reshape(bsz, nct, chunk), axis=2)
    cxmax = jnp.max(xmax_t.reshape(bsz, nct, chunk), axis=2)

    n_bands = (height + tile_h - 1) // tile_h
    n_cols = (width + tile_w - 1) // tile_w
    band_tops = jnp.arange(n_bands, dtype=jnp.float32) * tile_h
    col_lefts = jnp.arange(n_cols, dtype=jnp.float32) * tile_w
    hit_y = ((cymin[:, None] <= (band_tops + tile_h)[None, :, None])
             & (cymax[:, None] >= band_tops[None, :, None]))
    hit_x = ((cxmin[:, None] <= (col_lefts + tile_w)[None, :, None])
             & (cxmax[:, None] >= col_lefts[None, :, None]))
    hit = hit_y[:, :, None] & hit_x[:, None]      # (B, bands, cols, nct)
    any_hit = jnp.any(hit, axis=3)
    first = jnp.argmax(hit, axis=3).astype(jnp.int32)
    last = (nct - 1
            - jnp.argmax(hit[:, :, :, ::-1], axis=3)).astype(jnp.int32)
    # band UNION span over columns (one contiguous DMA per band)
    ulo = jnp.min(jnp.where(any_hit, first, jnp.int32(2 ** 30)), axis=2)
    uhi = jnp.max(jnp.where(any_hit, last + 1, 0), axis=2)
    any_b = jnp.any(any_hit, axis=2)
    ulo = jnp.where(any_b, ulo, 0)                # (B, bands)
    un = jnp.where(any_b, uhi - ulo, 0).astype(jnp.int32)

    # EXACT per-chunk bitmask, window-relative. Pack the absolute chunk
    # hits bit-parallel into uint32 words, then extract each (band, col)
    # window's mask_words words with a tiny 3-word gather + funnel shift.
    nw = (nct + 31) // 32
    hit_p = jnp.pad(hit, ((0, 0), (0, 0), (0, 0), (0, nw * 32 - nct)))
    lane_bit = jnp.left_shift(jnp.uint32(1),
                              jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(jnp.where(hit_p.reshape(bsz, n_bands, n_cols, nw, 32),
                              lane_bit, jnp.uint32(0)),
                    axis=-1, dtype=jnp.uint32)        # (B, bands, cols, nw)
    q = (ulo >> 5)[:, :, None, None]                  # (B, bands, 1, 1)
    s = jnp.uint32((ulo & 31))[:, :, None, None]      # sub-word bit shift
    k = jnp.arange(mask_words + 1, dtype=jnp.int32)   # gather words q..q+mw
    gi = jnp.clip(q + k, 0, nw - 1)
    gw = jnp.take_along_axis(
        jnp.broadcast_to(words, (bsz, n_bands, n_cols, nw)),
        jnp.broadcast_to(gi, (bsz, n_bands, n_cols, mask_words + 1)),
        axis=3)
    gw = jnp.where(q + k < nw, gw, jnp.uint32(0))
    lo_part = gw[..., :mask_words] >> s
    hi_part = jnp.where(s == 0, jnp.uint32(0),
                        gw[..., 1:] << (jnp.uint32(32) - s))
    chunk_mask = jax.lax.bitcast_convert_type(lo_part | hi_part, jnp.int32)
    return StaticSetupT(coeffs_t=coeffs_t, band_lo=ulo, n_chunks=un,
                        chunk_mask=chunk_mask)


def bin_triangles(verts_ndc, faces, height: int, width: int,
                  tile_h: int, cull_backfaces: bool = False) -> TriSetup:
    """Sort triangles by ymin and compute per-band candidate ranges."""
    coeffs, ymax = triangle_setup(verts_ndc, faces, height, width,
                                  cull_backfaces)
    ymin = coeffs[:, YMIN_IDX]
    order = jnp.argsort(ymin)
    coeffs_s = jnp.take(coeffs, order, axis=0)
    ids_s = order.astype(jnp.int32)
    ymin_s = coeffs_s[:, YMIN_IDX]

    # conservative band ranges via the global max triangle height
    live = ymax > -1e38
    heights = jnp.where(live, ymax - ymin, 0.0)
    max_h = jnp.max(heights)

    n_bands = (height + tile_h - 1) // tile_h
    band_tops = jnp.arange(n_bands, dtype=jnp.float32) * tile_h
    band_bots = band_tops + tile_h
    # triangle overlaps band iff ymin <= band_bot and ymax >= band_top;
    # ymax >= band_top  =>  ymin >= band_top - max_h (conservative)
    band_lo = jnp.searchsorted(ymin_s, band_tops - max_h).astype(jnp.int32)
    band_hi = jnp.searchsorted(ymin_s, band_bots, side="right")
    band_hi = band_hi.astype(jnp.int32)
    return TriSetup(coeffs=coeffs_s, ids=ids_s,
                    band_lo=band_lo, band_hi=band_hi)
