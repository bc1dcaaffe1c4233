"""Differentiable render path — SURVEY.md §3 C9 + §9.5/9.6 gradient contract.

The rasterizer (Pallas on TPU, jnp fallback elsewhere) produces only hard
visibility: integer tri_id per pixel. This module then *recomputes* the
barycentric weights differentiably from the gathered screen-space vertex
positions of the hit triangle. That reproduces the reference-family VJP
contract exactly (SURVEY.md §9.6) with XLA autodiff instead of a hand-written
backward:
  - tri_id is frozen (integer output, no gradient);
  - dL/dattr flows through the gathers (transposed to segment_sum by XLA);
  - dL/dV_xy flows through the analytic edge-function quotient rule via the
    recomputed weights (gradients exist only inside covered pixels);
  - dL/ddepth = 0 (depth is only used inside the frozen z-test).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from facerecon_tpu.config import FaceReconConfig
from facerecon_tpu.ops import rasterize_jnp
from facerecon_tpu.ops import sh as sh_ops
from facerecon_tpu.ops.geometry import DeviceBFM, Geometry, coeffs_to_geometry
from facerecon_tpu.utils.coeffs import Coeffs


def barycentric_from_id(tri_id, verts_ndc, faces, height: int, width: int):
    """Recompute barycentric weights differentiably (B,H,W,3).

    Gathers the screen positions of each pixel's hit triangle and evaluates
    the edge-function ratios. Matches the rasterizer's forward values
    exactly (same formula, same float32 ops) while exposing the analytic
    dL/dV_xy path of SURVEY.md §9.6.
    """
    screen = rasterize_jnp.ndc_to_screen(verts_ndc, height, width)  # (B,N,2)
    safe_id = jnp.maximum(tri_id, 0)                                # (B,H,W)
    tri_verts = faces[safe_id]                                      # (B,H,W,3)
    p = jnp.take_along_axis(
        screen[:, None, None, :, :],
        tri_verts[..., None].astype(jnp.int32), axis=-2)            # (B,H,W,3,2)
    p0, p1, p2 = p[..., 0, :], p[..., 1, :], p[..., 2, :]

    jj, ii = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
    px = (jj + 0.5).astype(jnp.float32)[None]                       # (1,H,W)
    py = (ii + 0.5).astype(jnp.float32)[None]

    def edge(a, b):
        return ((b[..., 0] - a[..., 0]) * (py - a[..., 1])
                - (b[..., 1] - a[..., 1]) * (px - a[..., 0]))

    e0, e1, e2 = edge(p1, p2), edge(p2, p0), edge(p0, p1)
    area = ((p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1])
            - (p1[..., 1] - p0[..., 1]) * (p2[..., 0] - p0[..., 0]))
    area_safe = jnp.where(area == 0.0, 1.0, area)    # NaN-safe grad
    inv_area = jnp.where(area == 0.0, 0.0, 1.0 / area_safe)
    bary = jnp.stack([e0, e1, e2], axis=-1) * inv_area[..., None]
    return jnp.where((tri_id >= 0)[..., None], bary, 0.0)


def interpolate(tri_id, bary, faces, attrs):
    """Blend per-vertex attrs (B,N,C) by bary at each pixel -> (B,H,W,C)."""
    safe_id = jnp.maximum(tri_id, 0)
    tri_verts = faces[safe_id]                                      # (B,H,W,3)
    vals = jnp.take_along_axis(
        attrs[:, None, None, :, :],
        tri_verts[..., None].astype(jnp.int32), axis=-2)            # (B,H,W,3,C)
    out = (bary[..., None] * vals).sum(axis=-2)
    return jnp.where((tri_id >= 0)[..., None], out, 0.0)


def _render_fields(verts_ndc, radiance, faces, height: int, width: int,
                   corner_adj=None):
    """Corner gather + anchored affine forms -> 17 (B, F) field blocks
    [radiance corners r00..r22 (9, corner-major) | affine w-coefficients
    wa0, wb0, wc0, wa1, wb1, wc1 | anchor x0, y0].

    The gather runs in PLANE form — five independent (B, 3F) <- (B, N)
    minor-axis gathers — because TPU gathers pay per ROW, not per byte:
    the previous (B, 3F, 5) row gather measured 5.5 ms/128 at 224px
    alone while all five planes together measure ~1.6
    (benchmarks/gather_probe.py). Corner blocks are then contiguous
    minor-axis slices. The affine coefficients are computed HERE, from
    the differentiable vertex positions, with the same float ops as the
    rasterizer's setup (ops/binning) — so the per-pixel barycentrics
    reconstructed from the selected record equal the rasterizer's
    exactly AND carry dL/dV_xy without any corner-recompute detour."""
    from facerecon_tpu.ops.binning import affine_forms
    screen = rasterize_jnp.ndc_to_screen(verts_ndc, height, width)  # (B,N,2)
    f = faces.shape[0]
    planes = (radiance[..., 0], radiance[..., 1], radiance[..., 2],
              screen[..., 0], screen[..., 1])                 # (B, N) x5
    idx = jnp.transpose(faces).reshape(-1)                    # corner-major
    if corner_adj is not None:
        # gather-adjoint plane takes (geometry.take_corner_planes):
        # jnp.take's natural VJP is a scatter-add (~element/cycle on TPU,
        # ~35 ms/32 in the training backward); corner_adj must be the
        # CORNER-MAJOR row-ordered table matching idx
        # (DeviceBFM.raster_corner_adj)
        from facerecon_tpu.ops.geometry import take_corner_planes
        corners = take_corner_planes(planes, idx, corner_adj)
    else:
        corners = tuple(jnp.take(p, idx, axis=-1) for p in planes)

    def fld(c, k):
        return corners[k][:, c * f:(c + 1) * f]               # (B, F)

    p0 = jnp.stack([fld(0, 3), fld(0, 4)], axis=-1)           # (B, F, 2)
    p1 = jnp.stack([fld(1, 3), fld(1, 4)], axis=-1)
    p2 = jnp.stack([fld(2, 3), fld(2, 4)], axis=-1)
    wa0, wb0, wc0, wa1, wb1, wc1, _ = affine_forms(p0, p1, p2)
    rad = [fld(c, k) for c in range(3) for k in range(3)]      # radiance
    return (*rad, wa0, wb0, wc0, wa1, wb1, wc1, fld(0, 3), fld(0, 4))


def _stack24(fields, pad_rows: int):
    """(B, 24, pad_rows) f32 attribute record from the field blocks:
    [radiance 9 | w-coeffs 6 | anchor x0,y0 | pad 7] — the GRADIENT
    CARRIER of the fused select (rasterize_select's custom VJP returns
    d/d this layout). When a precomputed rec48 is passed alongside, the
    kernel never reads this stack, so XLA dead-codes the materialization
    and keeps only its autodiff residuals."""
    b, f = fields[0].shape
    rows24 = list(fields) + [jnp.zeros((b, f), fields[0].dtype)] * 7
    rec = jnp.stack(rows24, axis=1)                           # (B, 24, F)
    return jnp.pad(rec, ((0, 0), (0, 0), (0, pad_rows - f)))


def _pack_render_records(verts_ndc, radiance, faces, height: int,
                         width: int, pad_rows: int, corner_adj=None):
    """Per-face differentiable render attributes, FIELD-MAJOR
    (B, 24, pad_rows) — _render_fields + _stack24 (kept as the one-call
    API for tests/probes).

    Layout is everything on TPU: the corner gather stays batch-major
    (row gathers) but every derived field is a (B, F) block stacked on
    axis 1 — the record materializes ONCE, already field-major, with no
    B-to-rows transpose anywhere (one such transpose of the assembled
    record measured ~15-25 ms/128 in padded relayout traffic)."""
    return _stack24(_render_fields(verts_ndc, radiance, faces, height,
                                   width, corner_adj), pad_rows)


def _pack_split_records(fields, row_id, pad_rows: int, skin=None):
    """(B, 48, pad_rows) bf16 PRE-SPLIT kernel record built directly
    from the (B, F) field blocks — ONE materialization (the old
    pack24 -> _split_records chain materialized the f32 24-stack just to
    re-slice it; pack24 10 ms + split 8.5 ms at batch-128 @224).
    Identical float ops and layout to
    rasterize_pallas._split_records(_pack_render_records(...)): splits
    commute with zero padding (split(0) = 0), and each part is exactly
    bf16. NON-differentiable (bitcast truncations) — callers wrap in
    stop_gradient and pass the _stack24 record as the gradient carrier.

    skin: optional STATIC (3, F) f32 per-corner skin-mask values in
    raster-row order (DeviceBFM.raster_skin). When given, they ride the
    record as hi/lo bf16 pairs in rows 48:51 / 51:54 (rel err
    <= 2^-16, the radiance-field contract; the mask weights a loss) (pad to 56 —
    the bf16 HBM sublane tile is 16, so 56 rows cost the same DMA as
    51), and the select delivers each pixel's winner skin corners for
    free: the per-pixel skin-mask gather they replace measured ~8.4 ns
    PER INDEX on TPU (benchmarks/gather_probe.py), ~50 ms/128 at 224px
    in the training-loss forward. The select's own cost is independent
    of the record height up to one 128-row MXU tile (STATUS round-5)."""
    from facerecon_tpu.ops.rasterize_pallas import _split2, _split3
    b, f = fields[0].shape
    pad = pad_rows - f

    rad_sp = [_split2(r) for r in fields[0:9]]        # [(hi, lo)] x 9
    w_sp = [_split3(w) for w in fields[9:15]]         # [(p0,p1,p2)] x 6
    x_sp = _split3(fields[15])
    y_sp = _split3(fields[16])
    parts = ([h for h, _ in rad_sp] + [l for _, l in rad_sp]
             + [w[0] for w in w_sp] + [w[1] for w in w_sp]
             + [w[2] for w in w_sp] + list(x_sp) + list(y_sp))
    # ONE stack of the unpadded 42 dynamic parts + ONE minor-axis zero
    # pad (split(0) = 0, so padding commutes with the splits). The
    # isolated probe prefers pad-each-then-stack but the FULL CHAIN
    # measures this form ~7 ms/128 faster (see _band_windows note).
    dyn = jnp.pad(jnp.stack([p.astype(jnp.bfloat16) for p in parts],
                            axis=1), ((0, 0), (0, 0), (0, pad)))
    # id / raster-row byte rows (static per asset; see _split_records:
    # slack rows key to the unmatchable 0xFFFFFF sentinel, row bytes give
    # the backward its one-hot key)
    rid = jnp.full((pad_rows,), 0xFFFFFF,
                   jnp.int32).at[:row_id.shape[0]].set(row_id + 1)
    rowi = jnp.arange(pad_rows, dtype=jnp.int32) + 1
    stat = jnp.stack([a.astype(jnp.bfloat16)
                      for a in (rid & 255, (rid >> 8) & 255, rid >> 16,
                                rowi & 255, (rowi >> 8) & 255,
                                rowi >> 16)], axis=0)       # (6, rows)
    if skin is not None:
        hi, lo = _split2(jnp.pad(skin, ((0, 0), (0, pad)))[None])
        stat = jnp.concatenate(
            [stat[None], hi, lo,
             jnp.zeros((1, 2, pad_rows), jnp.bfloat16)], axis=1)[0]
        stat = jnp.broadcast_to(stat[None], (b, 14, pad_rows))
        return jnp.concatenate([dyn, stat], axis=1)   # (B, 56, rows)
    stat = jnp.broadcast_to(stat[None], (b, 6, pad_rows))
    return jnp.concatenate([dyn, stat], axis=1)       # (B, 48, rows)


def _shade_from_sel(tri_id, sel, height: int, width: int,
                    tile_h: int = None):
    """Shade from the kernel's pre-split winner record — BANDED
    (B, n_bands, 48, band_px) f32 in the kernel's row-major band pixel
    order (rasterize_pallas._split_records field layout): plane k of the
    image is a slice + pure reshape, no field-axis transpose.

    Barycentrics evaluate the winner's anchored affine forms, whose
    coefficients were computed DIFFERENTIABLY at pack time and carried at
    full f32 (3 exact bf16 parts): the forward equals the rasterizer's
    bary exactly, and dL/dV_xy flows through the affine-coefficient chain
    (SURVEY.md §9.6 — tri_id stays frozen, depth has no gradient).
    dL/dradiance flows through the selected radiance fields.
    """
    from facerecon_tpu.ops.rasterize_pallas import banded_plane
    if tile_h is None:
        # bands cover the height exactly in whole tiles
        tile_h = -(-height // sel.shape[1])
    jj, ii = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
    px = (jj + 0.5).astype(jnp.float32)[None]
    py = (ii + 0.5).astype(jnp.float32)[None]

    # scalar field planes (B,H,W) from the banded layout: slicing a
    # feature-MINOR array instead would materialize temps whose minor dim
    # pads to 128 lanes on TPU — 4 GB apiece at 512x512
    def f(k):
        return banded_plane(sel, k, height, width, tile_h)

    def w(k):     # affine coefficient k: 3 exact bf16 parts = full f32
        return f(18 + k) + f(24 + k) + f(30 + k)

    x0 = f(36) + f(37) + f(38)
    y0 = f(39) + f(40) + f(41)
    qx = px - x0
    qy = py - y0
    w0 = w(0) * qx + w(1) * qy + w(2)
    w1 = w(3) * qx + w(4) * qy + w(5)
    w2 = 1.0 - w0 - w1
    hit2 = tri_id >= 0
    chans = [jnp.where(hit2, w0 * (f(c) + f(c + 9))
                       + w1 * (f(c + 3) + f(c + 12))
                       + w2 * (f(c + 6) + f(c + 15)), 0.0)
             for c in range(3)]
    color = jnp.stack(chans, axis=-1)
    # mask per scalar plane BEFORE stacking: where(hit[..., None], ...) on
    # the stacked (B,H,W,3) materializes minor-dim-padded temps on TPU
    bary = jnp.stack([jnp.where(hit2, v, 0.0) for v in (w0, w1, w2)],
                     axis=-1)
    if sel.shape[2] > 48:
        # 56-row training record: winner skin corners ride rows 48:54
        # as hi/lo pairs (static per asset — gradient flows through the
        # barycentrics only, like the gather path it replaces)
        sk = [jax.lax.stop_gradient(f(48 + k) + f(51 + k))
              for k in range(3)]
        skin = jnp.where(hit2, w0 * sk[0] + w1 * sk[1] + w2 * sk[2], 0.0)
        return color, bary, skin
    return color, bary, None


def shade_packed(tri_id, verts_ndc, radiance, faces, height: int,
                 width: int):
    """Differentiable shading via ONE packed per-pixel gather.

    The naive path (gather 3 screen verts, gather 3x3 radiance, blend)
    issues several multi-level element gathers per pixel; TPU gathers run at
    ~element/cycle, which made shading 4x the cost of rasterization. Packing
    each face's [radiance0..2 (9), screen0..2 (6)] into one contiguous
    16-float record turns the pixel stage into a single row gather.
    Gradients flow exactly as in barycentric_from_id + interpolate (same
    edge-function math on the same gathered values): dL/dradiance through
    the gathers, dL/dV_xy through the recomputed barycentrics, tri_id frozen.

    Returns (color (B,H,W,3), bary (B,H,W,3)).
    """
    screen = rasterize_jnp.ndc_to_screen(verts_ndc, height, width)  # (B,N,2)
    b = radiance.shape[0]
    rad_f = jnp.take(radiance, faces.reshape(-1), axis=1)  # (B, 3F, 3)
    rad_f = rad_f.reshape(b, -1, 9)                        # (B, F, 9)
    scr_f = jnp.take(screen, faces.reshape(-1), axis=1)    # (B, 3F, 2)
    scr_f = scr_f.reshape(b, -1, 6)                        # (B, F, 6)
    rec = jnp.concatenate([rad_f, scr_f], axis=-1)         # (B, F, 15)

    safe = jnp.maximum(tri_id, 0)
    px_rec = jnp.take_along_axis(
        rec, safe.reshape(b, -1, 1), axis=1).reshape(*tri_id.shape, 15)

    jj, ii = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
    px = (jj + 0.5).astype(jnp.float32)[None]
    py = (ii + 0.5).astype(jnp.float32)[None]
    x0, y0 = px_rec[..., 9], px_rec[..., 10]
    x1, y1 = px_rec[..., 11], px_rec[..., 12]
    x2, y2 = px_rec[..., 13], px_rec[..., 14]

    def edge(ax, ay, bx, by):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    e0 = edge(x1, y1, x2, y2)
    e1 = edge(x2, y2, x0, y0)
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    area_safe = jnp.where(area == 0.0, 1.0, area)    # NaN-safe grad
    inv_area = jnp.where(area == 0.0, 0.0, 1.0 / area_safe)
    w0, w1 = e0 * inv_area, e1 * inv_area
    hit = (tri_id >= 0)[..., None]
    bary = jnp.where(hit, jnp.stack([w0, w1, 1.0 - w0 - w1], axis=-1), 0.0)
    color = (bary[..., 0:1] * px_rec[..., 0:3]
             + bary[..., 1:2] * px_rec[..., 3:6]
             + bary[..., 2:3] * px_rec[..., 6:9])
    return jnp.where(hit, color, 0.0), bary


class RenderOut(NamedTuple):
    image: jnp.ndarray        # (B,H,W,3) composited render
    mask: jnp.ndarray         # (B,H,W) coverage (1 = face)
    tri_id: jnp.ndarray       # (B,H,W) int32
    bary: jnp.ndarray         # (B,H,W,3) differentiable barycentrics
    radiance: jnp.ndarray     # (B,N,3) per-vertex shaded color
    geometry: Geometry
    skin: Optional[jnp.ndarray] = None  # (B,H,W) interpolated skin mask
    # (select-delivered on the TPU training path; None -> losses gather it)


def render_geometry(geom: Geometry, gamma, bfm: DeviceBFM,
                    cfg: FaceReconConfig,
                    background: Optional[jnp.ndarray] = None,
                    image_size: Optional[int] = None,
                    inference: bool = False) -> RenderOut:
    h = w = image_size or cfg.image_size
    radiance = sh_ops.illuminate(geom.texture, geom.normals, gamma)
    from facerecon_tpu.ops import rasterize_pallas, rasterize_tiled
    if rasterize_pallas.is_available():
        # TPU: fused Pallas hard-visibility + in-kernel MXU one-hot record
        # select (dynamic per-pixel gathers are the slowest stage on TPU;
        # fusing the select into the raster kernel shares the candidate
        # window DMA and kills the second kernel's per-band fixed cost).
        # Setup/records are laid out in the asset's static raster row
        # order (bfm.raster_rows: (y-bin, x)-sorted, chunk-aligned bins)
        # so the kernel's per-column candidate windows stay tight.
        fields = _render_fields(geom.verts_ndc, radiance,
                                bfm.raster_rows, h, w,
                                corner_adj=bfm.raster_corner_adj)
        pad_rows = rasterize_pallas.padded_rows(bfm.raster_rows.shape[0])
        # the kernel's pre-split record, built in ONE materialization
        # from the shared field blocks (non-differentiable bitcast
        # splits — the _stack24 record below carries the gradient). The
        # training record additionally carries the static skin-corner
        # rows so the select delivers the loss's skin mask for free; the
        # inference record stays 48 rows (no loss consumer, less DMA).
        skin = None
        rec48 = jax.lax.stop_gradient(
            _pack_split_records(fields, bfm.raster_row_id, pad_rows,
                                skin=None if inference
                                else bfm.raster_skin))
        if inference:
            # forward-only path: shading finishes inside the kernel and
            # only 16 fields/pixel reach HBM (no gradient support)
            tri_id, color, bary = rasterize_pallas.rasterize_shaded(
                rec48, geom.verts_ndc, bfm.faces, height=h, width=w,
                tile_h=cfg.tile_h, n_cols=cfg.raster_cols,
                row_faces=bfm.raster_rows, row_id=bfm.raster_row_id)
        else:
            records = _stack24(fields, pad_rows)
            tri_id, sel = rasterize_pallas.rasterize_select(
                records, geom.verts_ndc, bfm.faces, h, w, cfg.tile_h,
                n_cols=cfg.raster_cols, row_faces=bfm.raster_rows,
                row_id=bfm.raster_row_id, rec48=rec48)
            color, bary, skin = _shade_from_sel(tri_id, sel, h, w,
                                                tile_h=cfg.tile_h)
    else:
        skin = None
        tri_id = rasterize_tiled.rasterize_batch(
            jax.lax.stop_gradient(geom.verts_ndc), bfm.faces, height=h,
            width=w, tile_h=cfg.tile_h,
            max_tris_per_band=cfg.max_tris_per_tile)[0]
        color, bary = shade_packed(tri_id, geom.verts_ndc, radiance,
                                   bfm.faces, h, w)
    mask = (tri_id >= 0).astype(jnp.float32)
    if background is None:
        background = jnp.zeros_like(color)
    image = color * mask[..., None] + background * (1.0 - mask[..., None])
    return RenderOut(image=image, mask=mask, tri_id=tri_id, bary=bary,
                     radiance=radiance, geometry=geom, skin=skin)


def render_coeffs(coeffs: Coeffs, bfm: DeviceBFM, cfg: FaceReconConfig,
                  background: Optional[jnp.ndarray] = None,
                  image_size: Optional[int] = None,
                  inference: bool = False) -> RenderOut:
    """Full differentiable render: coefficients -> composited image.

    inference=True picks the forward-only in-kernel-shaded TPU path
    (no gradients; ~identical values, see rasterize_shaded)."""
    geom = coeffs_to_geometry(coeffs, bfm, cfg)
    return render_geometry(geom, coeffs.gamma, bfm, cfg,
                           background=background, image_size=image_size,
                           inference=inference)
