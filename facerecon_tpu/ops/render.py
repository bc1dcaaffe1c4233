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


def _rasterize_tri_id(verts_ndc, faces, height, width, cfg):
    """Hard-visibility pass -> tri_id (B,H,W) int32. Chooses backend:
    Pallas kernel on TPU, band-binned jnp elsewhere."""
    verts_ndc = jax.lax.stop_gradient(verts_ndc)
    from facerecon_tpu.ops import rasterize_pallas, rasterize_tiled
    if rasterize_pallas.is_available():
        return rasterize_pallas.rasterize_batch(
            verts_ndc, faces, height=height, width=width, cfg=cfg)[0]
    return rasterize_tiled.rasterize_batch(
        verts_ndc, faces, height=height, width=width, tile_h=cfg.tile_h,
        max_tris_per_band=cfg.max_tris_per_tile)[0]


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
    inv_area = jnp.where(area == 0, 0.0, 1.0 / area)
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


class RenderOut(NamedTuple):
    image: jnp.ndarray        # (B,H,W,3) composited render
    mask: jnp.ndarray         # (B,H,W) coverage (1 = face)
    tri_id: jnp.ndarray       # (B,H,W) int32
    bary: jnp.ndarray         # (B,H,W,3) differentiable barycentrics
    radiance: jnp.ndarray     # (B,N,3) per-vertex shaded color
    geometry: Geometry


def render_geometry(geom: Geometry, gamma, bfm: DeviceBFM,
                    cfg: FaceReconConfig,
                    background: Optional[jnp.ndarray] = None,
                    image_size: Optional[int] = None) -> RenderOut:
    h = w = image_size or cfg.image_size
    radiance = sh_ops.illuminate(geom.texture, geom.normals, gamma)
    tri_id = _rasterize_tri_id(geom.verts_ndc, bfm.faces, h, w, cfg)
    bary = barycentric_from_id(tri_id, geom.verts_ndc, bfm.faces, h, w)
    color = interpolate(tri_id, bary, bfm.faces, radiance)
    mask = (tri_id >= 0).astype(jnp.float32)
    if background is None:
        background = jnp.zeros_like(color)
    image = color * mask[..., None] + background * (1.0 - mask[..., None])
    return RenderOut(image=image, mask=mask, tri_id=tri_id, bary=bary,
                     radiance=radiance, geometry=geom)


def render_coeffs(coeffs: Coeffs, bfm: DeviceBFM, cfg: FaceReconConfig,
                  background: Optional[jnp.ndarray] = None,
                  image_size: Optional[int] = None) -> RenderOut:
    """Full differentiable render: coefficients -> composited image."""
    geom = coeffs_to_geometry(coeffs, bfm, cfg)
    return render_geometry(geom, coeffs.gamma, bfm, cfg,
                           background=background, image_size=image_size)
