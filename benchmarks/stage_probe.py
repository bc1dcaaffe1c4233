"""Stage isolation probe for the shipped render path: times (a) binning +
layouts only, (b) the fused kernel dispatch, (c) kernel + unpack + shade,
all chained in-jit (device-true over the axon tunnel).

  python benchmarks/stage_probe.py [BATCH=64] [SIZE=224] [TILEH=2]
  NCOLS=4 ROWS=1   column tiles / raster row order (the shipped defaults)
  NCOLS=1 ROWS=0   round-2-style single-column identity-order kernel
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu.config import default_config
from facerecon_tpu.data.synthetic import sample_coeffs
from facerecon_tpu.ops import rasterize_pallas as RP
from facerecon_tpu.ops import sh as sh_ops
from facerecon_tpu.ops.geometry import coeffs_to_geometry, device_bfm
from facerecon_tpu.ops.render import (_pack_render_records, _shade_from_sel)
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff


def timed(tag, fn, *args, inner=8, reps=3):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            s = fn(*a, seed=carry)
            return s * 1e-30, s
        _, ss = jax.lax.scan(body, 0.0, None, length=inner)
        return jnp.sum(ss)

    t0 = time.time()
    _ = float(chained(*args))
    print(f"{tag}: compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = chained(*args)
    _ = float(out)
    dt = (time.time() - t0) / (reps * inner)
    b = args[0].shape[0]
    print(f"{tag}: {dt*1000:7.1f} ms/{b} -> {b/dt:7.0f} faces/s", flush=True)


def main():
    size = int(os.environ.get("SIZE", "224"))
    batch = int(os.environ.get("BATCH", "64"))
    tile_h = int(os.environ.get("TILEH", "2"))
    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0,
                        tile_h=tile_h)
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(0)
    scale = float(os.environ.get("CSCALE", "0.3"))   # 0 = bench-like
    n_cols = int(os.environ.get("NCOLS", str(cfg.raster_cols)))
    use_rows = os.environ.get("ROWS", "1") == "1"
    if use_rows:
        row_faces, row_id = bfm.raster_rows, bfm.raster_row_id
    else:
        row_faces = bfm.faces
        row_id = jnp.arange(bfm.faces.shape[0], dtype=jnp.int32)
    n_faces = bfm.faces.shape[0]
    cv = jnp.asarray(sample_coeffs(rng, cfg, batch, scale=scale))

    @jax.jit
    def prep(cv):
        c = split_coeff(cv, cfg)
        geom = coeffs_to_geometry(c, bfm, cfg)
        radiance = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
        records = _pack_render_records(
            geom.verts_ndc, radiance, row_faces, size, size,
            RP.padded_rows(row_faces.shape[0]))
        return geom.verts_ndc, records

    vndc, records = prep(cv)
    jax.block_until_ready(records)
    print(f"prep ready (n_cols={n_cols} rows={use_rows})", flush=True)
    h = w = size

    def f_bin(vndc, records, seed):
        (blo, _), cmask, coeffs = RP._band_windows(
            vndc * (1.0 + seed), row_faces, row_id, h, w, tile_h,
            n_cols, False)
        rt = RP._split_records(records, row_id)
        return (jnp.sum(blo).astype(jnp.float32)
                + jnp.sum(cmask).astype(jnp.float32) + coeffs[0, 0, 0]
                + rt[0, 0, 0].astype(jnp.float32))

    def f_kernel(vndc, records, seed):
        rec_t = RP._split_records(records, row_id)
        out = RP._fused_impl(rec_t, vndc * (1.0 + seed * 1e-30),
                             row_faces, row_id, n_faces=n_faces,
                             height=h, width=w, tile_h=tile_h,
                             n_cols=n_cols)
        return out[1][0, 0, 0, 0]   # one element of sel (dispatch-true)

    def f_pos(vndc, records, seed):
        # phase-1 only: setup DMA + eval + reductions, no records/select
        pos, _, zb, _ = RP.rasterize_positions(
            vndc * (1.0 + seed * 1e-30), bfm.faces, height=h, width=w,
            tile_h=tile_h, n_cols=n_cols, row_faces=row_faces,
            row_id=row_id)
        return jnp.sum(zb[:, ::64, ::64]) + pos[0, 0, 0].astype(jnp.float32)

    def f_shade(vndc, records, seed):
        pos, sel = RP.rasterize_select(
            records * (1.0 + seed * 1e-30), vndc, bfm.faces, h, w, tile_h,
            n_cols=n_cols, row_faces=row_faces, row_id=row_id)
        color, bary, _ = _shade_from_sel(pos, sel, h, w, tile_h=tile_h)
        return jnp.mean(color)

    def f_prep(vndc, records, seed):
        v2, r2 = prep(cv * (1.0 + seed * 1e-30))
        return jnp.mean(v2) + jnp.mean(r2)

    def f_ishade(vndc, records, seed):
        # the shipped inference path: in-kernel shade, 16-field output
        pos, color, bary = RP.rasterize_shaded(
            records * (1.0 + seed * 1e-30), vndc, bfm.faces, height=h,
            width=w, tile_h=tile_h, n_cols=n_cols, row_faces=row_faces,
            row_id=row_id)
        return jnp.mean(color) + jnp.mean(bary)

    def f_pack24(vndc, records, seed):
        # records24 materialized (sum forces it; ~1 ms reduction cost)
        r = _pack_render_records(
            vndc * (1.0 + seed * 1e-30), radiance_g, row_faces, size,
            size, RP.padded_rows(row_faces.shape[0]))
        return jnp.sum(r)

    def f_split(vndc, records, seed):
        rt = RP._split_records(records * (1.0 + seed * 1e-30), row_id)
        return jnp.sum(rt.astype(jnp.float32))

    def f_windows(vndc, records, seed):
        (blo, _), cmask, coeffs = RP._band_windows(
            vndc * (1.0 + seed), row_faces, row_id, size, size, tile_h,
            n_cols, False)
        return (jnp.sum(blo).astype(jnp.float32)
                + jnp.sum(cmask).astype(jnp.float32) + jnp.sum(coeffs))

    @jax.jit
    def rad_only(cv):
        c = split_coeff(cv, cfg)
        geom = coeffs_to_geometry(c, bfm, cfg)
        return sh_ops.illuminate(geom.texture, geom.normals, c.gamma)

    radiance_g = rad_only(cv)

    def f_packsplit(vndc, records, seed):
        # the PRODUCTION record pack: field blocks -> 48-row pre-split
        # bf16 kernel record in one materialization
        from facerecon_tpu.ops.render import (_pack_split_records,
                                              _render_fields)
        fields = _render_fields(vndc * (1.0 + seed * 1e-30), radiance_g,
                                row_faces, size, size)
        r = _pack_split_records(fields, row_id,
                                RP.padded_rows(row_faces.shape[0]))
        return jnp.sum(r.astype(jnp.float32))

    def f_fields(vndc, records, seed):
        from facerecon_tpu.ops.render import _render_fields
        fields = _render_fields(vndc * (1.0 + seed * 1e-30), radiance_g,
                                row_faces, size, size)
        return sum(jnp.sum(f) for f in fields)

    def f_synth(vndc, records, seed):
        from facerecon_tpu.ops.geometry import (compute_rotation,
                                                rigid_transform,
                                                shape_formation,
                                                texture_formation, to_ndc)
        c = split_coeff(cv * (1.0 + seed * 1e-30), cfg)
        shape = shape_formation(c.id, c.exp, bfm)
        tex = texture_formation(c.tex, bfm)
        rot = compute_rotation(c.angles)
        verts = rigid_transform(shape, rot, c.trans)
        return (jnp.sum(to_ndc(verts, cfg)) + jnp.sum(tex)
                + jnp.sum(shape))

    def f_normals(vndc, records, seed):
        from facerecon_tpu.ops.geometry import compute_norm
        c = split_coeff(cv * (1.0 + seed * 1e-30), cfg)
        from facerecon_tpu.ops.geometry import shape_formation
        shape = shape_formation(c.id, c.exp, bfm)
        n = compute_norm(shape, bfm.faces, shape.shape[-2],
                         adj=bfm.vertex_face_adj,
                         corner_adj=bfm.vertex_corner_adj,
                         corner_adj_cm=bfm.vertex_corner_adj_cm)
        return jnp.sum(n)

    def f_geo(vndc, records, seed):
        c = split_coeff(cv * (1.0 + seed * 1e-30), cfg)
        geom = coeffs_to_geometry(c, bfm, cfg)
        return (jnp.sum(geom.verts_ndc) + jnp.sum(geom.normals)
                + jnp.sum(geom.texture))

    def f_georad(vndc, records, seed):
        c = split_coeff(cv * (1.0 + seed * 1e-30), cfg)
        geom = coeffs_to_geometry(c, bfm, cfg)
        rad = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
        return jnp.sum(rad) + jnp.sum(geom.verts_ndc)

    only = os.environ.get("ONLY")
    probes = {"prep": ("prep(geom+pack)", f_prep),
              "synth": ("synthesis+pose ", f_synth),
              "normals": ("normals        ", f_normals),
              "fields": ("render fields  ", f_fields),
              "packsplit": ("fields+split48 ", f_packsplit),
              "geo": ("geometry only  ", f_geo),
              "georad": ("geometry+SH    ", f_georad),
              "bin": ("bin+layouts   ", f_bin),
              "pack24": ("pack24 (sum)  ", f_pack24),
              "split": ("split48 (sum) ", f_split),
              "windows": ("windows (sum) ", f_windows),
              "pos": ("pos-only kernel", f_pos),
              "kernel": ("fused kernel  ", f_kernel),
              "shade": ("kernel+shade  ", f_shade),
              "ishade": ("kernel ishade ", f_ishade)}
    for key, (tag, fn) in probes.items():
        if only and key not in only.split(","):
            continue
        timed(tag, fn, vndc, records)


if __name__ == "__main__":
    main()
