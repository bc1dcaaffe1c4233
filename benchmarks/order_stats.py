"""Candidate-pair accounting for STATIC ROW ORDER variants (CPU).

The kernel's pruning is an exact per-chunk bitmask per (band, column);
the pair count is therefore set by how well the static order packs each
chunk inside one (band, column) tile. Compares, on real binning data:

  a) the shipped (y-bin 2px, x)-sorted order (utils/bfm.raster_row_order)
  b) taller y bins matched to tile_h
  c) full TILE order: (y-band, x-column-tile) bins, chunk-aligned per bin
     — each chunk then lives inside ONE column tile at the mean pose, so
     live chunks/column approach ceil(tile_faces/128) (the per-triangle
     list bound, statically)

  SIZE=224 TILEH=4 NCOLS=7 CSCALE=0.0 python benchmarks/order_stats.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from facerecon_tpu.config import default_config
from facerecon_tpu.data.synthetic import sample_coeffs
from facerecon_tpu.ops import rasterize_pallas as RP
from facerecon_tpu.ops.geometry import coeffs_to_geometry, device_bfm
from facerecon_tpu.ops.rasterize_jnp import ndc_to_screen
from facerecon_tpu.utils.bfm import synthetic_bfm, raster_row_order
from facerecon_tpu.utils.coeffs import split_coeff

CHUNK = 128


def tile_order(faces, mean_shape, bin_y, bin_x, image_size=224.0,
               focal=1015.0, camera_distance=10.0):
    """(y-band, x-tile) binned, chunk-aligned static order."""
    f = faces.shape[0]
    mean = mean_shape.reshape(-1, 3)
    z = camera_distance - mean[:, 2]
    u = focal * mean[:, 0] / z + image_size / 2.0
    v = image_size / 2.0 - focal * mean[:, 1] / z
    fu = u[faces].mean(1)
    fv = v[faces].mean(1)
    yb = np.clip(np.floor(fv / bin_y), 0, None).astype(np.int64)
    xb = np.clip(np.floor(fu / bin_x), 0, None).astype(np.int64)
    key = yb * (2 ** 20) + xb
    order = np.argsort(key * (2.0 ** 32) + fu, kind="stable")
    ks = key[order]
    ids = []
    for k in np.unique(ks):
        idx = order[ks == k]
        ids.append(idx)
        ids.append(np.full((-len(idx)) % CHUNK, -1, np.int64))
    row = np.concatenate(ids)
    pad = row < 0
    rows = np.where(pad[:, None], 0, faces[np.clip(row, 0, None)])
    row_id = np.where(pad, f + 1, row)
    return rows.astype(np.int32), row_id.astype(np.int32)


def accounting(tag, fr, screen, size, tile_h, n_cols, batch):
    fp = fr.shape[0]
    x = screen[:, :, 0][:, fr]
    y = screen[:, :, 1][:, fr]
    u1 = x[:, :, 1] - x[:, :, 0]
    v1 = y[:, :, 1] - y[:, :, 0]
    u2 = x[:, :, 2] - x[:, :, 0]
    v2 = y[:, :, 2] - y[:, :, 0]
    live = np.abs(u1 * v2 - v1 * u2) > 1e-12
    big = 3e38
    xmin = np.where(live, x.min(2), big)
    xmax = np.where(live, x.max(2), -big)
    ymin = np.where(live, y.min(2), big)
    ymax = np.where(live, y.max(2), -big)
    tile_w = RP.col_width(size, n_cols)
    n_bands = (size + tile_h - 1) // tile_h
    col_px = tile_h * tile_w
    pad = (-fp) % CHUNK
    nct = (fp + pad) // CHUNK

    def cmm(a, fill, red):
        a = np.pad(a, ((0, 0), (0, pad)), constant_values=fill)
        return red(a.reshape(batch, nct, CHUNK), 2)

    cymin = cmm(ymin, big, np.ndarray.min)
    cymax = cmm(ymax, -big, np.ndarray.max)
    cxmin = cmm(xmin, big, np.ndarray.min)
    cxmax = cmm(xmax, -big, np.ndarray.max)
    band_tops = np.arange(n_bands, dtype=np.float32)[:, None] * tile_h
    col_lefts = np.arange(n_cols, dtype=np.float32)[:, None] * tile_w
    hit_y = ((cymin[:, None] <= band_tops + tile_h)
             & (cymax[:, None] >= band_tops))
    hit_x = ((cxmin[:, None] <= col_lefts + tile_w)
             & (cxmax[:, None] >= col_lefts))
    hit = hit_y[:, :, None] & hit_x[:, None]        # (B, bands, cols, nct)
    any_hit = hit.any(3)
    first = hit.argmax(3)
    last = nct - 1 - hit[:, :, :, ::-1].argmax(3)
    ulo = np.where(any_hit, first, 2 ** 30).min(2)
    uhi = np.where(any_hit, last + 1, 0).max(2)
    any_b = any_hit.any(2)
    un = np.where(any_b, uhi - np.where(any_b, ulo, 0), 0)
    pairs = hit.sum() * CHUNK * col_px / batch
    # mask covers first 64 chunks of the union window only
    over = (un > RP._WINDOW).mean()
    print(f"{tag:28s} rows={fp:6d} (+{fp - 70789:5d} pad) "
          f"pairs/img={pairs/1e6:6.1f}M  union mean={un[any_b].mean():5.1f} "
          f"p99={np.percentile(un[any_b], 99):4.0f} max={un.max():4d} "
          f"fallback-bands={over*100:.2f}%")


def main():
    size = int(os.environ.get("SIZE", "224"))
    tile_h = int(os.environ.get("TILEH", "4"))
    n_cols = int(os.environ.get("NCOLS", "7"))
    scale = float(os.environ.get("CSCALE", "0.0"))
    batch = int(os.environ.get("BATCH", "8"))
    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0,
                         tile_h=tile_h)
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(0)
    cv = jnp.asarray(sample_coeffs(rng, cfg, batch, scale=scale))
    geom = coeffs_to_geometry(split_coeff(cv, cfg), bfm, cfg)
    screen = np.asarray(ndc_to_screen(geom.verts_ndc, size, size))
    tile_w = RP.col_width(size, n_cols)
    print(f"tile_h={tile_h} n_cols={n_cols} col_w={tile_w} scale={scale}")

    accounting("shipped (ybin=2px)", np.asarray(bfm.raster_rows), screen,
               size, tile_h, n_cols, batch)
    for by in (float(tile_h),):
        r2, _ = raster_row_order(assets.faces, assets.mean_shape,
                                 bin_px=by, image_size=size,
                                 focal=cfg.focal)
        accounting(f"ybin={by:.0f}px", r2, screen, size, tile_h, n_cols,
                   batch)
    for (by, bx) in ((tile_h, tile_w), (tile_h, tile_w / 2),
                     (2 * tile_h, tile_w), (tile_h, 2 * tile_w)):
        r3, _ = tile_order(assets.faces, assets.mean_shape, by, bx,
                           image_size=float(size), focal=cfg.focal)
        accounting(f"tile ({by}px x {bx:.0f}px)", r3, screen, size,
                   tile_h, n_cols, batch)


if __name__ == "__main__":
    main()
