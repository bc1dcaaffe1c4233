"""Candidate-pair accounting for the rasterizer's pruning schemes (CPU).

Computes, from the real binning data, how many (triangle, pixel)
evaluation pairs each pruning granularity implies at 224px — the current
slab-bitmask scheme vs exact per-chunk masks vs per-triangle tile lists
vs the pixel-exact ideal — plus triangle-size statistics. This sizes the
algorithmic headroom BEFORE building a new kernel structure (VERDICT r3
item 1).

  SIZE=224 TILEH=2 NCOLS=4 CSCALE=0.3 python benchmarks/pair_stats.py
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
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff


def main():
    size = int(os.environ.get("SIZE", "224"))
    tile_h = int(os.environ.get("TILEH", "2"))
    n_cols = int(os.environ.get("NCOLS", "4"))
    scale = float(os.environ.get("CSCALE", "0.0"))
    batch = int(os.environ.get("BATCH", "8"))
    chunk = 128
    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0,
                         tile_h=tile_h)
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(0)
    cv = jnp.asarray(sample_coeffs(rng, cfg, batch, scale=scale))
    c = split_coeff(cv, cfg)
    geom = coeffs_to_geometry(c, bfm, cfg)
    v = geom.verts_ndc
    rows, rid = bfm.raster_rows, bfm.raster_row_id
    f = rows.shape[0]

    screen = np.asarray(ndc_to_screen(v, size, size))        # (B,N,2)
    fr = np.asarray(rows)
    x = screen[:, :, 0][:, fr]                               # (B,F,3)
    y = screen[:, :, 1][:, fr]
    xmin, xmax = x.min(2), x.max(2)
    ymin, ymax = y.min(2), y.max(2)
    # dead triangles: zero area
    u1 = x[:, :, 1] - x[:, :, 0]
    v1 = y[:, :, 1] - y[:, :, 0]
    u2 = x[:, :, 2] - x[:, :, 0]
    v2 = y[:, :, 2] - y[:, :, 0]
    area = u1 * v2 - v1 * u2
    live = np.abs(area) > 1e-12
    big = 3e38
    xmin = np.where(live, xmin, big)
    xmax = np.where(live, xmax, -big)
    ymin = np.where(live, ymin, big)
    ymax = np.where(live, ymax, -big)

    wpx = np.clip(xmax - xmin, 0, None)
    hpx = np.clip(ymax - ymin, 0, None)
    lv = live & (xmax > 0) & (xmin < size) & (ymax > 0) & (ymin < size)
    print(f"faces={f} live-on-screen={lv.mean()*100:.1f}%  "
          f"bbox w px: mean {wpx[lv].mean():.2f} p95 "
          f"{np.percentile(wpx[lv], 95):.2f}  h px: mean "
          f"{hpx[lv].mean():.2f} p95 {np.percentile(hpx[lv], 95):.2f}")
    # pixel-span stats: how many pixel CENTERS can a bbox contain
    nx = np.clip(np.floor(xmax - 0.5) - np.ceil(xmin - 0.5) + 1, 0, None)
    ny = np.clip(np.floor(ymax - 0.5) - np.ceil(ymin - 0.5) + 1, 0, None)
    npix = np.where(lv, nx * ny, 0)
    for k in (0, 1, 2, 4):
        frac = (npix[lv] <= k).mean()
        print(f"  bbox covers <= {k} pixel centers: {frac*100:.1f}%")

    tile_w = RP.col_width(size, n_cols)
    n_bands = (size + tile_h - 1) // tile_h
    col_px = tile_h * tile_w
    pad = (-f) % chunk
    nct = (f + pad) // chunk

    def cmm(a, fill):
        a = np.pad(a, ((0, 0), (0, pad)), constant_values=fill)
        return a.reshape(batch, nct, chunk)

    cymin = cmm(ymin, big).min(2)
    cymax = cmm(ymax, -big).max(2)
    cxmin = cmm(xmin, big).min(2)
    cxmax = cmm(xmax, -big).max(2)

    band_tops = np.arange(n_bands, dtype=np.float32)[:, None] * tile_h
    col_lefts = np.arange(n_cols, dtype=np.float32)[:, None] * tile_w
    hit_y = ((cymin[:, None] <= band_tops + tile_h)
             & (cymax[:, None] >= band_tops))           # (B, bands, nct)
    hit_x = ((cxmin[:, None] <= col_lefts + tile_w)
             & (cxmax[:, None] >= col_lefts))           # (B, cols, nct)
    hit = hit_y[:, :, None] & hit_x[:, None]            # (B, bands, cols, nct)

    any_hit = hit.any(3)
    first = hit.argmax(3)
    last = nct - 1 - hit[:, :, :, ::-1].argmax(3)
    ulo = np.where(any_hit, first, 2**30).min(2)
    uhi = np.where(any_hit, last + 1, 0).max(2)
    any_b = any_hit.any(2)
    ulo = np.where(any_b, ulo, 0)
    un = np.where(any_b, uhi - ulo, 0)
    print(f"band union span chunks: mean {un[any_b].mean():.1f} "
          f"p99 {np.percentile(un[any_b], 99):.0f} max {un.max()}")

    # current scheme: slab bitmask (4-chunk slabs over the union window)
    slab = 4
    rel_lo = np.maximum(first - ulo[:, :, None], 0)
    rel_hi = np.minimum(last + 1 - ulo[:, :, None], 32 * slab)
    s_lo = rel_lo // slab
    s_hi = (rel_hi + slab - 1) // slab
    live_slabs = np.where(any_hit & (rel_hi > rel_lo), s_hi - s_lo, 0)
    pairs_now = live_slabs.sum() * slab * chunk * col_px / batch
    # exact per-chunk mask at (band, col): prune the y-bin gaps too
    pairs_chunk = hit.sum() * chunk * col_px / batch
    # exact SLAB mask over a slab-ALIGNED window (the contained kernel
    # change: align ulo down to a slab boundary, mask bit = any chunk hit
    # in the slab) — slab granularity kept, y-bin gaps pruned
    slab4 = 4
    pads = (-nct) % slab4
    hit_s = np.pad(hit, ((0, 0), (0, 0), (0, 0), (0, pads)))
    hit_s = hit_s.reshape(batch, n_bands, n_cols, -1, slab4).any(4)
    pairs_exslab = hit_s.sum() * slab4 * chunk * col_px / batch
    ulo_al = (ulo // slab4) * slab4
    un_al = uhi - ulo_al
    print(f"aligned union span chunks: mean {un_al[any_b].mean():.1f} "
          f"p99 {np.percentile(un_al[any_b], 99):.0f} max {un_al.max()}")
    # exact contiguous per-col span (no slab rounding, no gap pruning)
    span = np.where(any_hit, last + 1 - first, 0)
    pairs_span = span.sum() * chunk * col_px / batch
    # per-triangle tile lists (no chunk rounding): triangle bbox vs tile
    t_hit_y = ((ymin[:, None] <= band_tops + tile_h)
               & (ymax[:, None] >= band_tops))          # (B, bands, F)
    pairs_tri = 0
    for cc in range(n_cols):
        t_hit_x = ((xmin <= (cc + 1) * tile_w) & (xmax >= cc * tile_w))
        pairs_tri += (t_hit_y & t_hit_x[:, None]).sum() * col_px
    pairs_tri /= batch
    # pixel-exact ideal: bbox pixel-center count
    pairs_ideal = npix.sum() / batch

    print(f"pairs/image  slab-mask(now): {pairs_now/1e6:8.1f} M")
    print(f"pairs/image  exact chunk   : {pairs_chunk/1e6:8.1f} M   "
          f"(x{pairs_now/max(pairs_chunk,1):.2f})")
    print(f"pairs/image  exact 4-slab  : {pairs_exslab/1e6:8.1f} M   "
          f"(x{pairs_now/max(pairs_exslab,1):.2f})")
    print(f"pairs/image  exact col span: {pairs_span/1e6:8.1f} M")
    print(f"pairs/image  tri-tile lists: {pairs_tri/1e6:8.1f} M   "
          f"(x{pairs_now/max(pairs_tri,1):.2f})")
    print(f"pairs/image  bbox-pixel    : {pairs_ideal/1e6:8.1f} M   "
          f"(x{pairs_now/max(pairs_ideal,1):.2f})")
    # chunks per (band,col) histogram (what a shortlist would gather)
    nch = hit.sum(3)
    print(f"live chunks per (band,col): mean {nch[any_hit].mean():.1f} "
          f"p99 {np.percentile(nch[any_hit], 99):.0f} max {nch.max()}")


if __name__ == "__main__":
    main()
