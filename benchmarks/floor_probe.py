"""Times the fused-select pallas_call ALONE (inputs precomputed, chained
through the tiny scalar-prefetch arrays) vs the producer stages, to
attribute the non-compute floor of the render path. Combine with
RP_ABLATE to strip kernel phases, e.g.:

  RP_ABLATE=sel,eval,dma,pack python benchmarks/floor_probe.py   # skeleton
  python benchmarks/floor_probe.py                               # full
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facerecon_tpu.config import default_config
from facerecon_tpu.data.synthetic import sample_coeffs
from facerecon_tpu.ops import rasterize_pallas as RP
from facerecon_tpu.ops import sh as sh_ops
from facerecon_tpu.ops.geometry import coeffs_to_geometry, device_bfm
from facerecon_tpu.ops.render import _pack_render_records
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff


def main():
    size = int(os.environ.get("SIZE", "224"))
    batch = int(os.environ.get("BATCH", "128"))
    tile_h = int(os.environ.get("TILEH", "2"))
    n_cols = int(os.environ.get("NCOLS", "4"))
    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0,
                         tile_h=tile_h)
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(0)
    cv = jnp.asarray(sample_coeffs(rng, cfg, batch, scale=0.0))
    c = split_coeff(cv, cfg)
    geom = coeffs_to_geometry(c, bfm, cfg)
    rad = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
    rows, rid = bfm.raster_rows, bfm.raster_row_id

    @jax.jit
    def produce(v, r):
        (clo, cn), cmask, coeffs = RP._band_windows(
            v, rows, rid, size, size, tile_h, n_cols, False)
        rec_t = RP._split_records(
            _pack_render_records(v, r, rows, size, size,
                                 RP.padded_rows(rows.shape[0])), rid)
        return clo, cn, cmask, coeffs, rec_t

    # FLOOR_MASK=ones: saturate the chunk masks (every window chunk
    # evaluates) to separate per-chunk eval cost from fixed per-region
    # scalar-check cost: fixed = (t_ones - t_real) / (64 - live_mean)
    # extrapolated, values garbage (stale lanes), timing valid.
    clo, cn, cmask, setup_t, rec_t = jax.block_until_ready(
        produce(geom.verts_ndc, rad))
    if os.environ.get("FLOOR_MASK") == "ones":
        cmask = jnp.full_like(cmask, -1)
    print("inputs ready", setup_t.shape, rec_t.shape, flush=True)

    bsz = batch
    tile_w = RP.col_width(size, n_cols) * n_cols
    n_bands = (size + tile_h - 1) // tile_h
    band_px = tile_h * tile_w

    mode = os.environ.get("FLOOR_KMODE", "select")
    out_rows = RP._OUT_S if mode == "shade" else RP._RFIELDS

    def call_pos(clo, cn, cm, st, rt):
        return pl.pallas_call(
            functools.partial(RP._kernel, tile_h=tile_h, tile_w=tile_w,
                              n_cols=n_cols, band_px=band_px,
                              mode="pos"),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(bsz, n_bands),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                scratch_shapes=[
                    pltpu.VMEM((RP._ROW_PAD, RP._WINDOW * RP._CHUNK),
                               jnp.float32),
                    pltpu.VMEM((band_px, 1), jnp.float32),
                    pltpu.VMEM((band_px, 1), jnp.float32),
                    pltpu.VMEM((tile_h * (tile_w // n_cols), RP._CHUNK),
                               jnp.float32),
                    pltpu.VMEM((tile_h * (tile_w // n_cols), RP._CHUNK),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA((RP._WINDOW // RP._SEG,)),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, RP._OUT_P, band_px),
                                 lambda b, t, *_: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bsz, n_bands, RP._OUT_P, band_px),
                                     jnp.bfloat16),
            ],
        )(clo, cn, cm, st)[0]

    def call(clo, cn, cm, st, rt):
        if mode == "pos":
            return call_pos(clo, cn, cm, st, rt)
        return pl.pallas_call(
            functools.partial(RP._kernel, tile_h=tile_h, tile_w=tile_w,
                              n_cols=n_cols, band_px=band_px,
                              mode=mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(bsz, n_bands),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                scratch_shapes=[
                    pltpu.VMEM((RP._ROW_PAD, RP._WINDOW * RP._CHUNK),
                               jnp.float32),
                    pltpu.VMEM((RP._RFIELDS, RP._WINDOW * RP._CHUNK),
                               jnp.bfloat16),
                    pltpu.VMEM((band_px, 1), jnp.float32),
                    pltpu.VMEM((band_px, 1), jnp.float32),
                    pltpu.VMEM((tile_h * (tile_w // n_cols), RP._CHUNK),
                               jnp.float32),
                    pltpu.VMEM((tile_h * (tile_w // n_cols), RP._CHUNK),
                               jnp.float32),
                    pltpu.VMEM((RP._RFIELDS, band_px), jnp.float32),
                    pltpu.SemaphoreType.DMA((2 * (RP._WINDOW // RP._SEG),)),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, out_rows, band_px),
                                 lambda b, t, *_: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bsz, n_bands, out_rows, band_px),
                                     jnp.bfloat16),
            ],
        )(clo, cn, cm, st, rt)[0]

    inner = 8

    @jax.jit
    def chained(clo, cn, cm, st, rt):
        def body(carry, _):
            out = call(clo + (carry * 1e-30).astype(jnp.int32), cn, cm,
                       st, rt)
            s = out[0, 0, 0, 0].astype(jnp.float32)
            return s * 1e-30, s
        _, ss = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return jnp.sum(ss)

    t0 = time.time()
    _ = float(chained(clo, cn, cmask, setup_t, rec_t))
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = chained(clo, cn, cmask, setup_t, rec_t)
    _ = float(out)
    dt = (time.time() - t0) / (reps * inner)
    print(f"pallas_call alone (RP_ABLATE={os.environ.get('RP_ABLATE','')}):"
          f" {dt*1000:7.1f} ms/{batch}", flush=True)


if __name__ == "__main__":
    main()
