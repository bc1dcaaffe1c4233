"""Full-chain attribution of the HEADLINE bench path (bench.py default
mode): chained truncations of make_reconstruct_fn's body so each stage's
cost is the delta between consecutive probes, measured exactly as the
bench measures (jit + scan-chained dispatches, batch-128 microbatch).

  BATCH=128 python benchmarks/headline_probe.py
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
from facerecon_tpu.ops import rasterize_pallas as RP
from facerecon_tpu.ops import sh as sh_ops
from facerecon_tpu.ops.geometry import coeffs_to_geometry
from facerecon_tpu.ops.render import (_pack_split_records, _render_fields,
                                      render_geometry)
from facerecon_tpu.pipeline import (fuse_for_inference, init_params,
                                    make_pipeline)
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff


def timed(tag, fn, *args, inner=8, reps=3):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            s = fn(a[0] * (1.0 + carry * 1e-30), *a[1:])
            return s * 1e-30, s
        _, ss = jax.lax.scan(body, 0.0, None, length=inner)
        return jnp.sum(ss)

    t0 = time.time()
    _ = float(chained(*args))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = chained(*args)
    _ = float(out)
    dt = (time.time() - t0) / (reps * inner)
    b = args[0].shape[0]
    print(f"{tag:26s}: {dt*1000:7.1f} ms/{b}  [compile {ct:.0f}s]",
          flush=True)
    return dt


def main():
    batch = int(os.environ.get("BATCH", "128"))
    cfg = default_config(batch_size=batch)
    assets = synthetic_bfm(cfg, seed=0)
    pipe = make_pipeline(cfg, assets)
    variables = init_params(pipe, jax.random.PRNGKey(0))
    pipe, variables = fuse_for_inference(pipe, variables)
    model, bfm = pipe.model, pipe.bfm
    h = w = cfg.image_size

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, h, w, 3)), jnp.float32)

    def upto(stage):
        def fn(im):
            coeff_vec = model.apply(variables, im, train=False)
            if stage == "cnn":
                return jnp.sum(coeff_vec)
            c = split_coeff(coeff_vec, cfg)
            geom = coeffs_to_geometry(c, bfm, cfg)
            rad = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
            if stage == "geom":
                return (jnp.sum(geom.verts_ndc) + jnp.sum(rad)
                        + jnp.sum(geom.landmarks2d))
            fields = _render_fields(geom.verts_ndc, rad, bfm.raster_rows,
                                    h, w, corner_adj=bfm.raster_corner_adj)
            rec48 = jax.lax.stop_gradient(_pack_split_records(
                fields, bfm.raster_row_id,
                RP.padded_rows(bfm.raster_rows.shape[0])))
            if stage == "pack":
                return jnp.sum(rec48.astype(jnp.float32)) + jnp.sum(
                    geom.verts_ndc)
            if stage == "windows":
                (blo, bn), cmask, coeffs = RP._band_windows(
                    geom.verts_ndc, bfm.raster_rows, bfm.raster_row_id,
                    h, w, cfg.tile_h, cfg.raster_cols, False)
                return (jnp.sum(rec48.astype(jnp.float32))
                        + jnp.sum(blo).astype(jnp.float32)
                        + jnp.sum(coeffs))
            if stage == "kernel":
                tri_id, color, bary = RP.rasterize_shaded(
                    rec48, geom.verts_ndc, bfm.faces, height=h, width=w,
                    tile_h=cfg.tile_h, n_cols=cfg.raster_cols,
                    row_faces=bfm.raster_rows, row_id=bfm.raster_row_id)
                return jnp.sum(color[:, ::32, ::32])
            out = render_geometry(geom, c.gamma, bfm, cfg,
                                  background=im, inference=True)
            return jnp.mean(out.image, axis=(0, 1, 2, 3)) * batch

        return fn

    prev = 0.0
    for stage in ("cnn", "geom", "pack", "windows", "kernel", "full"):
        dt = timed(f"upto {stage}", upto(stage), images)
        print(f"    delta {1000*(dt - prev):7.1f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
