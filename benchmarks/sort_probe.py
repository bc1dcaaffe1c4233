"""Decision probe for per-pose y-sorted face binning: compares the
per-band candidate-chunk counts (bn) of the shipped sort-free binning
against a y_min-band stable sort of the faces, and times jax.lax.sort of
the sort keys on the current backend.

  python benchmarks/sort_probe.py            # CPU bn stats
  BATCH=256 SIZE=224 python benchmarks/sort_probe.py
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
from facerecon_tpu.ops.geometry import coeffs_to_geometry, device_bfm
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff
from facerecon_tpu.ops import rasterize_jnp


def bn_stats(tag, bn):
    bn = np.asarray(bn).ravel()
    live = bn[bn > 0]
    print(f"{tag}: mean {live.mean():6.1f}  p50 {np.percentile(live, 50):5.0f}"
          f"  p95 {np.percentile(live, 95):5.0f}"
          f"  p99 {np.percentile(live, 99):5.0f}  max {live.max():5.0f}"
          f"  total-candidate-chunks {live.sum():.0f}", flush=True)


def main():
    size = int(os.environ.get("SIZE", "224"))
    batch = int(os.environ.get("BATCH", "32"))
    tile_h = int(os.environ.get("TILEH", "2" if size <= 256 else "1"))
    roll = float(os.environ.get("ROLL", "-1"))   # <0: sampled poses
    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0,
                         tile_h=tile_h)
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(0)
    cv = np.asarray(sample_coeffs(rng, cfg, batch))
    if roll >= 0:
        s = cfg.coeff_split
        cv[:, s[2]:s[3]] = 0.0
        cv[:, s[2] + 2] = roll          # pure roll, radians
    c = split_coeff(jnp.asarray(cv), cfg)
    geom = coeffs_to_geometry(c, bfm, cfg)
    vndc = np.asarray(geom.verts_ndc)

    # current sort-free windows
    _, (_, bn), _ = jax.jit(
        lambda v: RP._band_windows(
            v, bfm.faces, jnp.arange(bfm.faces.shape[0], dtype=jnp.int32),
            size, size, tile_h, 1, False)
    )(jnp.asarray(vndc))
    bn_stats("unsorted bn", bn)

    # y_min-band sorted windows: emulate by permuting faces on the host
    faces = np.asarray(bfm.faces)
    n_bands = (size + tile_h - 1) // tile_h
    bns = []
    for i in range(min(batch, 8)):
        scr = np.asarray(
            rasterize_jnp.ndc_to_screen(jnp.asarray(vndc[i][None]),
                                        size, size))[0]
        y = scr[:, 1]
        fy = y[faces]                                   # (F, 3)
        band = np.clip(np.floor(fy.min(axis=1) / tile_h), 0,
                       n_bands - 1).astype(np.int64)
        perm = np.argsort(band, kind="stable")
        _, (_, bn_i), _ = jax.jit(
            lambda v, f: RP._band_windows(
                v, f, jnp.arange(f.shape[0], dtype=jnp.int32),
                size, size, tile_h, 1, False)
        )(jnp.asarray(vndc[i][None]), jnp.asarray(faces[perm]))
        bns.append(np.asarray(bn_i)[0])
    bn_stats("y-sorted bn", np.stack(bns))

    # CHUNK-granular sort: sort whole 128-face chunks by chunk ymin (553
    # keys — device-trivial; permuting arrays is a wide contiguous gather)
    bnc = []
    F = faces.shape[0]
    nct = (F + 127) // 128
    for i in range(min(batch, 8)):
        scr = np.asarray(
            rasterize_jnp.ndc_to_screen(jnp.asarray(vndc[i][None]),
                                        size, size))[0]
        fy = scr[:, 1][faces]
        ymin = np.pad(fy.min(axis=1), (0, nct * 128 - F),
                      constant_values=3e38)
        cymin = ymin.reshape(nct, 128).min(axis=1)
        cperm = np.argsort(cymin, kind="stable")
        fperm = (cperm[:, None] * 128
                 + np.arange(128)[None, :]).reshape(-1)
        fperm = fperm[fperm < F]
        _, (_, bn_i), _ = jax.jit(
            lambda v, f: RP._band_windows(
                v, f, jnp.arange(f.shape[0], dtype=jnp.int32),
                size, size, tile_h, 1, False)
        )(jnp.asarray(vndc[i][None]), jnp.asarray(faces[fperm]))
        bnc.append(np.asarray(bn_i)[0])
    bn_stats("chunk-sorted bn", np.stack(bnc))

    # device sort cost: key build + lax.sort + face gather, chained
    F = faces.shape[0]
    faces_j = jnp.asarray(faces)

    @jax.jit
    def sort_step(vb):
        def one(carry, v):
            scr = rasterize_jnp.ndc_to_screen(v[None], size, size)[0]
            fy = jnp.take(scr[:, 1], faces_j.reshape(-1)).reshape(F, 3)
            band = jnp.clip((fy.min(axis=1) / tile_h).astype(jnp.int32),
                            0, n_bands - 1)
            key = band * (1 << 18) + jnp.arange(F, dtype=jnp.int32)
            _, perm = jax.lax.sort((key, jnp.arange(F, dtype=jnp.int32)),
                                   num_keys=1)
            fb = jnp.take(faces_j, perm, axis=0)
            return carry + jnp.sum(fb[0]).astype(jnp.float32), 0.0
        out, _ = jax.lax.scan(one, 0.0, vb * 1.0)
        return out

    vb = jnp.asarray(vndc)
    t0 = time.time()
    _ = float(sort_step(vb))
    print(f"sort: compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = sort_step(vb)
    _ = float(out)
    dt = (time.time() - t0) / reps
    print(f"key+sort+gather: {dt*1000:.1f} ms/{batch} "
          f"({dt/batch*1e6:.0f} us/face-mesh)", flush=True)


if __name__ == "__main__":
    main()
