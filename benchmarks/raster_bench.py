"""Canonical rasterizer benchmark — keep this file STABLE so the geometry
stage hits the local compilation cache while iterating on the kernel.

  python benchmarks/raster_bench.py [--batch 64] [--check] [--size 224]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu.config import default_config
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.ops.geometry import device_bfm, coeffs_to_geometry
from facerecon_tpu.data.synthetic import sample_coeffs
from facerecon_tpu.utils.coeffs import split_coeff
from facerecon_tpu.ops import rasterize_pallas, rasterize_tiled


def geometry(cfg):
    @jax.jit
    def geom_fn(cv, bfm):
        return coeffs_to_geometry(split_coeff(cv, cfg), bfm, cfg).verts_ndc
    return geom_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--check", action="store_true",
                    help="verify vs rasterize_tiled on one face")
    ap.add_argument("--cull", action="store_true")
    ap.add_argument("--tileh", type=int, default=8)
    args = ap.parse_args()

    cfg = default_config()
    assets = synthetic_bfm(cfg, 0)
    bfm = device_bfm(assets)
    geom_fn = geometry(cfg)
    t0 = time.time()
    vndc = geom_fn(
        jnp.asarray(sample_coeffs(np.random.default_rng(0), cfg, args.batch)),
        bfm)
    jax.block_until_ready(vndc)
    print(f"geom ready ({time.time()-t0:.1f}s)", flush=True)
    h = w = args.size

    if args.check:
        tid_t, _, _ = rasterize_tiled.rasterize(
            vndc[0], bfm.faces, height=h, width=w, max_tris_per_band=8192)
        tid_p, _, _ = rasterize_pallas.rasterize_batch(
            vndc[:1], bfm.faces, height=h, width=w)
        mm = int((np.asarray(tid_t) != np.asarray(tid_p[0])).sum())
        print(f"mismatch vs tiled: {mm} / {h*w}", flush=True)

    # NB: jax.block_until_ready does not reliably block on the axon
    # backend; force synchronization through a scalar dependency fetch.
    @jax.jit
    def pos_fn(v, faces):
        pos = rasterize_pallas.rasterize_positions(
            v, faces, height=h, width=w, tile_h=args.tileh,
            cull_backfaces=args.cull)[0]
        return pos, jnp.sum(pos)

    t0 = time.time()
    out, chk = pos_fn(vndc, bfm.faces)
    _ = float(chk)
    print(f"kernel compile+1st ({time.time()-t0:.1f}s) chk={float(chk)}",
          flush=True)
    for reps in (args.reps, 2 * args.reps):
        t0 = time.time()
        for _ in range(reps):
            out, chk = pos_fn(vndc, bfm.faces)
        _ = float(chk)   # sync: scalar transfer depends on the whole chain
        dt = (time.time() - t0) / reps
        print(f"raster reps={reps}: {dt*1000:.1f} ms/{args.batch} -> "
              f"{args.batch/dt:.0f} faces/s", flush=True)


if __name__ == "__main__":
    main()
