"""Decision probe for column-window candidate pruning under a STATIC
tile-order face permutation.

The kernel's per-band eval/select work is proportional to
sum over tiles of (window_chunks * tile_px). Today every band uses one
column (tile_w = width), so work = sum_b bn_b * band_px. A per-(band,col)
window only helps if the faces inside one band are x-sorted — chunk
x-extents otherwise span ~1/3 of the face and every column sees every
chunk. This probe permutes faces ONCE by (mean-shape y-bin, x centroid)
— an asset-build-time transform, pose-independent — and reports the
eval-pair reduction at the bench operating point (zero coeffs) and under
sampled poses, for several column counts.

  python benchmarks/colwin_probe.py
  SIZE=512 TILEH=1 python benchmarks/colwin_probe.py
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
from facerecon_tpu.ops.binning import bin_triangles_static
from facerecon_tpu.ops.geometry import coeffs_to_geometry, device_bfm
from facerecon_tpu.ops.rasterize_jnp import ndc_to_screen
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff

CHUNK = 128


def tile_order(assets, cfg, y_bin_px=2.0):
    """Static face permutation: mean-shape zero-pose screen (y bin, x)."""
    mean = assets.mean_shape.reshape(-1, 3)
    # same camera path as the renderer at zero pose
    z = cfg.camera_distance - mean[:, 2]
    u = cfg.focal * mean[:, 0] / z + cfg.image_size / 2
    v = cfg.image_size / 2 - cfg.focal * mean[:, 1] / z
    fv = v[assets.faces]
    fu = u[assets.faces]
    ybin = np.floor(fv.min(axis=1) / y_bin_px)
    key = ybin * 1e4 + fu.mean(axis=1)
    return np.argsort(key, kind="stable").astype(np.int32)


def work(vndc, faces, size, tile_h, tile_w):
    n_cols = (size + tile_w - 1) // tile_w
    su = jax.jit(lambda v: bin_triangles_static(
        v, jnp.asarray(faces), size, size, tile_h, CHUNK, False,
        tile_w=tile_w))(jnp.asarray(vndc))
    cn = np.asarray(su.n_chunks)          # (bands, cols)
    col_px = tile_h * tile_w
    pairs = cn.sum() * CHUNK * col_px
    return pairs, cn.sum(), cn[cn > 0].mean() if (cn > 0).any() else 0


def main():
    size = int(os.environ.get("SIZE", "224"))
    tile_h = int(os.environ.get("TILEH", "2" if size <= 256 else "1"))
    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0,
                         tile_h=tile_h)
    assets = synthetic_bfm(cfg, seed=0)
    perm = tile_order(assets, cfg)
    faces_p = np.asarray(assets.faces)[perm]
    bfm = device_bfm(assets)

    rng = np.random.default_rng(0)
    for tag, cv in (("zero-coeff (bench point)",
                     np.zeros((4, cfg.n_coeff), np.float32)),
                    ("sampled poses",
                     np.asarray(sample_coeffs(rng, cfg, 4)))):
        c = split_coeff(jnp.asarray(cv), cfg)
        geom = coeffs_to_geometry(c, bfm, cfg)
        vndc = np.asarray(geom.verts_ndc)
        print(f"== {tag} (size {size}, tile_h {tile_h})")
        for i in range(2):
            base, bchunks, _ = work(vndc[i], np.asarray(assets.faces),
                                    size, tile_h, size)
            row = [f"band-only {bchunks:5.0f} ch {base/1e6:7.1f}Mpair"]
            for nc in (2, 4, 8):
                tw = -(-size // nc)
                tw = ((tw + 7) // 8) * 8
                for name, f in (("orig", np.asarray(assets.faces)),
                                ("perm", faces_p)):
                    p, ch, _ = work(vndc[i], f, size, tile_h, tw)
                    row.append(f"{nc}c/{name} {ch:5.0f}ch "
                               f"{p/1e6:6.1f}M ({base/p:4.2f}x)")
            print("  " + "\n  ".join(row), flush=True)


if __name__ == "__main__":
    main()
