"""Band-binned jnp rasterizer — the fast XLA path of SURVEY.md §3 C8.

Same contract as ops/rasterize_jnp.rasterize, but O(sum_b C_b * band_px)
instead of O(H*W*F): triangles are y-sorted and each tile_h-tall band only
tests its candidate slice (ops/binning.py). Pure jnp — XLA fuses the
affine-evaluate/mask/argmin chain into a single pass so the (C, band_px)
intermediates never hit HBM. The Pallas kernel (ops/rasterize_pallas.py)
shares this module's setup/binning and improves on it with per-band dynamic
chunk counts in VMEM.

Tie-breaking: equal-depth ties resolve to the lowest ORIGINAL triangle id
(the oracle's and the Pallas kernel's rule) — the winner is picked by a
two-step reduction (min depth, then min id among exact-depth matches), not
by argmin over the ymin-sorted position. Residual parity mismatches vs the
oracle are knife-edge pixels only, where 1-ulp f32 rounding between the
direct and affine-precomputed edge forms flips a ~0 edge value (see
tests/test_rasterize_fast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from facerecon_tpu.ops.binning import SETUP_WIDTH, TriSetup, bin_triangles


def _pad_setup(setup: TriSetup, cap: int) -> TriSetup:
    """Append `cap` dead triangles so every band slice of length cap is
    in-bounds."""
    dead = jnp.zeros((cap, SETUP_WIDTH), jnp.float32)
    dead = dead.at[:, 2].set(-3e38).at[:, 5].set(-3e38)
    coeffs = jnp.concatenate([setup.coeffs, dead], axis=0)
    ids = jnp.concatenate(
        [setup.ids, jnp.full((cap,), -1, jnp.int32)], axis=0)
    return TriSetup(coeffs=coeffs, ids=ids,
                    band_lo=setup.band_lo, band_hi=setup.band_hi)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "max_tris_per_band",
                     "cull_backfaces"))
def rasterize(verts_ndc, faces, *, height: int, width: int,
              tile_h: int = 8, max_tris_per_band: int = 4096,
              cull_backfaces: bool = False):
    """Single-mesh band-binned rasterization.

    Returns (tri_id (H,W) i32, bary (H,W,3) f32, zbuf (H,W) f32) per the
    SURVEY.md §9.5 contract. Candidates beyond max_tris_per_band in one band
    are dropped (choose the cap so real meshes never hit it; see
    binning_stats for monitoring).
    """
    cap = max_tris_per_band
    setup = _pad_setup(
        bin_triangles(verts_ndc, faces, height, width, tile_h,
                      cull_backfaces), cap)
    n_bands = (height + tile_h - 1) // tile_h

    cols = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]  # (1,W)
    rows_in_band = (jnp.arange(tile_h, dtype=jnp.float32) + 0.5)[:, None]

    def one_band(b):
        lo = setup.band_lo[b]
        n_live = setup.band_hi[b] - lo
        c = jax.lax.dynamic_slice(setup.coeffs, (lo, 0), (cap, SETUP_WIDTH))
        ids = jax.lax.dynamic_slice(setup.ids, (lo,), (cap,))
        live = jnp.arange(cap) < n_live                       # (C,)

        py = (b * tile_h) + rows_in_band                      # (th,1)
        px = jnp.broadcast_to(cols, (tile_h, width)).reshape(-1)
        pyf = jnp.broadcast_to(py, (tile_h, width)).reshape(-1)

        # (C, P) anchored affine evaluation + coverage + depth
        qx = px[None] - c[:, 9:10]
        qy = pyf[None] - c[:, 10:11]
        w0 = c[:, 0:1] * qx + c[:, 1:2] * qy + c[:, 2:3]
        w1 = c[:, 3:4] * qx + c[:, 4:5] * qy + c[:, 5:6]
        cov = (w0 >= 0) & (w1 >= 0) & (w0 + w1 <= 1.0) & live[:, None]
        z = c[:, 6:7] * qx + c[:, 7:8] * qy + c[:, 8:9]
        zm = jnp.where(cov, z, jnp.inf)

        # id-valued tie rule (the oracle's / Pallas kernel's): min depth,
        # then the LOWEST ORIGINAL id among exact-depth matches; k is that
        # winner's candidate row (for the w0/w1 gather). Pad rows carry
        # id -1 but zm = inf, so they only "win" uncovered pixels.
        zwin = jnp.min(zm, axis=0)                            # (P,)
        tie = zm == zwin[None, :]
        big = jnp.int32(2 ** 30)
        idw = jnp.min(jnp.where(tie, ids[:, None], big), axis=0)
        k = jnp.argmin(jnp.where(tie & (ids[:, None] == idw[None, :]),
                                 jnp.int32(0), big), axis=0)
        p_idx = jnp.arange(px.shape[0])
        hit = jnp.isfinite(zwin)
        tid = jnp.where(hit, idw, -1)
        b0 = jnp.where(hit, w0[k, p_idx], 0.0)
        b1 = jnp.where(hit, w1[k, p_idx], 0.0)
        bary = jnp.stack([b0, b1, jnp.where(hit, 1.0 - b0 - b1, 0.0)], -1)
        zout = jnp.where(hit, zwin, jnp.inf)
        return (tid.reshape(tile_h, width),
                bary.reshape(tile_h, width, 3),
                zout.reshape(tile_h, width))

    tid, bary, zbuf = jax.lax.map(one_band, jnp.arange(n_bands))
    return (tid.reshape(-1, width)[:height],
            bary.reshape(-1, width, 3)[:height],
            zbuf.reshape(-1, width)[:height])


def rasterize_batch(verts_ndc, faces, *, height: int, width: int,
                    tile_h: int = 8, max_tris_per_band: int = 4096,
                    cull_backfaces: bool = False):
    fn = functools.partial(
        rasterize, faces=faces, height=height, width=width, tile_h=tile_h,
        max_tris_per_band=max_tris_per_band, cull_backfaces=cull_backfaces)
    return jax.vmap(lambda v: fn(v))(verts_ndc)


def binning_stats(verts_ndc, faces, *, height: int, width: int,
                  tile_h: int = 8, cull_backfaces: bool = False):
    """Max/mean candidates per band — for choosing max_tris_per_band."""
    setup = bin_triangles(verts_ndc, faces, height, width, tile_h,
                          cull_backfaces)
    n = setup.band_hi - setup.band_lo
    return {"max_per_band": int(jnp.max(n)), "mean_per_band": float(
        jnp.mean(n.astype(jnp.float32))), "bands": int(n.shape[0])}
