"""Band-binned rasterizer vs oracle/brute-force (SURVEY.md §5.3).

Knife-edge pixels (exactly on a shared edge, or where f32 rounding between
the affine-precomputed and direct edge forms flips a ~0 value) may
legitimately differ; parity asserts exact match away from those and a tiny
mismatch budget overall.
"""

import numpy as np
import jax.numpy as jnp

from facerecon_tpu import oracle
from facerecon_tpu.ops import geometry as G
from facerecon_tpu.ops import rasterize_tiled
from facerecon_tpu.utils.coeffs import split_coeff

from conftest import make_coeff


def _mismatch_report(tid_a, tid_b, z_a, z_b):
    diff = tid_a != tid_b
    frac = float(diff.mean())
    # where ids differ, depths should still be ~equal (tie or knife-edge)
    za = np.where(np.isfinite(z_a), z_a, 0.0)
    zb = np.where(np.isfinite(z_b), z_b, 0.0)
    zdiff = np.abs(za - zb)[diff]
    return frac, (float(zdiff.max()) if zdiff.size else 0.0)


def test_tiled_matches_oracle_on_face_mesh(cfg, assets, rng):
    bfm = G.device_bfm(assets)
    for trial in range(3):
        coeff = make_coeff(cfg, rng, batch=1)
        c = split_coeff(jnp.asarray(coeff), cfg)
        geom = G.coeffs_to_geometry(c, bfm, cfg)
        vndc = np.asarray(geom.verts_ndc)[0]
        h = w = cfg.image_size
        tid_o, bary_o, z_o = oracle.rasterize(vndc, assets.faces, h, w)
        tid_t, bary_t, z_t = rasterize_tiled.rasterize(
            jnp.asarray(vndc), bfm.faces, height=h, width=w,
            max_tris_per_band=1024)
        tid_t, bary_t, z_t = map(np.asarray, (tid_t, bary_t, z_t))

        frac, zmax = _mismatch_report(tid_t, tid_o, z_t, z_o)
        assert frac < 2e-3, f"tri_id mismatch fraction {frac}"
        assert zmax < 1e-3, f"mismatched pixels disagree in depth by {zmax}"
        # id-valued tie rule: wherever both paths compute the SAME winning
        # depth (covered pixels, exact f32 equality — includes every true
        # z-tie), the winner id must be identical. Residual id mismatches
        # can only be knife-edge pixels whose depth differs by rounding.
        same_z = (tid_o >= 0) & (tid_t >= 0) & (z_t == z_o)
        np.testing.assert_array_equal(tid_t[same_z], tid_o[same_z])
        agree = tid_t == tid_o
        np.testing.assert_allclose(bary_t[agree], bary_o[agree],
                                   rtol=1e-3, atol=2e-4)
        cov = agree & (tid_o >= 0)
        np.testing.assert_allclose(z_t[cov], z_o[cov], rtol=1e-4, atol=1e-4)


def test_tiled_matches_oracle_on_triangle_soup():
    # local rng: random soups contain duplicate/overlapping triangles whose
    # exact-tie winner differs between the direct and affine edge forms by
    # 1-ulp depth rounding — the depth-consistency bound is the real check.
    h = w = 48
    for trial in range(3):
        local = np.random.default_rng(100 + trial)
        n_verts = 40
        verts = local.uniform(-1.0, 1.0, size=(n_verts, 3)).astype(np.float32)
        verts[:, 2] = local.uniform(5.0, 15.0, size=n_verts)
        faces = local.integers(0, n_verts, size=(60, 3)).astype(np.int32)
        tid_o, _, z_o = oracle.rasterize(verts, faces, h, w)
        tid_t, _, z_t = rasterize_tiled.rasterize(
            jnp.asarray(verts), jnp.asarray(faces), height=h, width=w,
            max_tris_per_band=128)
        tid_t, z_t = np.asarray(tid_t), np.asarray(z_t)
        frac, zmax = _mismatch_report(tid_t, tid_o, z_t, z_o)
        assert frac < 2e-2, f"trial {trial}: mismatch {frac}"
        assert zmax < 1e-3
        # exact-depth pixels (incl. duplicate-triangle exact ties) must now
        # agree on the id — the tie rule keys on the original id
        same_z = (tid_o >= 0) & (tid_t >= 0) & (z_t == z_o)
        np.testing.assert_array_equal(tid_t[same_z], tid_o[same_z])


def test_backface_culling_preserves_visible_surface(cfg, assets, rng):
    """Culling must not change the image for a front-watertight mesh except
    where a backface was the nearest hit (interior-only pixels)."""
    bfm = G.device_bfm(assets)
    coeff = make_coeff(cfg, rng, batch=1)
    c = split_coeff(jnp.asarray(coeff), cfg)
    geom = G.coeffs_to_geometry(c, bfm, cfg)
    vndc = geom.verts_ndc[0]
    h = w = cfg.image_size
    tid_n, _, z_n = rasterize_tiled.rasterize(
        vndc, bfm.faces, height=h, width=w, max_tris_per_band=1024,
        cull_backfaces=False)
    tid_c, _, z_c = rasterize_tiled.rasterize(
        vndc, bfm.faces, height=h, width=w, max_tris_per_band=1024,
        cull_backfaces=True)
    tid_n, tid_c = np.asarray(tid_n), np.asarray(tid_c)
    z_n, z_c = np.asarray(z_n), np.asarray(z_c)
    both = (tid_n >= 0) & (tid_c >= 0)
    # where both cover, the culled depth can only be >= (front-most kept)
    assert (z_c[both] >= z_n[both] - 1e-5).all()
    # on this front-facing half-shell, nearly all covered pixels keep depth
    same = np.isclose(z_c[both], z_n[both], atol=1e-4).mean()
    assert same > 0.95


def test_band_overflow_drops_gracefully(cfg, assets, rng):
    """With a tiny cap the rasterizer must not crash or emit garbage ids."""
    bfm = G.device_bfm(assets)
    coeff = make_coeff(cfg, rng, batch=1)
    c = split_coeff(jnp.asarray(coeff), cfg)
    geom = G.coeffs_to_geometry(c, bfm, cfg)
    tid, bary, _ = rasterize_tiled.rasterize(
        geom.verts_ndc[0], bfm.faces, height=cfg.image_size,
        width=cfg.image_size, max_tris_per_band=32)
    tid = np.asarray(tid)
    assert tid.min() >= -1 and tid.max() < assets.n_faces


def test_binning_stats_reasonable(cfg, assets, rng):
    bfm = G.device_bfm(assets)
    coeff = make_coeff(cfg, rng, batch=1)
    c = split_coeff(jnp.asarray(coeff), cfg)
    geom = G.coeffs_to_geometry(c, bfm, cfg)
    stats = rasterize_tiled.binning_stats(
        geom.verts_ndc[0], bfm.faces, height=cfg.image_size,
        width=cfg.image_size)
    assert stats["max_per_band"] <= assets.n_faces
    assert stats["max_per_band"] > 0
