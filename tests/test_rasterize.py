"""Rasterizer tests (SURVEY.md §5.3): jnp backend vs numpy oracle,
barycentric invariants, determinism, and gradient flow via the
differentiable-bary recomputation of ops/render.py."""

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu import oracle
from facerecon_tpu.ops import geometry as G
from facerecon_tpu.ops import rasterize_jnp
from facerecon_tpu.ops.render import barycentric_from_id, interpolate
from facerecon_tpu.utils.coeffs import split_coeff

from conftest import make_coeff


def _random_triangle_soup(rng, n_tris=60, n_verts=40):
    verts = rng.uniform(-1.0, 1.0, size=(n_verts, 3)).astype(np.float32)
    verts[:, 2] = rng.uniform(5.0, 15.0, size=n_verts)  # depth z' > 0
    faces = rng.integers(0, n_verts, size=(n_tris, 3)).astype(np.int32)
    return verts, faces


def test_jnp_matches_oracle_on_triangle_soup():
    # local rng for determinism; random soups contain duplicate triangles
    # whose exact-depth ties can flip on 1-ulp XLA-vs-numpy differences, so
    # allow a tiny mismatch budget guarded by depth consistency
    h = w = 48
    for trial in range(3):
        local = np.random.default_rng(300 + trial)
        verts, faces = _random_triangle_soup(local)
        tid_o, bary_o, z_o = oracle.rasterize(verts, faces, h, w)
        tid_j, bary_j, z_j = rasterize_jnp.rasterize(
            jnp.asarray(verts), jnp.asarray(faces), height=h, width=w,
            chunk=16)
        tid_j, bary_j, z_j = map(np.asarray, (tid_j, bary_j, z_j))
        diff = tid_j != tid_o
        assert diff.mean() < 1e-2, f"trial {trial}: {diff.mean()}"
        zo = np.where(np.isfinite(z_o), z_o, 0.0)
        zj = np.where(np.isfinite(z_j), z_j, 0.0)
        if diff.any():
            assert np.abs(zo - zj)[diff].max() < 1e-4
        agree = ~diff
        np.testing.assert_allclose(bary_j[agree], bary_o[agree],
                                   rtol=1e-4, atol=1e-5)
        cov = agree & (tid_o >= 0)
        np.testing.assert_allclose(z_j[cov], z_o[cov], rtol=1e-5, atol=1e-5)


def test_jnp_matches_oracle_on_face_mesh(cfg, assets, rng):
    coeff = make_coeff(cfg, rng, batch=1)
    bfm = G.device_bfm(assets)
    c = split_coeff(jnp.asarray(coeff), cfg)
    geom = G.coeffs_to_geometry(c, bfm, cfg)
    vndc = np.asarray(geom.verts_ndc)[0]
    h = w = cfg.image_size
    tid_o, bary_o, _ = oracle.rasterize(vndc, assets.faces, h, w)
    tid_j, bary_j, _ = rasterize_jnp.rasterize(
        jnp.asarray(vndc), bfm.faces, height=h, width=w, chunk=128)
    assert (tid_o >= 0).sum() > 100  # face actually covers pixels
    np.testing.assert_array_equal(np.asarray(tid_j), tid_o)
    np.testing.assert_allclose(np.asarray(bary_j), bary_o,
                               rtol=1e-4, atol=1e-5)


def test_barycentric_invariants(cfg, assets, rng):
    coeff = make_coeff(cfg, rng, batch=1)
    bfm = G.device_bfm(assets)
    c = split_coeff(jnp.asarray(coeff), cfg)
    geom = G.coeffs_to_geometry(c, bfm, cfg)
    h = w = cfg.image_size
    tid, bary, _ = rasterize_jnp.rasterize_batch(
        geom.verts_ndc, bfm.faces, height=h, width=w, chunk=128)
    tid, bary = np.asarray(tid)[0], np.asarray(bary)[0]
    cov = tid >= 0
    np.testing.assert_allclose(bary[cov].sum(-1), 1.0, atol=1e-4)
    assert (bary[cov] >= -1e-4).all()


def test_recomputed_bary_matches_forward(cfg, assets, rng):
    coeff = make_coeff(cfg, rng, batch=2)
    bfm = G.device_bfm(assets)
    c = split_coeff(jnp.asarray(coeff), cfg)
    geom = G.coeffs_to_geometry(c, bfm, cfg)
    h = w = cfg.image_size
    tid, bary_fwd, _ = rasterize_jnp.rasterize_batch(
        geom.verts_ndc, bfm.faces, height=h, width=w, chunk=128)
    bary_re = barycentric_from_id(tid, geom.verts_ndc, bfm.faces, h, w)
    np.testing.assert_allclose(np.asarray(bary_re), np.asarray(bary_fwd),
                               rtol=1e-4, atol=1e-5)


def test_interpolate_matches_oracle(cfg, assets, rng):
    coeff = make_coeff(cfg, rng, batch=1)
    bfm = G.device_bfm(assets)
    c = split_coeff(jnp.asarray(coeff), cfg)
    geom = G.coeffs_to_geometry(c, bfm, cfg)
    h = w = cfg.image_size
    tid, bary, _ = rasterize_jnp.rasterize_batch(
        geom.verts_ndc, bfm.faces, height=h, width=w, chunk=128)
    attrs = jnp.asarray(rng.random((1, assets.n_vertices, 3),),
                        dtype=jnp.float32)
    out = interpolate(tid, bary, bfm.faces, attrs)
    expect = oracle.interpolate(np.asarray(tid)[0], np.asarray(bary)[0],
                                assets.faces, np.asarray(attrs)[0])
    np.testing.assert_allclose(np.asarray(out)[0], expect,
                               rtol=1e-4, atol=1e-5)


def test_gradients_flow_through_vertices_fd_check(cfg, assets, rng):
    """Finite-difference check of dL/dV through the recomputed barycentrics
    (SURVEY.md §9.6): gradients exist inside covered pixels and match FD for
    a perturbation that does not change visibility."""
    coeff = make_coeff(cfg, rng, batch=1)
    bfm = G.device_bfm(assets)
    h = w = cfg.image_size
    target = jnp.asarray(rng.random((1, h, w, 3)), dtype=jnp.float32)
    attrs = jnp.asarray(rng.random((1, assets.n_vertices, 3)),
                        dtype=jnp.float32)

    c0 = split_coeff(jnp.asarray(coeff), cfg)
    geom0 = G.coeffs_to_geometry(c0, bfm, cfg)
    tid, _, _ = rasterize_jnp.rasterize_batch(
        geom0.verts_ndc, bfm.faces, height=h, width=w, chunk=128)
    tid = jax.lax.stop_gradient(tid)

    # FD truncation error is dominated by the 1/area curvature of tiny
    # triangles, so run the check in float64 with a small step.
    with jax.enable_x64(True):
        vndc0 = jnp.asarray(np.asarray(geom0.verts_ndc), dtype=jnp.float64)
        attrs64 = jnp.asarray(np.asarray(attrs), dtype=jnp.float64)
        target64 = jnp.asarray(np.asarray(target), dtype=jnp.float64)
        tid64 = jnp.asarray(np.asarray(tid))

        def loss_fn(vndc):
            bary = barycentric_from_id(tid64, vndc, bfm.faces, h, w)
            img = interpolate(tid64, bary, bfm.faces, attrs64)
            return jnp.sum((img - target64) ** 2)

        g = jax.grad(loss_fn)(vndc0)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

        direction = jnp.asarray(
            rng.standard_normal(vndc0.shape), dtype=jnp.float64)
        direction = direction.at[..., 2].set(0.0)  # depth grad 0 by contract
        eps = 1e-6
        f = lambda t: loss_fn(vndc0 + t * direction)
        fd = (f(eps) - f(-eps)) / (2 * eps)
        analytic = jnp.sum(g * direction)
        np.testing.assert_allclose(float(fd), float(analytic),
                                   rtol=1e-4, atol=1e-6)


def test_depth_gradient_is_zero(cfg, assets, rng):
    coeff = make_coeff(cfg, rng, batch=1)
    bfm = G.device_bfm(assets)
    h = w = cfg.image_size
    c0 = split_coeff(jnp.asarray(coeff), cfg)
    geom0 = G.coeffs_to_geometry(c0, bfm, cfg)
    tid, _, _ = rasterize_jnp.rasterize_batch(
        geom0.verts_ndc, bfm.faces, height=h, width=w, chunk=128)
    attrs = jnp.asarray(rng.random((1, assets.n_vertices, 3)),
                        dtype=jnp.float32)

    def loss_fn(vndc):
        bary = barycentric_from_id(tid, vndc, bfm.faces, h, w)
        return jnp.sum(interpolate(tid, bary, bfm.faces, attrs))

    g = np.asarray(jax.grad(loss_fn)(geom0.verts_ndc))
    np.testing.assert_allclose(g[..., 2], 0.0, atol=1e-8)
