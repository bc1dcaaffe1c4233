"""Geometry/SH unit tests vs the numpy oracle (SURVEY.md §5.1-5.2)."""

import numpy as np
import jax.numpy as jnp

from facerecon_tpu import oracle
from facerecon_tpu.ops import geometry as G
from facerecon_tpu.ops import sh as sh_ops
from facerecon_tpu.utils.coeffs import split_coeff

from conftest import make_coeff


def test_shape_texture_synthesis_matches_oracle(cfg, assets, rng):
    coeff = make_coeff(cfg, rng, batch=3)
    bfm = G.device_bfm(assets)
    c = split_coeff(jnp.asarray(coeff), cfg)
    shape = G.shape_formation(c.id, c.exp, bfm)
    tex = G.texture_formation(c.tex, bfm)
    for b in range(3):
        a, be, d, *_ = oracle.split_coeff(coeff[b], cfg)
        np.testing.assert_allclose(shape[b], oracle.shape_formation(
            a, be, assets), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(tex[b], oracle.texture_formation(
            d, assets), rtol=1e-5, atol=1e-5)


def test_rotation_matrix_properties_and_oracle(cfg, rng):
    angles = (rng.standard_normal((4, 3)) * 0.5).astype(np.float32)
    r = np.asarray(G.compute_rotation(jnp.asarray(angles)))
    for b in range(4):
        r_np = oracle.compute_rotation(angles[b])
        np.testing.assert_allclose(r[b], r_np, rtol=1e-5, atol=1e-6)
        # orthonormal, det +1
        np.testing.assert_allclose(r[b] @ r[b].T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(r[b]) - 1.0) < 1e-5


def test_projection_matches_oracle_and_known_point(cfg, rng):
    verts = (rng.standard_normal((2, 50, 3)) * 0.5).astype(np.float32)
    pix = np.asarray(G.perspective_projection(jnp.asarray(verts), cfg))
    for b in range(2):
        np.testing.assert_allclose(
            pix[b], oracle.perspective_projection(verts[b], cfg),
            rtol=1e-5, atol=1e-4)
    # origin projects to image center
    origin = jnp.zeros((1, 1, 3))
    np.testing.assert_allclose(
        np.asarray(G.perspective_projection(origin, cfg))[0, 0],
        [cfg.center, cfg.center], atol=1e-5)


def test_ndc_roundtrip_consistent_with_projection(cfg, rng):
    verts = (rng.standard_normal((1, 30, 3)) * 0.5).astype(np.float32)
    ndc = np.asarray(G.to_ndc(jnp.asarray(verts), cfg))[0]
    pix = oracle.perspective_projection(verts[0], cfg)
    half = cfg.image_size / 2.0
    np.testing.assert_allclose(ndc[:, 0], (pix[:, 0] - half) / half,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ndc[:, 1], (half - pix[:, 1]) / half,
                               rtol=1e-5, atol=1e-5)


def test_vertex_normals_match_oracle_and_sphere(cfg, assets, rng):
    coeff = make_coeff(cfg, rng, batch=2)
    bfm = G.device_bfm(assets)
    c = split_coeff(jnp.asarray(coeff), cfg)
    shape = G.shape_formation(c.id, c.exp, bfm)
    n = np.asarray(G.compute_norm(shape, bfm.faces, shape.shape[-2]))
    for b in range(2):
        n_np = oracle.compute_norm(np.asarray(shape[b]), assets.faces)
        np.testing.assert_allclose(n[b], n_np, rtol=1e-4, atol=1e-4)
    # on the (nearly) spherical mean shape, normals point radially outward
    mean = np.asarray(assets.mean_shape).reshape(-1, 3)
    n0 = oracle.compute_norm(mean, assets.faces)
    radial = mean / (np.linalg.norm(mean, axis=-1, keepdims=True) + 1e-9)
    # interior vertices align well (rim vertices are skewed by the boundary)
    cos = np.sum(n0 * radial, axis=-1)
    assert np.median(cos) > 0.9


def test_sh_basis_canonical_normals(cfg):
    # normal = +z: only Y0, Y2 (nz), Y6 (3nz^2-1) are nonzero
    n = jnp.array([[0.0, 0.0, 1.0]])
    y = np.asarray(sh_ops.sh_basis(n))[0]
    expect_zero = [1, 3, 4, 5, 7, 8]
    np.testing.assert_allclose(y[expect_zero], 0.0, atol=1e-7)
    np.testing.assert_allclose(y[0], np.pi / np.sqrt(4 * np.pi), rtol=1e-6)


def test_illumination_matches_oracle(cfg, assets, rng):
    tex = rng.random((2, 40, 3)).astype(np.float32)
    nrm = rng.standard_normal((2, 40, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    gamma = (rng.standard_normal((2, 27)) * 0.2).astype(np.float32)
    out = np.asarray(sh_ops.illuminate(
        jnp.asarray(tex), jnp.asarray(nrm), jnp.asarray(gamma)))
    for b in range(2):
        np.testing.assert_allclose(
            out[b], oracle.illuminate(tex[b], nrm[b], gamma[b]),
            rtol=1e-5, atol=1e-5)


def test_landmark_projection_gathers_correct_vertices(cfg, assets, rng):
    coeff = make_coeff(cfg, rng, batch=1)
    bfm = G.device_bfm(assets)
    c = split_coeff(jnp.asarray(coeff), cfg)
    geom = G.coeffs_to_geometry(c, bfm, cfg)
    lm = np.asarray(geom.landmarks2d)[0]
    verts = np.asarray(geom.verts_world)[0]
    expect = oracle.perspective_projection(
        verts[assets.landmark_index], cfg)
    np.testing.assert_allclose(lm, expect, rtol=1e-5, atol=1e-4)
