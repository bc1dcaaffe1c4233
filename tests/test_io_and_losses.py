"""OBJ round-trip (SURVEY.md §5.2) and loss-function unit tests."""

import numpy as np
import jax.numpy as jnp

from facerecon_tpu.ops import geometry as G
from facerecon_tpu.ops import losses as L
from facerecon_tpu.ops.render import render_coeffs
from facerecon_tpu.utils.coeffs import split_coeff
from facerecon_tpu.utils.obj_io import save_obj, load_obj
from facerecon_tpu.utils.metrics import psnr, vertex_mae

from conftest import make_coeff


def test_obj_roundtrip(tmp_path, assets):
    verts = assets.mean_shape.reshape(-1, 3)[:100]
    cols = np.linspace(0, 1, 300, dtype=np.float32).reshape(100, 3)
    faces = assets.faces[:50] % 100
    p = str(tmp_path / "mesh.obj")
    save_obj(p, verts, cols, faces)
    v, c, f = load_obj(p)
    np.testing.assert_allclose(v, verts, atol=1e-5)
    np.testing.assert_allclose(c, cols, atol=1e-5)
    np.testing.assert_array_equal(f, faces)


def test_photometric_loss_zero_on_identical():
    img = jnp.ones((2, 8, 8, 3)) * 0.5
    mask = jnp.ones((2, 8, 8))
    assert float(L.photometric_loss(img, img, mask)) < 1e-5


def test_photometric_loss_masked_region_only():
    a = jnp.zeros((1, 4, 4, 3))
    b = jnp.ones((1, 4, 4, 3))
    mask = jnp.zeros((1, 4, 4)).at[0, 0, 0].set(1.0)
    # one masked pixel with error sqrt(3)
    np.testing.assert_allclose(float(L.photometric_loss(a, b, mask)),
                               np.sqrt(3.0), rtol=1e-5)


def test_landmark_loss_zero_and_positive(cfg):
    gt = jnp.ones((2, cfg.n_landmarks, 2)) * 10
    assert float(L.landmark_loss(gt, gt, cfg)) < 1e-8
    assert float(L.landmark_loss(gt + 3.0, gt, cfg)) > 0


def test_regularization_penalizes_large_coeffs(cfg, assets, rng):
    bfm = G.device_bfm(assets)
    small = split_coeff(jnp.asarray(make_coeff(cfg, rng, batch=2) * 0.1), cfg)
    large = split_coeff(jnp.asarray(make_coeff(cfg, rng, batch=2) * 10), cfg)
    assert float(L.regularization_loss(small, bfm, cfg)) < \
        float(L.regularization_loss(large, bfm, cfg))


def test_total_loss_finite_and_composed(cfg, assets, rng):
    bfm = G.device_bfm(assets)
    coeffs = split_coeff(jnp.asarray(make_coeff(cfg, rng, batch=2)), cfg)
    out = render_coeffs(coeffs, bfm, cfg)
    target = jnp.asarray(rng.random((2, cfg.image_size, cfg.image_size, 3)),
                         dtype=jnp.float32)
    gt_lmk = jnp.asarray(rng.random((2, cfg.n_landmarks, 2)) * cfg.image_size,
                         dtype=jnp.float32)
    total, parts = L.total_loss(out, coeffs, target, gt_lmk, bfm, cfg)
    assert np.isfinite(float(total))
    for k in ("photo", "landmark", "reg", "gamma", "total"):
        assert k in parts and np.isfinite(float(parts[k]))


def test_metrics():
    a = np.zeros((4, 4, 3))
    assert psnr(a, a) == float("inf")
    assert abs(psnr(a, a + 0.1) - 20.0) < 1e-6
    assert vertex_mae(a, a + 2.0) == 2.0


def test_texture_variance_loss(cfg, assets):
    """Optional C13 term: zero for flat albedo, positive for varied, and
    wired into total_loss only when its weight is set."""
    import dataclasses
    import jax.numpy as jnp
    from facerecon_tpu.ops import geometry as G
    from facerecon_tpu.ops.losses import texture_variance_loss, total_loss
    from facerecon_tpu.ops.render import render_coeffs
    from facerecon_tpu.utils.coeffs import split_coeff

    bfm = G.device_bfm(assets)
    n = assets.n_vertices
    flat = jnp.full((1, n, 3), 0.5)
    assert float(texture_variance_loss(flat, bfm)) < 1e-10
    varied = flat.at[:, : n // 2].set(0.9)
    assert float(texture_variance_loss(varied, bfm)) > 1e-3

    coeff = jnp.zeros((1, cfg.n_coeff))
    c = split_coeff(coeff, cfg)
    out = render_coeffs(c, bfm, cfg)
    target = jnp.zeros_like(out.image)
    _, parts_off = total_loss(out, c, target, None, bfm, cfg)
    assert "tex_var" not in parts_off
    cfg_on = dataclasses.replace(cfg, w_tex_var=1.0)
    total_on, parts_on = total_loss(out, c, target, None, bfm, cfg_on)
    assert "tex_var" in parts_on and float(parts_on["tex_var"]) >= 0.0
