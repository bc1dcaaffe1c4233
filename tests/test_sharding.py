"""Distributed tests without a cluster (SURVEY.md §5.5): Mesh/shard_map code
paths on the fake 8-device CPU topology; sharded results must equal
single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facerecon_tpu.config import tiny_config
from facerecon_tpu.data.synthetic import render_batch, sample_coeffs
from facerecon_tpu.ops.geometry import device_bfm
from facerecon_tpu.parallel import mesh as pmesh
from facerecon_tpu.pipeline import make_pipeline
from facerecon_tpu.train import init_state, make_optimizer, make_train_step
from facerecon_tpu.utils.bfm import synthetic_bfm


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 fake devices"
    return pmesh.make_mesh(8)


def test_mesh_has_eight_devices(mesh):
    assert mesh.devices.size == 8


def test_sharded_render_equals_single_device(cfg, assets, mesh):
    """Config-5 contract: batch-sharded rendering == single-device render."""
    bfm = device_bfm(assets)
    coeff = sample_coeffs(np.random.default_rng(0), cfg, 8)
    img_single, lmk_single = render_batch(coeff, bfm, cfg)

    bfm_r = pmesh.replicate(mesh, bfm)
    coeff_s = pmesh.shard_batch(mesh, jnp.asarray(coeff))
    img_shard, lmk_shard = render_batch(np.asarray(coeff_s), bfm_r, cfg)
    np.testing.assert_allclose(img_shard, img_single, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(lmk_shard, lmk_single, rtol=1e-5, atol=1e-4)


def test_sharded_render_512_equals_single(mesh):
    """Config-5 at full 512x512 resolution (BASELINE "batch-256 512x512
    rendering sharded"): frame-sharded rendering == single-device, on the
    tiny mesh so the CPU oracle-scale cost stays bounded."""
    cfg512 = tiny_config(image_size=512, focal=1015.0 * 512 / 224.0,
                         tile_h=1)
    assets = synthetic_bfm(cfg512, seed=0)
    bfm = device_bfm(assets)
    coeff = sample_coeffs(np.random.default_rng(4), cfg512, 8)
    img_single, lmk_single = render_batch(coeff, bfm, cfg512)
    assert img_single.shape == (8, 512, 512, 3)

    bfm_r = pmesh.replicate(mesh, bfm)
    coeff_s = pmesh.shard_batch(mesh, jnp.asarray(coeff))
    img_shard, lmk_shard = render_batch(np.asarray(coeff_s), bfm_r, cfg512)
    np.testing.assert_allclose(img_shard, img_single, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(lmk_shard, lmk_single, rtol=1e-5, atol=1e-4)


def test_sharded_train_step_matches_single_device(cfg, assets, mesh):
    """DP gradient all-reduce (XLA psum) must reproduce the single-device
    update exactly (same batch, deterministic math)."""
    pipe = make_pipeline(cfg, assets, depth=18)
    opt = make_optimizer(cfg, total_steps=10)
    step_fn = make_train_step(pipe, opt)

    rng = np.random.default_rng(1)
    gt = sample_coeffs(rng, cfg, 8)
    images, lmk = render_batch(gt, pipe.bfm, cfg)
    images, lmk = jnp.asarray(images), jnp.asarray(lmk)

    # single device
    s0 = init_state(pipe, opt, seed=0)
    s1, parts1 = step_fn(s0, pipe.bfm, images, lmk)

    # sharded batch, replicated params
    s0r = init_state(pipe, opt, seed=0)
    s0r = type(s0r)(*pmesh.replicate(mesh, tuple(s0r)))
    bfm_r = pmesh.replicate(mesh, pipe.bfm)
    images_s, lmk_s = pmesh.shard_batch(mesh, (images, lmk))
    s2, parts2 = step_fn(s0r, bfm_r, images_s, lmk_s)

    np.testing.assert_allclose(float(parts1["total"]),
                               float(parts2["total"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.variables["params"]),
                    jax.tree.leaves(s2.variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_track_joint_solve_sharded_equals_single(cfg, assets, mesh):
    """The shared-id/tex joint refinement (the one cross-chip collective,
    SURVEY.md §4.5) must give the same result sharded and unsharded."""
    from facerecon_tpu.track import TrackParams, _decompose, make_refine_fn

    bfm = device_bfm(assets)
    rng = np.random.default_rng(2)
    base = sample_coeffs(rng, cfg, 1)[0]
    seq = np.tile(base, (8, 1))
    seq[:, cfg.coeff_split[2]] += np.linspace(-0.1, 0.1, 8)
    frames, lmk = render_batch(seq, bfm, cfg)

    refine = make_refine_fn(cfg, steps=10, lr=1e-2)
    tp0 = _decompose(jnp.asarray(seq) * 0.5, cfg)
    tp_a, losses_a = refine(tp0, bfm, jnp.asarray(frames), jnp.asarray(lmk))

    bfm_r = pmesh.replicate(mesh, bfm)
    frames_s, lmk_s = pmesh.shard_batch(
        mesh, (jnp.asarray(frames), jnp.asarray(lmk)))
    tp0_s = TrackParams(
        shared_id=pmesh.replicate(mesh, tp0.shared_id),
        shared_tex=pmesh.replicate(mesh, tp0.shared_tex),
        per_frame=pmesh.shard_batch(mesh, tp0.per_frame))
    tp_b, losses_b = refine(tp0_s, bfm_r, frames_s, lmk_s)

    np.testing.assert_allclose(np.asarray(losses_a), np.asarray(losses_b),
                               rtol=1e-4, atol=1e-6)
    # f32 reduction order differs across devices; tiny-magnitude coeffs see
    # relatively larger drift after 10 Adam steps
    np.testing.assert_allclose(np.asarray(tp_a.shared_id),
                               np.asarray(tp_b.shared_id),
                               rtol=1e-3, atol=1e-4)
