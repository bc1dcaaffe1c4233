"""Integration tests (SURVEY.md §5.4): config-1 pipeline, config-4 fit
convergence, training-step loss decrease, checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu.config import tiny_config
from facerecon_tpu.data.synthetic import render_batch, sample_coeffs
from facerecon_tpu.fit import make_fit_fn
from facerecon_tpu.ops.geometry import device_bfm
from facerecon_tpu.pipeline import init_params, make_pipeline, make_reconstruct_fn
from facerecon_tpu.train import init_state, make_optimizer, make_train_step
from facerecon_tpu.utils.bfm import synthetic_bfm


def test_reconstruct_pipeline_shapes(cfg, assets):
    pipe = make_pipeline(cfg, assets, depth=18)
    variables = init_params(pipe, jax.random.PRNGKey(0))
    recon = make_reconstruct_fn(pipe)
    imgs = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    coeff_vec, coeffs, out = recon(variables, pipe.bfm, imgs)
    assert coeff_vec.shape == (2, cfg.n_coeff)
    assert out.image.shape == (2, cfg.image_size, cfg.image_size, 3)
    assert out.geometry.landmarks2d.shape == (2, cfg.n_landmarks, 2)
    # zero-init head -> exactly the mean face (all-zero coefficients)
    np.testing.assert_allclose(np.asarray(coeff_vec), 0.0, atol=1e-6)


def test_fit_converges_to_gt_objective(cfg, assets, rng):
    bfm = device_bfm(assets)
    gt = sample_coeffs(np.random.default_rng(3), cfg, 1)
    target, gt_lmk = render_batch(gt, bfm, cfg)
    fit = make_fit_fn(cfg, steps=300, lr=2e-2)
    res_zero = fit(jnp.zeros((1, cfg.n_coeff)), bfm, jnp.asarray(target),
                   jnp.asarray(gt_lmk))
    res_gt = fit(jnp.asarray(gt), bfm, jnp.asarray(target),
                 jnp.asarray(gt_lmk))
    # fit from scratch reaches (close to) the same objective as gt-init
    assert float(res_zero.losses[-1]) < float(res_zero.losses[0]) * 0.2
    assert float(res_zero.losses[-1]) < float(res_gt.losses[-1]) * 2.0 + 0.05


def test_train_step_decreases_loss(cfg, assets):
    pipe = make_pipeline(cfg, assets, depth=18)
    opt = make_optimizer(cfg, total_steps=50)
    step_fn = make_train_step(pipe, opt)
    state = init_state(pipe, opt)
    rng = np.random.default_rng(0)
    gt = sample_coeffs(rng, cfg, cfg.batch_size)
    images, lmk = render_batch(gt, pipe.bfm, cfg)
    images, lmk = jnp.asarray(images), jnp.asarray(lmk)
    first = None
    for i in range(20):
        state, parts = step_fn(state, pipe.bfm, images, lmk)
        if i == 0:
            first = float(parts["total"])
    assert float(parts["total"]) < first
    assert int(state.step) == 20


def test_checkpoint_roundtrip(tmp_path, cfg, assets):
    from facerecon_tpu.checkpoint import CheckpointManager
    pipe = make_pipeline(cfg, assets, depth=18)
    opt = make_optimizer(cfg, total_steps=10)
    state = init_state(pipe, opt)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    payload = {"variables": jax.device_get(state.variables), "step": 7}
    mgr.save(7, payload)
    mgr.wait()
    restored = mgr.restore(template=payload)
    assert restored["step"] == 7
    orig = jax.tree.leaves(payload["variables"])
    back = jax.tree.leaves(restored["variables"])
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()
