"""Net-initialized fitting and trained-checkpoint tracking (SURVEY.md C17
"optionally net-initialized", C19 trained stage-1 + previous-frame warm
start).

No trained weights exist in this environment, so a checkpoint is CRAFTED:
the regressor head's bias is set so the CNN predicts a known coefficient
vector — which tests the full checkpoint -> stage-1 -> refinement plumbing
deterministically.
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu import fit as fit_mod
from facerecon_tpu import track as track_mod
from facerecon_tpu.checkpoint import CheckpointManager
from facerecon_tpu.data.synthetic import render_batch, sample_coeffs
from facerecon_tpu.ops.geometry import device_bfm
from facerecon_tpu.pipeline import init_params, make_pipeline


def _make_ckpt(tmp_path, cfg, assets, predict_coeff, name="ck"):
    """Checkpoint whose CNN head bias = predict_coeff (zero head kernel ->
    the net predicts it for every input)."""
    pipe = make_pipeline(cfg, assets)
    variables = init_params(pipe, jax.random.PRNGKey(0))
    variables = jax.device_get(variables)
    variables["params"]["Dense_0"]["bias"] = np.asarray(
        predict_coeff, np.float32)
    d = str(tmp_path / name)
    mgr = CheckpointManager(d)
    mgr.save(0, {"variables": variables, "opt_state": 0, "step": 0})
    mgr.wait()
    return d


def test_fit_net_init_reaches_loss_in_half_steps(tmp_path, cfg, assets, rng):
    bfm = device_bfm(assets)
    gt = sample_coeffs(np.random.default_rng(11), cfg, 1)
    target, gt_lmk = render_batch(gt, bfm, cfg)
    # imperfect-but-helpful net: predicts gt + noise
    noisy = gt[0] + 0.02 * np.random.default_rng(1).standard_normal(
        gt[0].shape).astype(np.float32)
    ck = _make_ckpt(tmp_path, cfg, assets, noisy)

    coeff0_net = fit_mod.net_initial_coeffs(cfg, assets, target, ck)
    np.testing.assert_allclose(np.asarray(coeff0_net)[0], noisy, atol=1e-5)

    steps = 40
    fit_full = fit_mod.make_fit_fn(cfg, steps=steps)
    fit_half = fit_mod.make_fit_fn(cfg, steps=steps // 2)
    zero0 = jnp.zeros((1, cfg.n_coeff), jnp.float32)
    res_zero_full = fit_full(zero0, bfm, jnp.asarray(target),
                             jnp.asarray(gt_lmk))
    res_zero_half = fit_half(zero0, bfm, jnp.asarray(target),
                             jnp.asarray(gt_lmk))
    res_net = fit_half(coeff0_net, bfm, jnp.asarray(target),
                       jnp.asarray(gt_lmk))
    loss_net_half = float(res_net.losses[-1])
    # net init beats the zero-init start at the same step budget and lands
    # within 10% of the zero-init fit given TWICE the steps
    assert loss_net_half < float(res_zero_half.losses[-1])
    assert loss_net_half <= float(res_zero_full.losses[-1]) * 1.10, (
        f"net-init half-steps loss {loss_net_half} vs zero-init "
        f"full-steps {float(res_zero_full.losses[-1])}")


def _track_args(**kw):
    base = dict(frames=6, refine_steps=40, lr=1e-2, ckpt=None,
                sequential=False, warm_alpha=0.5, bfm=None, tiny=True,
                seed=3, platform=None)
    base.update(kw)
    return argparse.Namespace(**base)


def test_track_trained_ckpt_recovers_geometry(tmp_path, cfg, assets):
    """Trained-checkpoint stage 1 + joint refinement must recover the
    sequence GEOMETRY (per-frame vertex MAE), not merely decrease the
    loss. Identity coefficients are asserted only loosely: with synthetic
    random-orthonormal bases the id and exp spans alias, so the per-frame
    free expression can absorb shared identity error — the recovered shape
    is the identifiable quantity."""
    # replicate track.run's synthetic sequence base for seed=3
    base = sample_coeffs(np.random.default_rng(3), cfg, 1)[0]
    noisy = base + 0.08 * np.random.default_rng(2).standard_normal(
        base.shape).astype(np.float32)
    ck = _make_ckpt(tmp_path, cfg, assets, noisy, name="ck_track")

    report = track_mod.run(_track_args(ckpt=ck, refine_steps=100))

    # stage-1 geometry error: the CNN predicts the same noisy coeff for
    # every frame (constant head bias)
    import jax.numpy as jnp
    from facerecon_tpu.ops.geometry import coeffs_to_geometry, device_bfm
    from facerecon_tpu.utils.coeffs import split_coeff
    bfm = device_bfm(assets)
    # rebuild the gt sequence exactly as track.run(seed=3, frames=6) does
    rng3 = np.random.default_rng(3)
    b2 = sample_coeffs(rng3, cfg, 1)[0]
    t_ax = np.linspace(0, 2 * np.pi, 6, dtype=np.float32)
    seq = np.tile(b2, (6, 1))
    sp = cfg.coeff_split
    seq[:, sp[0]:sp[1]] += (0.15 * np.sin(t_ax)[:, None]
                            * rng3.standard_normal((1, cfg.n_exp))
                            .astype(np.float32))
    seq[:, sp[2]] += 0.2 * np.sin(t_ax)
    gt_geom = coeffs_to_geometry(split_coeff(jnp.asarray(seq), cfg), bfm,
                                 cfg)
    s1 = np.tile(noisy, (6, 1))
    s1_geom = coeffs_to_geometry(split_coeff(jnp.asarray(s1), cfg), bfm,
                                 cfg)
    stage1_vmae = float(jnp.abs(s1_geom.verts_world
                                - gt_geom.verts_world).mean())

    assert report["vertex_mae"] < stage1_vmae * 0.5, (
        f"tracked vertex MAE {report['vertex_mae']} vs stage-1 "
        f"{stage1_vmae}")
    assert report["landmark_rmse_px"] < 1.0
    assert report["psnr_db"] > 24.0
    assert report["loss_last"] < report["loss_first"]


def test_track_sequential_warm_start(tmp_path, cfg, assets):
    """Online mode: per-frame fit warm-started from the previous frame.
    The crafted CNN predicts the sequence's BASE coefficients (no per-frame
    pose/expression), so the per-frame refinement must recover the sweep."""
    base = sample_coeffs(np.random.default_rng(3), cfg, 1)[0]
    ck = _make_ckpt(tmp_path, cfg, assets, base, name="ck_seq")
    report = track_mod.run(_track_args(ckpt=ck, sequential=True,
                                       refine_steps=40))
    assert np.isfinite(report["loss_last"])
    assert report["psnr_db"] > 22.0
    assert report["landmark_rmse_px"] < 1.0
    assert report["vertex_mae"] < 0.04
