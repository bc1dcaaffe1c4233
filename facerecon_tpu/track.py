"""Video-sequence face tracking driver — SURVEY.md §3 C19, workload config 5.

Two stages, both sharded over the frame axis of a device mesh:
  1. per-frame CNN regression (optionally temporally smoothed);
  2. joint refinement: identity + texture coefficients are SHARED across the
     sequence and solved jointly, per-frame pose/expression/illumination stay
     free. The shared-coefficient gradient is a mean over the sharded frame
     axis — the one place cross-chip communication appears (an XLA psum over
     ICI, inserted automatically by jit; SURVEY.md §4.5).

Usage:
  python -m facerecon_tpu.track --frames 16 --tiny --refine-steps 50
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from facerecon_tpu.config import FaceReconConfig, default_config, tiny_config
from facerecon_tpu.data.synthetic import render_batch, sample_coeffs
from facerecon_tpu.ops.geometry import DeviceBFM
from facerecon_tpu.ops.losses import total_loss
from facerecon_tpu.ops.render import render_coeffs
from facerecon_tpu.parallel import mesh as pmesh
from facerecon_tpu.pipeline import make_pipeline
from facerecon_tpu.utils.bfm import load_npz, synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff
from facerecon_tpu.utils.metrics import landmark_rmse, psnr


class TrackParams(NamedTuple):
    """Joint-solve parameterization: shared appearance, free per-frame rest."""
    shared_id: jnp.ndarray    # (K_id,)
    shared_tex: jnp.ndarray   # (K_tex,)
    per_frame: jnp.ndarray    # (T, K_exp + 3 + 27 + 3)


def _assemble(tp: TrackParams, cfg: FaceReconConfig) -> jnp.ndarray:
    """TrackParams -> full (T, n_coeff) coefficient matrix."""
    t = tp.per_frame.shape[0]
    n_exp = cfg.n_exp
    exp = tp.per_frame[:, :n_exp]
    rest = tp.per_frame[:, n_exp:]
    return jnp.concatenate([
        jnp.broadcast_to(tp.shared_id, (t, cfg.n_id)),
        exp,
        jnp.broadcast_to(tp.shared_tex, (t, cfg.n_tex)),
        rest,
    ], axis=-1)


def _decompose(coeff: jnp.ndarray, cfg: FaceReconConfig) -> TrackParams:
    s = cfg.coeff_split
    return TrackParams(
        shared_id=jnp.mean(coeff[:, :s[0]], axis=0),
        shared_tex=jnp.mean(coeff[:, s[1]:s[2]], axis=0),
        per_frame=jnp.concatenate([coeff[:, s[0]:s[1]], coeff[:, s[2]:]],
                                  axis=-1),
    )


def make_refine_fn(cfg: FaceReconConfig, steps: int, lr: float = 5e-3):
    """Jitted joint refinement over a frame sequence (frames shardable)."""
    opt = optax.adam(lr)

    def loss_fn(tp: TrackParams, bfm, frames, lmk):
        coeffs = split_coeff(_assemble(tp, cfg), cfg)
        out = render_coeffs(coeffs, bfm, cfg, background=frames)
        total, _ = total_loss(out, coeffs, frames, lmk, bfm, cfg)
        return total

    @jax.jit
    def refine(tp0: TrackParams, bfm: DeviceBFM, frames, lmk):
        def step(carry, _):
            tp, opt_state = carry
            loss, grad = jax.value_and_grad(loss_fn)(tp, bfm, frames, lmk)
            updates, opt_state = opt.update(grad, opt_state, tp)
            return (optax.apply_updates(tp, updates), opt_state), loss

        (tp, _), losses = jax.lax.scan(
            step, (tp0, opt.init(tp0)), None, length=steps)
        return tp, losses

    return refine


def make_sequential_fn(cfg: FaceReconConfig, steps: int, lr: float = 5e-3,
                       warm: float = 0.5):
    """Online per-frame tracking (SURVEY.md §4.5 "warm-start from prev"):
    each frame's coefficients are refined by `steps` gradient steps,
    initialized from a blend of the CNN's prediction and the PREVIOUS
    frame's refined result — the classic streaming-tracking loop, compiled
    as one XLA program (scan over frames, scan over steps)."""
    opt = optax.adam(lr)

    def frame_loss(coeff_vec, bfm, frame, lmk):
        coeffs = split_coeff(coeff_vec[None], cfg)
        out = render_coeffs(coeffs, bfm, cfg, background=frame[None])
        total, _ = total_loss(out, coeffs, frame[None], lmk[None], bfm, cfg)
        return total

    @jax.jit
    def track(cnn_coeffs, bfm: DeviceBFM, frames, lmks):
        def per_frame(carry, xs):
            prev, is_first = carry
            cnn_c, frame, lmk = xs
            init = jnp.where(is_first, cnn_c,
                             warm * cnn_c + (1.0 - warm) * prev)

            def step(c, _):
                coeff, opt_state = c
                loss, grad = jax.value_and_grad(frame_loss)(
                    coeff, bfm, frame, lmk)
                updates, opt_state = opt.update(grad, opt_state, coeff)
                return (optax.apply_updates(coeff, updates), opt_state), loss

            (coeff, _), losses = jax.lax.scan(
                step, (init, opt.init(init)), None, length=steps)
            return (coeff, jnp.zeros((), bool)), (coeff, losses)

        (_, _), (coeffs, losses) = jax.lax.scan(
            per_frame, (cnn_coeffs[0], jnp.ones((), bool)),
            (cnn_coeffs, frames, lmks))
        return coeffs, losses

    return track


def smooth_coeffs(coeff: np.ndarray, cfg: FaceReconConfig,
                  alpha: float = 0.6) -> np.ndarray:
    """EMA temporal smoothing of pose/expression across frames."""
    out = coeff.copy()
    s = cfg.coeff_split
    for t in range(1, coeff.shape[0]):
        out[t, s[2]:] = alpha * out[t, s[2]:] + (1 - alpha) * out[t - 1, s[2]:]
    return out


def run(args) -> dict:
    cfg = tiny_config() if args.tiny else default_config()
    assets = load_npz(args.bfm) if args.bfm else synthetic_bfm(cfg, seed=0)
    pipe = make_pipeline(cfg, assets)
    bfm = pipe.bfm
    rng = np.random.default_rng(args.seed)

    if getattr(args, "video", None):
        # raw footage: decode + align in one step (SURVEY.md §2 L6 "video
        # frame extraction for tracking"); landmarks come as ONE (T,68,2)
        # side file for the clip
        from facerecon_tpu.data.video import load_video
        frames, gt_lmk = load_video(
            args.video, cfg, landmarks=getattr(args, "video_landmarks",
                                               None),
            align=getattr(args, "align", "68pt"), assets=assets,
            max_frames=getattr(args, "max_frames", None),
            stride=getattr(args, "stride", 1))
        if not np.isfinite(gt_lmk).all():
            raise ValueError("tracking needs a --video-landmarks track "
                             "(the refinement objective uses the landmark "
                             "loss)")
        args.frames = frames.shape[0]
        seq = base = None
    elif getattr(args, "frames_dir", None):
        # real-input workflow (SURVEY.md §2 L6 "video frame extraction for
        # tracking"): an ordered folder of extracted frames with 68-landmark
        # side-cars, aligned on the host like the training pipeline
        from facerecon_tpu.data.folder import FolderDataset
        ds = FolderDataset(args.frames_dir, cfg,
                           align=getattr(args, "align", "68pt"),
                           assets=assets)
        frames, gt_lmk = ds.load_all()
        if not np.isfinite(gt_lmk).all():
            raise ValueError("tracking needs landmark side-car files for "
                             "every frame (the refinement objective uses "
                             "the landmark loss)")
        args.frames = frames.shape[0]
        seq = base = None        # no generating coefficients for real video
    else:
        # synthetic sequence: one identity/texture, smooth-varying pose+exp
        base = sample_coeffs(rng, cfg, 1)[0]
        t_ax = np.linspace(0, 2 * np.pi, args.frames, dtype=np.float32)
        seq = np.tile(base, (args.frames, 1))
        s = cfg.coeff_split
        seq[:, s[0]:s[1]] += (0.15 * np.sin(t_ax)[:, None]
                              * rng.standard_normal(
                                  (1, cfg.n_exp)).astype(np.float32))
        seq[:, s[2]] += 0.2 * np.sin(t_ax)          # yaw sweep
        frames, gt_lmk = render_batch(seq, bfm, cfg)

    # stage 1: per-frame CNN regression — trained checkpoint when given
    # (--ckpt), otherwise fresh init (zero head -> mean face)
    from facerecon_tpu.checkpoint import restore_or_init
    variables = restore_or_init(pipe, getattr(args, 'ckpt', None), args.seed)
    coeff0 = np.asarray(pipe.model.apply(variables, jnp.asarray(frames),
                                         train=False))
    coeff0 = smooth_coeffs(coeff0, cfg)

    if getattr(args, 'sequential', False):
        # online mode: per-frame fit warm-started from the previous frame
        track_fn = make_sequential_fn(cfg, steps=args.refine_steps,
                                      lr=args.lr, warm=getattr(args, 'warm_alpha', 0.5))
        t0 = time.time()
        coeff_fit, seq_losses = track_fn(
            jnp.asarray(coeff0), bfm, jnp.asarray(frames),
            jnp.asarray(gt_lmk))
        jax.block_until_ready(coeff_fit)
        elapsed = time.time() - t0
        coeff_fit = np.asarray(coeff_fit)
        losses = np.asarray(seq_losses)[:, -1]   # final loss per frame
        tp = _decompose(jnp.asarray(coeff_fit), cfg)
        n_dev = 1
    else:
        # stage 2: joint refinement, frames sharded over the mesh
        mesh = pmesh.make_mesh()
        n_dev = len(mesh.devices.reshape(-1))
        frames_j, lmk_j = jnp.asarray(frames), jnp.asarray(gt_lmk)
        tp0 = _decompose(jnp.asarray(coeff0), cfg)
        if n_dev > 1 and args.frames % n_dev == 0:
            frames_j, lmk_j = pmesh.shard_batch(mesh, (frames_j, lmk_j))
            tp0 = TrackParams(
                shared_id=pmesh.replicate(mesh, tp0.shared_id),
                shared_tex=pmesh.replicate(mesh, tp0.shared_tex),
                per_frame=pmesh.shard_batch(mesh, tp0.per_frame))

        refine = make_refine_fn(cfg, steps=args.refine_steps, lr=args.lr)
        t0 = time.time()
        tp, losses = refine(tp0, bfm, frames_j, lmk_j)
        jax.block_until_ready(tp.shared_id)
        elapsed = time.time() - t0
        coeff_fit = np.asarray(_assemble(tp, cfg))
    tracked, _ = render_batch(coeff_fit, bfm, cfg)
    out = render_coeffs(split_coeff(jnp.asarray(coeff_fit), cfg), bfm, cfg)
    report = {
        "frames": args.frames, "devices": n_dev,
        "refine_s": elapsed,
        "loss_first": float(losses[0]), "loss_last": float(losses[-1]),
        "psnr_db": psnr(tracked, frames),
        "landmark_rmse_px": landmark_rmse(
            np.asarray(out.geometry.landmarks2d), gt_lmk),
    }
    if seq is not None:
        # per-frame geometry recovery vs the generating sequence (synthetic
        # source only — real video has no ground-truth coefficients). NB:
        # with synthetic random-orthonormal bases, identity COEFFICIENTS are
        # not identifiable (the id and exp spans alias, and per-frame exp
        # can absorb any shared deformation) — the recovered SHAPE is the
        # meaningful metric; id_err is reported for information only.
        from facerecon_tpu.ops.geometry import coeffs_to_geometry
        gt_geom = coeffs_to_geometry(split_coeff(jnp.asarray(seq), cfg),
                                     bfm, cfg)
        report["vertex_mae"] = float(jnp.abs(
            out.geometry.verts_world - gt_geom.verts_world).mean())
        report["id_err"] = float(np.abs(np.asarray(tp.shared_id)
                                        - base[:cfg.n_id]).mean())
    if getattr(args, "out", None):
        os.makedirs(args.out, exist_ok=True)
        np.save(os.path.join(args.out, "tracked_coeffs.npy"), coeff_fit)
        np.save(os.path.join(args.out, "tracked_landmarks.npy"),
                np.asarray(out.geometry.landmarks2d))
    print(json.dumps(report))
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--frames-dir", default=None,
                   help="ordered folder of video frames (+68-landmark "
                        "side-cars) to track; omit for the synthetic "
                        "sequence")
    p.add_argument("--video", default=None,
                   help="video file to decode and track (cv2-readable); "
                        "pair with --video-landmarks")
    p.add_argument("--video-landmarks", default=None,
                   help="(T,68,2) .npy or flat-text landmark track for "
                        "--video")
    p.add_argument("--max-frames", type=int, default=None,
                   help="--video: cap decoded frame count")
    p.add_argument("--stride", type=int, default=1,
                   help="--video: keep every k-th frame")
    p.add_argument("--align", default="68pt",
                   choices=("5pt", "68pt", "none"),
                   help="alignment mode for --frames-dir")
    p.add_argument("--out", default=None,
                   help="directory for tracked coefficient/landmark dumps")
    p.add_argument("--refine-steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--ckpt", default=None,
                   help="trained CNN checkpoint for stage-1 regression")
    p.add_argument("--sequential", action="store_true",
                   help="online per-frame fit warm-started from the "
                        "previous frame (instead of the joint solve)")
    p.add_argument("--warm-alpha", type=float, default=0.5,
                   help="sequential mode: CNN vs previous-frame blend")
    p.add_argument("--bfm", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    run(args)


if __name__ == "__main__":
    main()
