"""Real-input fit and track workflows (SURVEY.md §3 C17/C19, §2 L6): render
synthetic faces, write them to disk as PNG + 68-landmark side-car files,
then run BOTH drivers purely from those files — the full photo-in -> mesh-out
/ frames-in -> trajectory-out path with no synthetic shortcut — and assert
recovery thresholds, not just loss decrease.
"""

import argparse
import os

import numpy as np

from facerecon_tpu import fit as fit_mod
from facerecon_tpu import track as track_mod
from facerecon_tpu.data.synthetic import render_batch, sample_coeffs
from facerecon_tpu.ops.geometry import device_bfm


def _write_dataset(dirpath, images, lmks):
    """images (N,S,S,3) float [0,1], lmks (N,68,2) -> PNG + txt side-cars."""
    from PIL import Image
    os.makedirs(dirpath, exist_ok=True)
    for i in range(images.shape[0]):
        arr = (np.clip(images[i], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(dirpath, f"img_{i:03d}.png"))
        np.savetxt(os.path.join(dirpath, f"img_{i:03d}.txt"), lmks[i],
                   fmt="%.4f")


def test_fit_from_disk_recovers(tmp_path, cfg, assets):
    bfm = device_bfm(assets)
    gt = sample_coeffs(np.random.default_rng(21), cfg, 2)
    images, lmk = render_batch(gt, bfm, cfg)
    data_dir = str(tmp_path / "photos")
    _write_dataset(data_dir, np.asarray(images), np.asarray(lmk))

    out_dir = str(tmp_path / "fit_out")
    rep = fit_mod.run(argparse.Namespace(
        steps=120, batch=None, images=data_dir, align="68pt",
        landmarks=True, lr=2e-2, ckpt=None, out=out_dir, tiny=True, seed=0))

    assert rep["batch"] == 2
    assert rep["loss_last"] < rep["loss_first"] * 0.5
    # recovery thresholds vs the on-disk detections/pixels (the targets the
    # driver actually saw — PNG quantization + alignment warp included)
    assert rep["landmark_rmse_px"] < 1.5
    assert rep["psnr_vs_target_db"] > 19.0
    # photo in -> mesh out: per-image .obj exports exist and parse
    from facerecon_tpu.utils.obj_io import load_obj
    for name in ("img_000", "img_001"):
        verts, colors, faces = load_obj(
            os.path.join(out_dir, f"{name}_fit.obj"))
        assert verts.shape[1] == 3 and faces.shape == assets.faces.shape


def test_track_from_disk_recovers(tmp_path, cfg, assets):
    bfm = device_bfm(assets)
    rng = np.random.default_rng(5)
    base = sample_coeffs(rng, cfg, 1)[0]
    frames_n = 4
    t_ax = np.linspace(0, 2 * np.pi, frames_n, dtype=np.float32)
    seq = np.tile(base, (frames_n, 1))
    sp = cfg.coeff_split
    seq[:, sp[2]] += 0.15 * np.sin(t_ax)           # yaw sweep
    frames, lmk = render_batch(seq, bfm, cfg)
    frames_dir = str(tmp_path / "frames")
    _write_dataset(frames_dir, np.asarray(frames), np.asarray(lmk))

    out_dir = str(tmp_path / "track_out")
    rep = track_mod.run(argparse.Namespace(
        frames=0, frames_dir=frames_dir, align="68pt", out=out_dir,
        refine_steps=80, lr=1e-2, ckpt=None, sequential=False,
        warm_alpha=0.5, bfm=None, tiny=True, seed=0, platform=None))

    assert rep["frames"] == frames_n
    assert rep["loss_last"] < rep["loss_first"] * 0.5
    assert rep["landmark_rmse_px"] < 1.5
    assert rep["psnr_db"] > 19.0
    coeffs = np.load(os.path.join(out_dir, "tracked_coeffs.npy"))
    assert coeffs.shape == (frames_n, cfg.n_coeff)
    assert np.isfinite(coeffs).all()


def test_track_from_video_file(tmp_path, cfg, assets):
    """--video path (SURVEY.md §2 L6 video frame extraction): encode a
    synthetic clip with cv2, track straight from the file + one (T,68,2)
    landmark side file, and assert recovery within codec tolerance."""
    import pytest
    cv2 = pytest.importorskip("cv2")
    bfm = device_bfm(assets)
    rng = np.random.default_rng(9)
    base = sample_coeffs(rng, cfg, 1)[0]
    frames_n = 4
    t_ax = np.linspace(0, 2 * np.pi, frames_n, dtype=np.float32)
    seq = np.tile(base, (frames_n, 1))
    sp = cfg.coeff_split
    seq[:, sp[2]] += 0.15 * np.sin(t_ax)
    frames, lmk = render_batch(seq, bfm, cfg)
    frames = np.asarray(frames)

    path = str(tmp_path / "clip.avi")
    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (w, h))
    assert vw.isOpened(), "cv2 MJPG writer unavailable"
    for i in range(frames_n):
        bgr = (np.clip(frames[i], 0, 1) * 255).astype(np.uint8)[..., ::-1]
        vw.write(bgr)
    vw.release()
    lmk_path = str(tmp_path / "clip_lmk.npy")
    np.save(lmk_path, np.asarray(lmk))

    from facerecon_tpu.data.video import load_video
    dec, dec_lmk = load_video(path, cfg, landmarks=lmk_path, align="none")
    assert dec.shape == (frames_n, cfg.image_size, cfg.image_size, 3)
    # MJPG is lossy but mild: decoded frames stay close to the source
    assert np.abs(dec - frames).mean() < 0.03
    np.testing.assert_allclose(dec_lmk, np.asarray(lmk), atol=1e-3)

    out_dir = str(tmp_path / "video_track_out")
    rep = track_mod.run(argparse.Namespace(
        frames=0, frames_dir=None, video=path, video_landmarks=lmk_path,
        max_frames=None, stride=1, align="none", out=out_dir,
        refine_steps=80, lr=1e-2, ckpt=None, sequential=False,
        warm_alpha=0.5, bfm=None, tiny=True, seed=0, platform=None))
    assert rep["frames"] == frames_n
    assert rep["loss_last"] < rep["loss_first"] * 0.5
    assert rep["landmark_rmse_px"] < 2.0       # codec noise allowance
    coeffs = np.load(os.path.join(out_dir, "tracked_coeffs.npy"))
    assert coeffs.shape == (frames_n, cfg.n_coeff)
    assert np.isfinite(coeffs).all()
