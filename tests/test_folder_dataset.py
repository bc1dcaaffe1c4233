"""Image-folder ingestion (SURVEY.md C18): landmark side-car files,
5-point / 68-point alignment, batching, and train.py --data-dir.

The "photo shoot" is synthesized: rendered faces are warped onto a larger
canvas by a known similarity transform; the dataset must align them back
so the landmarks land on the canonical layout.
"""

import argparse
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from facerecon_tpu import train as train_mod
from facerecon_tpu.data.folder import (FolderDataset, canonical_template68,
                                       five_from_68)
from facerecon_tpu.data.preprocess import warp_affine
from facerecon_tpu.data.synthetic import render_batch, sample_coeffs
from facerecon_tpu.ops.geometry import device_bfm


def _make_photo_folder(tmp_path, cfg, assets, n=4, seed=5):
    """Rendered faces placed on a 2x canvas by random similarity warps."""
    bfm = device_bfm(assets)
    rng = np.random.default_rng(seed)
    coeff = sample_coeffs(rng, cfg, n)
    images, lmk = render_batch(coeff, bfm, cfg)
    size = cfg.image_size
    big = size * 2
    root = tmp_path / "photos"
    os.makedirs(root)
    for i in range(n):
        ang = rng.uniform(-0.3, 0.3)
        sc = rng.uniform(0.8, 1.2)
        tx, ty = rng.uniform(size * 0.3, size * 0.7, 2)
        rot = sc * np.array([[np.cos(ang), -np.sin(ang)],
                             [np.sin(ang), np.cos(ang)]], np.float32)
        m = np.concatenate([rot, [[tx], [ty]]], axis=1).astype(np.float32)
        photo = warp_affine(np.clip(images[i], 0, 1), m, big)
        ones = np.ones((68, 1), np.float32)
        lmk_big = np.concatenate([lmk[i], ones], 1) @ m.T
        Image.fromarray((photo * 255).astype(np.uint8)).save(
            root / f"face_{i:03d}.png")
        np.savetxt(root / f"face_{i:03d}.txt", lmk_big, fmt="%.4f")
    return str(root), images, lmk


def test_folder_68pt_alignment_recovers_canonical(tmp_path, cfg, assets):
    root, images, lmk = _make_photo_folder(tmp_path, cfg, assets)
    ds = FolderDataset(root, cfg, align="68pt", assets=assets)
    assert len(ds) == 4
    tpl = canonical_template68(assets, cfg)
    for i in range(len(ds)):
        img, lmk_out = ds.load(i)
        assert img.shape == (cfg.image_size, cfg.image_size, 3)
        # the aligned landmarks must sit near the asset pack's canonical
        # layout (similarity fit residual only; synthetic faces deform
        # mildly from the mean)
        rmse = float(np.sqrt(((lmk_out - tpl) ** 2).sum(-1).mean()))
        assert rmse < cfg.image_size * 0.12, f"item {i}: rmse {rmse}"


def test_folder_5pt_alignment_and_batching(tmp_path, cfg, assets):
    root, _, _ = _make_photo_folder(tmp_path, cfg, assets)
    ds = FolderDataset(root, cfg, align="5pt")
    img, lmk_out = ds.load(0)
    assert img.shape == (cfg.image_size, cfg.image_size, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    it = ds.batches(batch=2, seed=0, epochs=2)
    batches = list(it)
    assert len(batches) == 4          # 4 items / batch 2 x 2 epochs
    bi, bl, bc = batches[0]
    assert bi.shape == (2, cfg.image_size, cfg.image_size, 3)
    assert bl.shape == (2, 68, 2)
    assert bc is None


def test_five_from_68_layout():
    lmk = np.arange(68 * 2, dtype=np.float32).reshape(68, 2)
    five = five_from_68(lmk)
    assert five.shape == (5, 2)
    np.testing.assert_allclose(five[0], lmk[36:42].mean(0))
    np.testing.assert_allclose(five[2], lmk[30])


def test_train_on_data_dir(tmp_path, cfg, assets):
    # batch 8: divisible by the 8 fake devices of the test mesh
    root, _, _ = _make_photo_folder(tmp_path, cfg, assets, n=8)
    args = argparse.Namespace(
        steps=3, batch=8, bfm=None, ckpt_dir=None, resume=False,
        no_landmarks=False, tensorboard=None, log_every=1, tiny=True,
        seed=0, platform=None, data_dir=root, align="68pt")
    report = train_mod.run(args)
    assert np.isfinite(report["last_loss"])
