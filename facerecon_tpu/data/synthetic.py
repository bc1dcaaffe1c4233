"""Synthetic data source — renders ground-truth coefficient draws into
(image, 68-landmark) training pairs with the CPU-side jnp renderer.

Real face datasets are absent in this environment (SURVEY.md §8 "No real
BFM/weights in-env"), so the training/fit/track drivers demonstrate and test
the full self-supervised loop on synthetic faces whose true coefficients are
known — which also enables closed-loop recovery tests (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import jax.numpy as jnp

from facerecon_tpu.config import FaceReconConfig
from facerecon_tpu.ops.geometry import DeviceBFM
from facerecon_tpu.ops.render import render_coeffs
from facerecon_tpu.utils.coeffs import split_coeff


def sample_coeffs(rng: np.random.Generator, cfg: FaceReconConfig,
                  batch: int, scale: float = 0.3) -> np.ndarray:
    c = (rng.standard_normal((batch, cfg.n_coeff)) * scale).astype(np.float32)
    s = cfg.coeff_split
    c[:, s[2]:s[3]] *= 0.3   # mild pose
    c[:, s[4]:] *= 0.1       # small translation
    # gamma: near channel-balanced lighting (shared SH vector + small
    # per-channel jitter) — matches the w_gamma channel-balance prior and
    # keeps radiance in a realistic range.
    shared = rng.standard_normal((batch, 1, 9)) * 0.15
    jitter = rng.standard_normal((batch, 3, 9)) * 0.02
    c[:, s[3]:s[4]] = (shared + jitter).reshape(batch, 27).astype(np.float32)
    return c


def render_batch(coeff: np.ndarray, bfm: DeviceBFM, cfg: FaceReconConfig,
                 render_fn=None) -> Tuple[np.ndarray, np.ndarray]:
    """Render coefficients -> (images (B,S,S,3), landmarks (B,68,2)).

    Images are NOT clipped: a clipped target would put an irreducible floor
    under the photometric loss of any closed-loop recovery experiment.
    Clip only when saving for display.
    """
    c = split_coeff(jnp.asarray(coeff), cfg)
    out = (render_fn or render_coeffs)(c, bfm, cfg)
    return (np.asarray(out.image, dtype=np.float32),
            np.asarray(out.geometry.landmarks2d))


def synthetic_batches(bfm: DeviceBFM, cfg: FaceReconConfig, batch: int,
                      seed: int = 0, scale: float = 0.3, pool: int = 0,
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Endless (images, landmarks68, true_coeffs) batches.

    pool > 0 generates that many batches once and cycles them (shuffled
    per epoch) — generating ground truth renders ON the training device,
    so an endless fresh stream serializes with the train step and caps
    throughput; a pooled dataset is also the realistic epochs workload."""
    rng = np.random.default_rng(seed)
    if pool <= 0:
        while True:
            coeff = sample_coeffs(rng, cfg, batch, scale)
            img, lmk = render_batch(coeff, bfm, cfg)
            yield img, lmk, coeff
    cached = []
    for _ in range(pool):
        coeff = sample_coeffs(rng, cfg, batch, scale)
        img, lmk = render_batch(coeff, bfm, cfg)
        cached.append((img, lmk, coeff))
    while True:
        for i in rng.permutation(pool):
            yield cached[int(i)]
