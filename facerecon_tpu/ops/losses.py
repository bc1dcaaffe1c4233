"""Self-supervised losses — SURVEY.md §3 C11-C13, math per §9.7.

  photometric: skin-masked robust per-pixel L2,1 over the rendered region
  landmark:    weighted MSE of 68 projected vs detected points, size-normalized
  regularize:  Tikhonov on id/exp/tex coeffs weighted by 1/sigma (PCA
               eigenvalue sqrt) + gamma channel-balance term
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from facerecon_tpu.config import FaceReconConfig
from facerecon_tpu.ops.geometry import DeviceBFM
from facerecon_tpu.ops.render import RenderOut
from facerecon_tpu.utils.coeffs import Coeffs


def photometric_loss(rendered: jnp.ndarray, target: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """L_photo = sum_p m_p ||I_p - Ihat_p||_2 / sum_p m_p  (per batch mean).

    rendered/target (B,H,W,3); mask (B,H,W) = rendered coverage (already
    intersected with the skin mask by the caller when available).
    """
    diff = jnp.sqrt(jnp.sum((rendered - target) ** 2, axis=-1) + 1e-12)
    per_image = (jnp.sum(diff * mask, axis=(1, 2))
                 / jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0))
    return jnp.mean(per_image)


def skin_mask_image(out: RenderOut, bfm: DeviceBFM) -> jnp.ndarray:
    """Rasterize the per-vertex skin mask into image space, AND with coverage.

    ONE per-pixel row gather from a static (F, 3) skin-corner table —
    the generic interpolate() (faces[tri_id] then per-corner
    take_along_axis) issues 4 nested per-pixel element gathers and
    measured ~370 ms/128 at 224px, ~70% of the whole training-loss
    forward. Same values summed in the same corner order; the skin
    table is static per asset (gradient flows through bary only, as
    before)."""
    sk = jnp.take(bfm.skin_mask, bfm.faces.reshape(-1),
                  axis=0).reshape(-1, 3)                    # (F,3) static
    b, h, w = out.tri_id.shape
    safe = jnp.maximum(out.tri_id, 0).reshape(b, -1)        # (B,HW)
    px = jnp.take(sk, safe, axis=0)                         # (B,HW,3)
    img = jnp.sum(px * out.bary.reshape(b, -1, 3), axis=-1)
    return out.mask * img.reshape(b, h, w)


def landmark_weights(cfg: FaceReconConfig) -> jnp.ndarray:
    """Up-weight nose + inner mouth (indices per the 68-pt convention)."""
    w = jnp.ones((cfg.n_landmarks,), jnp.float32)
    inner = jnp.array([27, 28, 29, 30, 31, 32, 33, 34, 35,  # nose
                       60, 61, 62, 63, 64, 65, 66, 67],      # inner mouth
                      dtype=jnp.int32)
    return w.at[inner].set(cfg.landmark_weight_inner)


def landmark_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                  cfg: FaceReconConfig) -> jnp.ndarray:
    """(1/68) sum_k w_k ||q_k - qhat_k||^2 / image_size^2, batch mean."""
    w = landmark_weights(cfg)
    sq = jnp.sum((pred - gt) ** 2, axis=-1)          # (B,68)
    per_image = jnp.mean(w[None, :] * sq, axis=-1) / (cfg.image_size ** 2)
    return jnp.mean(per_image)


def regularization_loss(c: Coeffs, bfm: DeviceBFM,
                        cfg: FaceReconConfig) -> jnp.ndarray:
    """Tikhonov on alpha/beta/delta weighted by inverse PCA sigmas."""
    reg = (cfg.w_reg_id * jnp.mean(jnp.sum((c.id / bfm.sigma_id) ** 2, -1))
           + cfg.w_reg_exp * jnp.mean(jnp.sum((c.exp / bfm.sigma_exp) ** 2, -1))
           + cfg.w_reg_tex * jnp.mean(jnp.sum((c.tex / bfm.sigma_tex) ** 2, -1)))
    return cfg.w_reg_scale * reg


def texture_variance_loss(texture: jnp.ndarray,
                          bfm: DeviceBFM) -> jnp.ndarray:
    """Optional flat-albedo prior (SURVEY.md §9.7 "optional
    texture-variance term"): penalize per-channel variance of the
    predicted albedo over the SKIN region, pushing shading variation into
    the SH illumination instead of baked-in texture.

    texture (B,N,3) in [0,1]; skin weights from the asset pack."""
    w = bfm.skin_mask[None, :, None]                       # (1,N,1)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(texture * w, axis=1, keepdims=True) / wsum
    var = jnp.sum(w * (texture - mean) ** 2, axis=1) / wsum  # (B,3)
    return jnp.mean(jnp.sum(var, axis=-1))


def gamma_loss(gamma: jnp.ndarray) -> jnp.ndarray:
    """Channel-balance: penalize per-channel deviation from the cross-channel
    mean of each SH coefficient (SURVEY.md §9.7 L_gamma)."""
    g = gamma.reshape(*gamma.shape[:-1], 3, 9)
    mean = jnp.mean(g, axis=-2, keepdims=True)
    return jnp.mean(jnp.sum((g - mean) ** 2, axis=(-1, -2)))


def total_loss(out: RenderOut, coeffs: Coeffs, target: jnp.ndarray,
               gt_landmarks: Optional[jnp.ndarray], bfm: DeviceBFM,
               cfg: FaceReconConfig,
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted sum per SURVEY.md §9.7. Returns (scalar, per-term dict)."""
    if out.skin is not None:
        # TPU select path: the winner's skin corners rode the 56-row
        # kernel record, so the interpolated skin mask arrives for free
        # (same values, same corner blend; the per-pixel gather below
        # measured ~50 ms/128 at 224px — ~8.4 ns/index on TPU)
        mask = out.mask * out.skin
    else:
        mask = skin_mask_image(out, bfm)
    l_photo = photometric_loss(out.image, target, mask)
    l_reg = regularization_loss(coeffs, bfm, cfg)
    l_gamma = gamma_loss(coeffs.gamma)
    total = (cfg.w_photo * l_photo + l_reg + cfg.w_gamma * l_gamma)
    parts = {"photo": l_photo, "reg": l_reg, "gamma": l_gamma}
    if cfg.w_tex_var > 0.0:
        l_tv = texture_variance_loss(out.geometry.texture, bfm)
        total = total + cfg.w_tex_var * l_tv
        parts["tex_var"] = l_tv
    if gt_landmarks is not None:
        l_lmk = landmark_loss(out.geometry.landmarks2d, gt_landmarks, cfg)
        total = total + cfg.w_landmark * l_lmk
        parts["landmark"] = l_lmk
    parts["total"] = total
    return total, parts
