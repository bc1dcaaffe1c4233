"""Coefficient codec — SURVEY.md §3 C2.

Splits/concats the regressed coefficient vector
  [alpha id | beta exp | delta tex | angles(3) | gamma(27) | trans(3)]
(total 257 with default dims, SURVEY.md §9) into a typed NamedTuple.
Works on batched (B, n_coeff) or unbatched (n_coeff,) arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from facerecon_tpu.config import FaceReconConfig


class Coeffs(NamedTuple):
    id: jnp.ndarray      # (..., K_id)
    exp: jnp.ndarray     # (..., K_exp)
    tex: jnp.ndarray     # (..., K_tex)
    angles: jnp.ndarray  # (..., 3) Euler radians
    gamma: jnp.ndarray   # (..., 27) SH illumination, 9 per RGB channel
    trans: jnp.ndarray   # (..., 3) translation


def split_coeff(coeff, cfg: FaceReconConfig) -> Coeffs:
    parts = jnp.split(coeff, cfg.coeff_split, axis=-1)
    return Coeffs(*parts)


def join_coeff(c: Coeffs) -> jnp.ndarray:
    return jnp.concatenate(list(c), axis=-1)
