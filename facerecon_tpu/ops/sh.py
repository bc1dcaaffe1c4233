"""SH-9 Lambertian illumination — SURVEY.md §3 C7, math per §9.4.

Radiance per channel k: C_k = T_k * (Y(n) . (gamma_k + e1)), where Y(n) is
the 9-dim SH basis of the vertex normal and e1 adds 1 to the DC term.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_A0 = np.pi
_A1 = 2.0 * np.pi / np.sqrt(3.0)
_A2 = 2.0 * np.pi / np.sqrt(8.0)
_C0 = 1.0 / np.sqrt(4.0 * np.pi)
_C1 = np.sqrt(3.0) / np.sqrt(4.0 * np.pi)
_C2 = 3.0 * np.sqrt(5.0) / np.sqrt(12.0 * np.pi)

# the 9 scale constants, DC first (SURVEY.md §9.4)
SH_SCALES = np.array([
    _A0 * _C0,
    -_A1 * _C1, _A1 * _C1, -_A1 * _C1,
    _A2 * _C2, -_A2 * _C2, _A2 * _C2 / (2.0 * np.sqrt(3.0)),
    -_A2 * _C2, _A2 * _C2 / 2.0,
], dtype=np.float32)


def sh_basis(normals: jnp.ndarray) -> jnp.ndarray:
    """Normals (..., 3) -> SH basis Y (..., 9)."""
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    one = jnp.ones_like(nx)
    feats = jnp.stack([
        one, ny, nz, nx,
        nx * ny, ny * nz, 3.0 * nz * nz - 1.0,
        nx * nz, nx * nx - ny * ny,
    ], axis=-1)
    return feats * jnp.asarray(SH_SCALES)


def illuminate(texture: jnp.ndarray, normals: jnp.ndarray,
               gamma: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex radiance.

    texture (B,N,3) albedo in [0,1]; normals (B,N,3); gamma (B,27).
    Returns (B,N,3) radiance (unclamped; compositing clips for display).

    Computed as 9 broadcast FMAs per channel (per-batch scalar SH
    coefficients against (B,N) basis planes) instead of the einsum
    "bnk,bck->bnc": K=9/N=3 batched matmuls are the worst MXU shape
    (both contraction dims pad to 128) and materialize the (B,N,9)
    basis — the einsum form measured 4.5 ms/128 at 224px where the
    traffic bound is ~0.3 ms. Values agree to f32 summation-order
    rounding (oracle tolerance 1e-5)."""
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    feats = (None, ny, nz, nx, nx * ny, ny * nz, 3.0 * nz * nz - 1.0,
             nx * nz, nx * nx - ny * ny)        # index 0 is the constant 1
    g = gamma.reshape(*gamma.shape[:-1], 3, 9)  # (B,3,9)
    g = (g + jnp.asarray([1.0] + [0.0] * 8)     # ambient init on DC term
         ) * jnp.asarray(SH_SCALES)             # fold the basis scales
    chans = []
    for c in range(3):
        gc = g[..., c, :]                       # (B,9)

        def coef(k):
            return gc[..., k][..., None]        # (B,1) broadcast over N

        light = coef(0)
        for k in range(1, 9):
            light = light + feats[k] * coef(k)
        chans.append(texture[..., c] * light)
    return jnp.stack(chans, axis=-1)
