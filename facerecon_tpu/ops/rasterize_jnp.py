"""Reference jnp z-buffer rasterizer — SURVEY.md §3 C8 (jnp fallback path).

Brute-force O(H*W*F) rasterization as a lax.scan over triangle chunks with
running (z, id, bary) buffers — jit-compiles with static shapes on any
backend and serves as (a) the correctness fallback and (b) the cross-check
between the numpy oracle (facerecon_tpu/oracle.py) and the Pallas kernel
(ops/rasterize_pallas.py). The contract is SURVEY.md §9.5:

  (verts_ndc (N,3), faces (F,3), H, W) -> tri_id (H,W) i32 (-1=bg),
                                          bary (H,W,3) f32, zbuf (H,W) f32

Coverage: all three edge functions carry the sign of the triangle area
(inclusive); nearest depth z' wins; ties -> smaller triangle id.
tri_id is integer output (non-differentiable by construction); downstream
differentiability is handled by recomputing barycentrics in ops/render.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ndc_to_screen(verts_ndc, height: int, width: int):
    u = (verts_ndc[..., 0] + 1.0) * (width / 2.0)
    v = (1.0 - verts_ndc[..., 1]) * (height / 2.0)
    return jnp.stack([u, v], axis=-1)


def _pad_faces(faces, chunk: int):
    """Pad face list to a multiple of chunk with degenerate (0,0,0) tris."""
    f = faces.shape[0]
    pad = (-f) % chunk
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), dtype=faces.dtype)], axis=0)
    return faces, f + pad


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk"))
def rasterize(verts_ndc, faces, *, height: int, width: int,
              chunk: int = 512):
    """Single-mesh rasterization. See module docstring for the contract."""
    screen = ndc_to_screen(verts_ndc, height, width)   # (N,2)
    depth = verts_ndc[:, 2]
    faces, n_padded = _pad_faces(faces, chunk)
    n_chunks = n_padded // chunk
    faces_c = faces.reshape(n_chunks, chunk, 3)

    jj, ii = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
    px = (jj + 0.5).astype(jnp.float32).reshape(-1)    # (P,)
    py = (ii + 0.5).astype(jnp.float32).reshape(-1)
    n_pix = height * width

    def body(carry, inputs):
        zbuf, tri_id, bary = carry
        f, base = inputs                               # (C,3), scalar
        p0, p1, p2 = (jnp.take(screen, f[:, k], axis=0) for k in range(3))
        z0, z1, z2 = (jnp.take(depth, f[:, k], axis=0) for k in range(3))
        area = ((p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
                - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0]))

        def edge(a, b):
            return ((b[:, 0] - a[:, 0])[:, None] * (py[None] - a[:, 1][:, None])
                    - (b[:, 1] - a[:, 1])[:, None]
                    * (px[None] - a[:, 0][:, None]))

        e0, e1, e2 = edge(p1, p2), edge(p2, p0), edge(p0, p1)
        s = jnp.sign(area)[:, None]
        covered = ((e0 * s >= 0) & (e1 * s >= 0) & (e2 * s >= 0)
                   & (jnp.abs(area)[:, None] > 1e-12))
        inv_area = jnp.where(area == 0, 0.0, 1.0 / area)[:, None]
        w0, w1, w2 = e0 * inv_area, e1 * inv_area, e2 * inv_area
        z = w0 * z0[:, None] + w1 * z1[:, None] + w2 * z2[:, None]
        z = jnp.where(covered, z, jnp.inf)

        best = jnp.argmin(z, axis=0)                    # first min = low id
        cols = jnp.arange(n_pix)
        bz = z[best, cols]
        update = bz < zbuf                              # strict: old id wins tie
        tri_id = jnp.where(update, base + best, tri_id).astype(jnp.int32)
        zbuf = jnp.where(update, bz, zbuf)
        new_bary = jnp.stack([w0[best, cols], w1[best, cols], w2[best, cols]],
                             axis=-1)
        bary = jnp.where(update[:, None], new_bary, bary)
        return (zbuf, tri_id, bary), None

    init = (jnp.full((n_pix,), jnp.inf, jnp.float32),
            jnp.full((n_pix,), -1, jnp.int32),
            jnp.zeros((n_pix, 3), jnp.float32))
    bases = jnp.arange(n_chunks) * chunk
    (zbuf, tri_id, bary), _ = jax.lax.scan(body, init, (faces_c, bases))
    return (tri_id.reshape(height, width),
            bary.reshape(height, width, 3),
            zbuf.reshape(height, width))


def rasterize_batch(verts_ndc, faces, *, height: int, width: int,
                    chunk: int = 512):
    """Batched over leading axis: (B,N,3) -> (B,H,W), (B,H,W,3), (B,H,W)."""
    fn = functools.partial(rasterize, faces=faces, height=height,
                           width=width, chunk=chunk)
    return jax.vmap(lambda v: fn(v))(verts_ndc)
