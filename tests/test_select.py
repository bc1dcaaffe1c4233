"""ops/select_pallas tests (interpret mode on CPU): the one-hot MXU row
select must equal a plain take_along_axis gather, and its custom VJP must
match the gather's gradient (the training path)."""

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu.ops import select_pallas
from facerecon_tpu.ops.rasterize_pallas import padded_rows


def _setup(rng, bsz=2, h=16, w=24, tile_h=2, n_faces=300):
    rows = padded_rows(n_faces)
    n_bands = h // tile_h
    records = jnp.asarray(rng.standard_normal((bsz, rows, 16)),
                          dtype=jnp.float32)
    # winners confined to per-band chunk windows like the rasterizer's
    lo = rng.integers(0, 2, size=(bsz, n_bands)).astype(np.int32)
    nc = np.full((bsz, n_bands), 2, dtype=np.int32)   # 2-chunk windows
    pos = np.full((bsz, h, w), -1, dtype=np.int32)
    for b in range(bsz):
        for band in range(n_bands):
            ys = slice(band * tile_h, (band + 1) * tile_h)
            base = lo[b, band] * 128
            span = min(nc[b, band] * 128, n_faces - base)
            block = rng.integers(base, base + span, size=(tile_h, w))
            # sprinkle background
            mask = rng.random((tile_h, w)) < 0.3
            pos[b, ys] = np.where(mask, -1, block)
    return (jnp.asarray(pos), records, jnp.asarray(lo), jnp.asarray(nc),
            tile_h)


def _reference(pos, records):
    safe = jnp.maximum(pos, 0)
    out = jnp.take_along_axis(
        records, safe.reshape(records.shape[0], -1, 1), axis=1
    ).reshape(*pos.shape, 16)
    return jnp.where((pos >= 0)[..., None], out, 0.0)


def test_select_matches_gather(rng):
    pos, records, lo, nc, tile_h = _setup(rng)
    got = select_pallas.select_rows(pos, records, lo, nc, tile_h)
    want = _reference(pos, records)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_select_vjp_matches_gather_vjp(rng):
    pos, records, lo, nc, tile_h = _setup(rng)
    g = jnp.asarray(rng.standard_normal((*pos.shape, 16)),
                    dtype=jnp.float32)

    def f_sel(r):
        return jnp.sum(select_pallas.select_rows(pos, r, lo, nc, tile_h) * g)

    def f_ref(r):
        return jnp.sum(_reference(pos, r) * g)

    grad_sel = jax.grad(f_sel)(records)
    grad_ref = jax.grad(f_ref)(records)
    np.testing.assert_allclose(np.asarray(grad_sel), np.asarray(grad_ref),
                               rtol=1e-5, atol=1e-5)


def test_select_background_rows_zero(rng):
    pos, records, lo, nc, tile_h = _setup(rng)
    pos = jnp.full_like(pos, -1)
    out = np.asarray(select_pallas.select_rows(pos, records, lo, nc, tile_h))
    np.testing.assert_array_equal(out, 0.0)
