"""Pallas row-select kernel: per-pixel record fetch as one-hot MXU matmuls.

TPU dynamic gathers run at ~1 element/cycle, which made the shading stage's
per-pixel record fetch (50k pixels x 16 floats) cost more than rasterization
itself. Each band's winning positions all lie inside that band's candidate
chunk window (by construction of the rasterizer), so the fetch becomes, per
128-triangle chunk,

    acc (band_px, 16) += onehot(pos) (band_px, 128) @ records (128, 16)

a full-depth (K=128) MXU matmul — the systolic array does the "gather".
Background pixels (pos = -1) match no one-hot column and yield zero records.

The op is linear in `records`; the custom VJP scatter-adds the cotangent
back to record rows (XLA segment_sum — only the training path pays it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128
_WINDOW = 128
_HEAD = 16
_FIELDS = 16


def _kernel(lo_ref, nc_ref, pos_hbm, rec_hbm, out_ref, scratch, sem,
            *, band_px: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    lo_chunk = lo_ref[b, t]
    n_chunks = nc_ref[b, t]

    head = pltpu.make_async_copy(
        rec_hbm.at[b, pl.ds(lo_chunk, _HEAD)],
        scratch.at[pl.ds(0, _HEAD)], sem.at[0])
    head.start()
    has_tail = n_chunks > _HEAD

    def tail():
        return pltpu.make_async_copy(
            rec_hbm.at[b, pl.ds(lo_chunk + _HEAD, _WINDOW - _HEAD)],
            scratch.at[pl.ds(_HEAD, _WINDOW - _HEAD)], sem.at[1])

    @pl.when(has_tail)
    def _():
        tail().start()

    pos = pos_hbm[0, 0]                       # (band_px, 1) int32 block
    lane = jax.lax.broadcasted_iota(jnp.int32, (band_px, _CHUNK), 1)

    head.wait()

    def chunk_body(j, acc):
        base = (lo_chunk + j) * _CHUNK
        onehot = (pos - base == lane).astype(jnp.float32)
        rec = scratch[j]                      # (FIELDS, CHUNK): tris on lanes
        # RHS-transposed matmul: contract both operands' lane (tri) dims
        return acc + jax.lax.dot_general(
            onehot, rec, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    acc = jnp.zeros((band_px, _FIELDS), jnp.float32)
    nc = jnp.minimum(n_chunks, _WINDOW)
    n_head = jnp.minimum(nc, _HEAD)
    acc = jax.lax.fori_loop(0, n_head, chunk_body, acc)

    @pl.when(has_tail)
    def _():
        tail().wait()

    acc = jax.lax.fori_loop(n_head, nc, chunk_body, acc)
    out_ref[0, 0] = acc


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("tile_h",))
def _select_fwd_impl(pos, records, band_lo, band_nc, *, tile_h: int):
    """pos (B,H,W) abs winner positions (-1 bg), records (B, NCT*128, 16),
    band_lo/nc (B, n_bands) chunk windows -> (B,H,W,16)."""
    bsz, height, width = pos.shape
    width_pad = ((width + 127) // 128) * 128
    n_bands = (height + tile_h - 1) // tile_h
    band_px = tile_h * width_pad
    nct = records.shape[1] // _CHUNK

    pos_pad = jnp.pad(pos, ((0, 0), (0, n_bands * tile_h - height),
                            (0, width_pad - width)), constant_values=-1)
    pos_bands = pos_pad.reshape(bsz, n_bands, band_px, 1)
    # fields on sublanes, triangles on lanes: HBM DMA slices need the last
    # dim 128-aligned
    rec_chunks = jnp.swapaxes(
        records.reshape(bsz, nct, _CHUNK, _FIELDS), 2, 3)

    out = pl.pallas_call(
        functools.partial(_kernel, band_px=band_px),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz, n_bands),
            in_specs=[
                pl.BlockSpec((1, 1, band_px, 1),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((_WINDOW, _FIELDS, _CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, band_px, _FIELDS),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((bsz, n_bands, band_px, _FIELDS),
                                        jnp.float32)],
        interpret=_interpret(),
    )(band_lo.astype(jnp.int32), band_nc.astype(jnp.int32),
      pos_bands, rec_chunks)[0]

    out = out.reshape(bsz, n_bands * tile_h, width_pad, _FIELDS)
    return out[:, :height, :width]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def select_rows(pos, records, band_lo, band_nc, tile_h: int):
    """Differentiable (in `records`) per-pixel row select. See module doc."""
    return _select_fwd_impl(pos, records, band_lo, band_nc, tile_h=tile_h)


def _select_fwd(pos, records, band_lo, band_nc, tile_h):
    out = _select_fwd_impl(pos, records, band_lo, band_nc, tile_h=tile_h)
    return out, (pos, records.shape)


def _select_bwd(tile_h, res, g):
    pos, rec_shape = res
    bsz, rows, _ = rec_shape
    flat_pos = jnp.maximum(pos.reshape(bsz, -1), 0)
    valid = (pos.reshape(bsz, -1) >= 0)[..., None]
    flat_g = jnp.where(valid, g.reshape(bsz, -1, _FIELDS), 0.0)
    # scatter-add cotangents to record rows (training path only)
    offs = jnp.arange(bsz)[:, None] * rows
    seg = (flat_pos + offs).reshape(-1)
    grad = jax.ops.segment_sum(
        flat_g.reshape(-1, _FIELDS), seg, num_segments=bsz * rows)
    return None, grad.reshape(rec_shape), None, None


select_rows.defvjp(_select_fwd, _select_bwd)
