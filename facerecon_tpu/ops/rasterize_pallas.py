"""Pallas TPU z-buffer rasterizer — SURVEY.md §3 C8, design per §9.5.

Replaces the reference's C++/CUDA z-buffer op with a tile-based Mosaic/TPU
kernel. Shares triangle setup + y-band binning with ops/rasterize_tiled.py
(ops/binning.py) and fixes that path's weakness: all intermediates stay in
VMEM and the per-band triangle count is a *dynamic* loop bound (empty bands
cost nothing, no HBM round-trips for the (candidates x pixels) matrices).

Data layout (chosen for TPU tiling):
  - per-band candidate triangles are a contiguous, 128-aligned slice of the
    ymin-sorted setup array -> the kernel walks chunks of 128 triangles with
    a non-minor dynamic index (no lane-dim dynamic slicing, no gathers);
  - within a chunk: setup records are (16 fields x 128 triangles) so field
    extraction is a sublane slice (cheap); the evaluation matrices put band
    pixels on sublanes and triangles on lanes, so the affine edge functions
    are outer-product FMAs on the VPU and the depth-test winner is a
    cross-lane min;
  - the kernel emits the winner's *sorted position* and depth only; original
    triangle ids and barycentrics are resolved outside in jnp (XLA gathers),
    keeping the kernel free of dynamic gathers. tri_id stays integer ->
    non-differentiable, per the §9.6 contract (bary recomputed in render.py).

Tie rule: equal depth resolves to the lower sorted position (within-chunk:
lower lane; across chunks: strict < keeps the earlier chunk), matching
ops/rasterize_tiled.py. See that module's docstring for the oracle-parity
tolerance discussion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facerecon_tpu.ops.binning import SETUP_WIDTH, bin_triangles_static

_CHUNK = 128          # triangles per eval step (= lane count)
_WINDOW = 128         # max chunks per band (1 MB scratch) — must cover the
                      # widest band span (rotation widens static-order
                      # spans; 64 truncated coverage at ~6% px)
_HEAD = 16            # chunks in the eager head DMA: typical bands need ~13
                      # chunks, so most bands transfer 128 KB instead of
                      # 1 MB; the tail DMA is issued only when needed and
                      # waited on only when the loop reaches it
_ROW_PAD = 16         # setup record fields padded 10 -> 16 for tiling
_UNROLL = 8           # chunks evaluated per loop iteration: each fori
                      # iteration costs ~2.4us of fixed overhead on this
                      # backend, which dominated at 1 chunk/iteration


def _kernel(lo_ref, nc_ref, coeffs_hbm, pos_ref, z_ref, scratch,
            sem, *, tile_h: int, tile_w: int, band_px: int):
    """Per (image, band) program. The band's covering candidate window is
    fetched HBM->VMEM in ONE DMA, then evaluated _UNROLL chunks per loop
    iteration. Tail over-read is safe and correct: window chunks beyond the
    live count are real padded/neighbouring records whose coverage test
    rejects or legitimately wins, and the z-test is idempotent.

    Scalars are flattened to (B, n_bands): a short trailing dim would pad to
    128 lanes in SMEM (64x memory blowup)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    lo_chunk = lo_ref[b, t]        # DMA window base
    n_chunks = nc_ref[b, t]        # live chunk count in the window

    head_dma = pltpu.make_async_copy(
        coeffs_hbm.at[b, pl.ds(lo_chunk, _HEAD)],
        scratch.at[pl.ds(0, _HEAD)], sem.at[0])
    head_dma.start()
    has_tail = n_chunks > _HEAD

    def tail_dma():
        return pltpu.make_async_copy(
            coeffs_hbm.at[b, pl.ds(lo_chunk + _HEAD, _WINDOW - _HEAD)],
            scratch.at[pl.ds(_HEAD, _WINDOW - _HEAD)], sem.at[1])

    @pl.when(has_tail)
    def _():
        tail_dma().start()

    # pixel coordinates pre-broadcast to (band_px, CHUNK): the affine eval
    # stays on the VPU — an MXU (band_px,3)@(3,CHUNK) form was tried and is
    # 2x SLOWER because K=3 pads to the 128-deep systolic array (16x waste)
    flat_i = jax.lax.broadcasted_iota(jnp.int32, (band_px, _CHUNK), 0)
    px = (flat_i % tile_w).astype(jnp.float32) + 0.5
    py = ((flat_i // tile_w).astype(jnp.float32)
          + jnp.float32(t * tile_h) + 0.5)

    # f32 lane indices: cross-lane min is native for f32 but emulated (and
    # ~10x slower) for int32; lane values (<128) are exact in f32
    lane_f = jax.lax.broadcasted_iota(
        jnp.int32, (band_px, _CHUNK), 1).astype(jnp.float32)

    head_dma.wait()

    def eval_chunk(k, carry):
        """One 128-triangle chunk at window-relative index k (traced)."""
        zbest, posbest = carry
        c = scratch[k]                            # (16 fields, CHUNK tris)
        # anchored outer-product affine eval -> (band_px, CHUNK)
        qx = px - c[9:10]
        qy = py - c[10:11]
        e0 = c[0:1] * qx + c[1:2] * qy + c[2:3]
        e1 = c[3:4] * qx + c[4:5] * qy + c[5:6]
        ez = c[6:7] * qx + c[7:8] * qy + c[8:9]
        cov = (e0 >= 0.0) & (e1 >= 0.0) & (e0 + e1 <= 1.0)
        zm = jnp.where(cov, ez, jnp.inf)

        zmin = jnp.min(zm, axis=1, keepdims=True)                # (band_px,1)
        win_f = jnp.min(jnp.where(zm == zmin, lane_f, 3e38),
                        axis=1, keepdims=True)
        better = zmin < zbest
        zbest = jnp.where(better, zmin, zbest)
        win = win_f.astype(jnp.int32)                            # (band_px,1)
        posbest = jnp.where(
            better, (lo_chunk + k) * _CHUNK + win, posbest)
        return zbest, posbest

    def group_body(g, carry):
        base = g * _UNROLL
        for u in range(_UNROLL):
            # clamp inside the window; duplicate evaluation is idempotent
            carry = eval_chunk(jnp.minimum(base + u, _WINDOW - 1), carry)
        return carry

    init = (jnp.full((band_px, 1), jnp.inf, jnp.float32),
            jnp.full((band_px, 1), -1, jnp.int32))
    nc = jnp.minimum(n_chunks, _WINDOW)
    # head chunks overlap with the (rare) tail transfer
    n_head_groups = jnp.minimum(nc, _HEAD) // _UNROLL  # _HEAD % _UNROLL == 0
    carry = jax.lax.fori_loop(0, n_head_groups, group_body, init)

    @pl.when(has_tail)
    def _():
        tail_dma().wait()

    n_groups = (nc + _UNROLL - 1) // _UNROLL
    zbest, posbest = jax.lax.fori_loop(
        n_head_groups, n_groups, group_body, carry)
    pos_ref[0, 0] = posbest
    z_ref[0, 0] = zbest


def padded_rows(n_faces: int) -> int:
    """Static row count of the padded setup/record arrays for n_faces.
    Rounded to 8-chunk groups (the select kernel works in 1024-row groups).
    """
    nct = (n_faces + _CHUNK - 1) // _CHUNK + _WINDOW
    nct = (nct + 7) // 8 * 8
    return nct * _CHUNK


def is_available() -> bool:
    """Used by ops/render.py to pick the hard-visibility backend: the Pallas
    kernel on real TPU, the tiled-jnp path elsewhere (interpret mode stays
    available for explicit CPU testing via rasterize())."""
    return jax.default_backend() in ("tpu", "axon")


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "cull_backfaces"))
def rasterize_positions(verts_ndc, faces, *, height: int, width: int,
                        tile_h: int = 8, cull_backfaces: bool = False):
    """Batched hard-visibility pass.

    verts_ndc (B,N,3), faces (F,3) -> (tri_id (B,H,W) i32 winning face index
    in ORIGINAL face order (-1 = background), records (B,F16,16) setup
    records in face order, zbuf (B,H,W) f32).
    """
    bsz = verts_ndc.shape[0]
    tile_w = ((width + 127) // 128) * 128   # one full-width column tile
    n_bands = (height + tile_h - 1) // tile_h
    band_px = tile_h * tile_w

    # sort-free static binning: faces stay in original order (coherent
    # orderings assumed — see ops/binning.py bin_triangles_static). One
    # column tile: per-column windows prune nothing (every mesh row spans
    # both columns) and per-run loops pay the fixed per-iteration cost more
    # than they save.
    setup = jax.vmap(
        lambda v: bin_triangles_static(v, faces, height, width, tile_h,
                                       _CHUNK, cull_backfaces,
                                       tile_w=tile_w))(verts_ndc)
    f = setup.coeffs.shape[1]
    lo_chunk = setup.band_lo[:, :, 0]       # (B, n_bands)
    n_chunks = setup.n_chunks[:, :, 0]

    # pad triangle axis to whole chunks plus a full DMA window of slack so
    # the fixed-size per-band fetch stays in bounds; records 10 -> 16
    nct = padded_rows(f) // _CHUNK
    pad_f = nct * _CHUNK - f
    coeffs = jnp.pad(setup.coeffs, ((0, 0), (0, pad_f),
                                    (0, _ROW_PAD - SETUP_WIDTH)))
    # dead padding must never cover: wc0 = wc1 = -inf
    if pad_f:
        coeffs = coeffs.at[:, f:, 2].set(-3e38)
        coeffs = coeffs.at[:, f:, 5].set(-3e38)
    flat_records = coeffs                                # (B, F16, 16)
    # kernel layout: fields on sublanes, triangles on lanes
    coeffs_k = coeffs.reshape(bsz, nct, _CHUNK, _ROW_PAD)
    coeffs_k = jnp.swapaxes(coeffs_k, 2, 3)              # (B, nct, 16, CHUNK)

    pos, zbuf = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w,
                          band_px=band_px),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,            # window lo, chunk counts
            grid=(bsz, n_bands),
            in_specs=[
                # full array stays in HBM; the kernel DMAs per-band slices
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((_WINDOW, _ROW_PAD, _CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, band_px, 1),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, band_px, 1),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_bands, band_px, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, n_bands, band_px, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(lo_chunk.astype(jnp.int32), n_chunks.astype(jnp.int32), coeffs_k)

    pos = pos.reshape(bsz, n_bands * tile_h, tile_w)[:, :height, :width]
    zbuf = zbuf.reshape(bsz, n_bands * tile_h, tile_w)[:, :height, :width]
    # positions beyond the live face count are dead padding (can win only
    # never — but guard anyway); pos IS the face id in original order
    pos = jnp.where(pos < faces.shape[0], pos, -1)
    # band windows + padded row count: consumers (ops/select_pallas.py) use
    # the same chunk indexing to fetch per-pixel records MXU-side
    return pos, flat_records, zbuf, (lo_chunk, n_chunks, nct)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "cfg", "tile_h", "cull_backfaces"))
def rasterize_batch(verts_ndc, faces, *, height: int, width: int, cfg=None,
                    tile_h: int = 8, cull_backfaces: bool = False):
    """Full SURVEY.md §9.5 contract: (tri_id, bary, zbuf), batched.

    Fully jitted — eager dispatch over the axon tunnel costs seconds per op.
    """
    if cfg is not None:
        tile_h = cfg.tile_h
    tri_id, records, zbuf, _ = rasterize_positions(
        verts_ndc, faces, height=height, width=width, tile_h=tile_h,
        cull_backfaces=cull_backfaces)
    hit = tri_id >= 0
    safe = jnp.maximum(tri_id, 0)
    # barycentrics from the winner's affine record (non-differentiable path;
    # render.py recomputes them differentiably from tri_id)
    rec = jnp.take_along_axis(
        records, safe.reshape(records.shape[0], -1, 1), axis=1
    ).reshape(*tri_id.shape, _ROW_PAD)
    jj, ii = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
    qx = (jj + 0.5).astype(jnp.float32)[None] - rec[..., 9]
    qy = (ii + 0.5).astype(jnp.float32)[None] - rec[..., 10]
    w0 = rec[..., 0] * qx + rec[..., 1] * qy + rec[..., 2]
    w1 = rec[..., 3] * qx + rec[..., 4] * qy + rec[..., 5]
    bary = jnp.stack([w0, w1, 1.0 - w0 - w1], axis=-1)
    bary = jnp.where(hit[..., None], bary, 0.0)
    zbuf = jnp.where(hit, zbuf, jnp.inf)
    return tri_id, bary, zbuf


def rasterize(verts_ndc, faces, *, height: int, width: int,
              tile_h: int = 8, cull_backfaces: bool = False):
    """Single-mesh wrapper matching rasterize_jnp/rasterize_tiled."""
    tid, bary, z = rasterize_batch(
        verts_ndc[None], faces, height=height, width=width, tile_h=tile_h,
        cull_backfaces=cull_backfaces)
    return tid[0], bary[0], z[0]
