"""Ablation harness for the round-3 Pallas rasterizer (chunk-granular
windows, segmented window-0 DMA, predicated static 8-chunk supers,
deferred per-band reduction, fused per-super MXU select). Isolates:

  empty      — program skeleton: grid + packed bf16 output write
  dma        — + segmented setup/record window DMA start+wait, no eval
  loop       — + predicated super skeleton reading one field slab/super
  eval1      — + affine eval + coverage + per-super zmin reduction
  full       — phase 1 as shipped (zmin + winner-lane + scratch merges)
  full_sel   — + per-super one-hot MXU record select (the render hot path)

Each mode COPIES the shipped kernel's structure (ops/rasterize_pallas.py)
with later stages removed, sharing its binning/layout helpers, so the
deltas attribute device time stage by stage. Run on the TPU:

  python benchmarks/kernel_ablation.py
  env: BATCH=64 TILEH=2 SIZE=224 MODES=empty,full_sel REPS=3 INNER=8
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facerecon_tpu.config import default_config
from facerecon_tpu.data.synthetic import sample_coeffs
from facerecon_tpu.ops import rasterize_pallas as RP
from facerecon_tpu.ops import sh as sh_ops
from facerecon_tpu.ops.geometry import coeffs_to_geometry, device_bfm
from facerecon_tpu.ops.render import _pack_render_records
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff

_CHUNK = RP._CHUNK
_WINDOW = RP._WINDOW
_SEG = RP._SEG
_BGRP = RP._BGRP
_F = RP._ROW_PAD
_RF = RP._RFIELDS
_OUT_F = RP._OUT_F


def make_kernel(mode, tile_h, tile_w, band_px):
    n_seg = _WINDOW // _SEG
    sup_lanes = _BGRP * _CHUNK

    def kernel(blo_ref, bn_ref, setup_hbm, rec_hbm, packed_ref,
               scr_s, scr_r, scr_zb, scr_pb, scr_acc, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        blo = blo_ref[b, t]
        bn = bn_ref[b, t]

        def out_write(val):
            packed_ref[0, 0] = jnp.full((band_px, _OUT_F), val,
                                        jnp.bfloat16)

        if mode == "empty":
            out_write(bn.astype(jnp.bfloat16))
            return

        def dma_t(hbm, scr, lo, size, s):
            return pltpu.make_async_copy(
                hbm.at[b, :, pl.ds((blo + lo) * _CHUNK, size * _CHUNK)],
                scr.at[:, pl.ds(lo * _CHUNK, size * _CHUNK)], sem.at[s])

        segs = []
        for k in range(n_seg):
            d = dma_t(setup_hbm, scr_s, k * _SEG, _SEG, k)
            if k == 0:
                d.start()
            else:
                pl.when(bn > k * _SEG)(lambda d=d: d.start())
            segs.append(d)
        rsegs = []
        for k in range(n_seg):
            d = dma_t(rec_hbm, scr_r, k * _SEG, _SEG, n_seg + k)
            if k == 0:
                d.start()
            else:
                pl.when(bn > k * _SEG)(lambda d=d: d.start())
            rsegs.append(d)
        for k in range(n_seg):
            if k == 0:
                segs[k].wait()
                rsegs[k].wait()
            else:
                pl.when(bn > k * _SEG)(lambda d=segs[k]: d.wait())
                pl.when(bn > k * _SEG)(lambda d=rsegs[k]: d.wait())

        if mode == "dma":
            out_write(scr_s[0, 0].astype(jnp.bfloat16))
            return

        pix_i = jax.lax.broadcasted_iota(jnp.int32, (band_px, 1), 0)
        px = (pix_i % tile_w).astype(jnp.float32) + 0.5
        py = ((pix_i // tile_w).astype(jnp.float32)
              + jnp.float32(t * tile_h) + 0.5)
        lane_f = jax.lax.broadcasted_iota(
            jnp.int32, (1, sup_lanes), 1).astype(jnp.float32)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, sup_lanes), 1)

        scr_zb[...] = jnp.full((band_px, 1), jnp.inf, jnp.float32)
        scr_pb[...] = jnp.full((band_px, 1), -1, jnp.int32)

        def eval_block(cf, base_chunk):
            qx = px - cf(9)
            qy = py - cf(10)
            e0 = cf(0) * qx + cf(1) * qy + cf(2)
            e1 = cf(3) * qx + cf(4) * qy + cf(5)
            ez = cf(6) * qx + cf(7) * qy + cf(8)
            cov = (e0 >= 0.0) & (e1 >= 0.0) & (e0 + e1 <= 1.0)
            zm = jnp.where(cov, ez, jnp.inf)
            zmin = jnp.min(zm, axis=1, keepdims=True)
            if mode == "eval1":
                zb = scr_zb[...]
                scr_zb[...] = jnp.minimum(zmin, zb)
                return
            win_f = jnp.min(jnp.where(zm == zmin, lane_f, 3e38),
                            axis=1, keepdims=True)
            zb = scr_zb[...]
            better = zmin < zb
            scr_zb[...] = jnp.where(better, zmin, zb)
            pos = base_chunk * _CHUNK + win_f.astype(jnp.int32)
            scr_pb[...] = jnp.where(better, pos, scr_pb[...])

        for s in range(_WINDOW // _BGRP):
            def sup(s=s):
                if mode == "loop":
                    scr_zb[...] = jnp.minimum(
                        scr_zb[...],
                        scr_s[0:1, s * sup_lanes:s * sup_lanes + 1])
                    return
                cf = lambda f: scr_s[f:f + 1,
                                     s * sup_lanes:(s + 1) * sup_lanes]
                eval_block(cf, blo + s * _BGRP)

            if s == 0:
                sup()
            else:
                pl.when(bn > s * _BGRP)(sup)

        zbuf = scr_zb[...]
        posbest = scr_pb[...]

        if mode != "full_sel":
            # keep the scalar add in f32 — Mosaic cannot legalize a scalar
            # bf16 addf; out_write's jnp.full casts once at the end
            out_write(zbuf[0, 0] + posbest[0, 0].astype(jnp.float32))
            return

        scr_acc[...] = jnp.zeros((band_px, _RF), jnp.float32)
        for s in range(_WINDOW // _BGRP):
            def ssel(s=s):
                onehot = ((posbest - (blo + s * _BGRP) * _CHUNK)
                          == lane_i).astype(jnp.bfloat16)
                scr_acc[...] = scr_acc[...] + jax.lax.dot_general(
                    onehot, scr_r[:, s * sup_lanes:(s + 1) * sup_lanes],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

            if s == 0:
                ssel()
            else:
                pl.when(bn > s * _BGRP)(ssel)

        posu = posbest + 1
        p0 = (posu & 255).astype(jnp.bfloat16)
        p1 = ((posu >> 8) & 255).astype(jnp.bfloat16)
        p2 = (posu >> 16).astype(jnp.bfloat16)
        zsafe = jnp.where(posbest >= 0, zbuf, 0.0)
        zhi_f = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(zsafe, jnp.uint32)
            & jnp.uint32(0xFFFF0000), jnp.float32)
        zhi = zhi_f.astype(jnp.bfloat16)
        zlo = (zsafe - zhi_f).astype(jnp.bfloat16)
        packed_ref[0, 0] = jnp.concatenate(
            [scr_acc[...].astype(jnp.bfloat16), p0, p1, p2, zhi, zlo,
             jnp.zeros((band_px, _OUT_F - _RF - 5), jnp.bfloat16)],
            axis=1)

    return kernel


def run_mode(mode, blo, bn, setup_t, rec_t, height, width, tile_h):
    bsz = setup_t.shape[0]
    tile_w = ((width + 7) // 8) * 8
    n_bands = (height + tile_h - 1) // tile_h
    band_px = tile_h * tile_w

    return pl.pallas_call(
        make_kernel(mode, tile_h, tile_w, band_px),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz, n_bands),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((_F, _WINDOW * _CHUNK), jnp.float32),
                pltpu.VMEM((_RF, _WINDOW * _CHUNK), jnp.bfloat16),
                pltpu.VMEM((band_px, 1), jnp.float32),
                pltpu.VMEM((band_px, 1), jnp.int32),
                pltpu.VMEM((band_px, _RF), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * (_WINDOW // _SEG),)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, band_px, _OUT_F),
                             lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_bands, band_px, _OUT_F),
                                 jnp.bfloat16),
        ],
    )(blo, bn, setup_t, rec_t)[0]


def main():
    size = int(os.environ.get("SIZE", "224"))
    batch = int(os.environ.get("BATCH", "64"))
    tile_h = int(os.environ.get("TILEH", "2" if size <= 256 else "1"))
    reps = int(os.environ.get("REPS", "3"))
    inner = int(os.environ.get("INNER", "8"))
    modes = os.environ.get(
        "MODES", "empty,dma,loop,eval1,full,full_sel").split(",")

    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0,
                         tile_h=tile_h)
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(0)
    scale = float(os.environ.get("CSCALE", "0.3"))   # 0 = bench-like pose
    cv = jnp.asarray(sample_coeffs(rng, cfg, batch, scale=scale))

    @jax.jit
    def prep(cv):
        c = split_coeff(cv, cfg)
        geom = coeffs_to_geometry(c, bfm, cfg)
        radiance = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
        records = _pack_render_records(
            geom.verts_ndc, radiance, bfm.faces, size, size,
            RP.padded_rows(bfm.faces.shape[0]))
        rid = jnp.arange(bfm.faces.shape[0], dtype=jnp.int32)
        (blo, bn), _, coeffs = RP._band_windows(
            geom.verts_ndc, bfm.faces, rid, size, size, tile_h, 1, False)
        return (blo, bn, jnp.transpose(coeffs, (0, 2, 1)),
                RP._split_records(records, rid))

    blo, bn, setup_t, rec_t = jax.block_until_ready(prep(cv))
    print(f"prep ready  (batch {batch}, {size}px, tile_h {tile_h}, "
          f"bn mean {float(jnp.mean(bn)):.1f} "
          f"max {int(jnp.max(bn))})", flush=True)

    prev = 0.0
    for mode in modes:
        @jax.jit
        def chained(blo, bn, st, rt, mode=mode):
            def body(carry, _):
                # data dependency through the tiny scalar-prefetch array,
                # not the HBM-sized setup (an elementwise add there would
                # cost milliseconds per iteration and pollute the deltas)
                out = run_mode(mode, blo + (carry * 1e-30).astype(jnp.int32),
                               bn, st, rt, size, size, tile_h)
                s = out[0, 0, 0, 0].astype(jnp.float32)
                return s * 1e-30, s
            _, ss = jax.lax.scan(body, 0.0, None, length=inner)
            return jnp.sum(ss)

        t0 = time.time()
        _ = float(chained(blo, bn, setup_t, rec_t))
        ct = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = chained(blo, bn, setup_t, rec_t)
        _ = float(out)
        dt = (time.time() - t0) / (reps * inner)
        print(f"{mode:9s}: {dt*1000:7.2f} ms/{batch}  "
              f"(+{(dt-prev)*1000:6.2f})  [compile {ct:.0f}s]", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
