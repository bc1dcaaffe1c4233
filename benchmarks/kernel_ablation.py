"""Ablation harness for the grouped Pallas rasterizer (round-2 structure:
8-chunk lane groups, single-DMA window, fused select). Isolates:

  loop_only  — fori + dynamic scratch read, no vector work (fixed cost)
  eval_nored — affine eval + coverage, no cross-lane reductions
  full       — the z-test phase as shipped
  full_sel   — z-test + fused one-hot record select (the render hot path)

Run on the TPU:  python benchmarks/kernel_ablation.py [BATCH=64] [TILEH=2]
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facerecon_tpu.config import default_config
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.ops.geometry import device_bfm, coeffs_to_geometry
from facerecon_tpu.data.synthetic import sample_coeffs
from facerecon_tpu.utils.coeffs import split_coeff
from facerecon_tpu.ops import rasterize_pallas as RP

_GLANES = RP._GLANES
_WINDOW = RP._WINDOW
_HEAD = RP._HEAD
_MID = RP._MID
_F = RP._ROW_PAD


def make_kernel(mode, tile_h, tile_w, band_px):
    def kernel(glo_ref, gn_ref, setup_hbm, rec_hbm, pos_ref, prec_ref,
               z_ref, scr_s, scr_r, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        glo = glo_ref[b, t]
        gn = gn_ref[b, t]

        def dma(hbm, scr, lo, size, s):
            return pltpu.make_async_copy(
                hbm.at[b, pl.ds(glo + lo, size)],
                scr.at[pl.ds(lo, size)], sem.at[s])

        if mode == "empty":
            pos_ref[0, 0] = jnp.full((band_px, 1), gn, jnp.int32)
            z_ref[0, 0] = jnp.zeros((band_px, 1), jnp.float32)
            prec_ref[0, 0] = jnp.zeros((band_px, _F), jnp.float32)
            return
        if mode == "noloop_dma":
            dma(setup_hbm, scr_s, 0, _HEAD, 0).start()

            @pl.when(gn > _HEAD)
            def _():
                dma(setup_hbm, scr_s, _HEAD, _MID, 1).start()

            @pl.when(gn > _HEAD + _MID)
            def _():
                dma(setup_hbm, scr_s, _HEAD + _MID,
                    _WINDOW - _HEAD - _MID, 2).start()

            dma(setup_hbm, scr_s, 0, _HEAD, 0).wait()

            @pl.when(gn > _HEAD)
            def _():
                dma(setup_hbm, scr_s, _HEAD, _MID, 1).wait()

            @pl.when(gn > _HEAD + _MID)
            def _():
                dma(setup_hbm, scr_s, _HEAD + _MID,
                    _WINDOW - _HEAD - _MID, 2).wait()

            pos_ref[0, 0] = jnp.full((band_px, 1), gn, jnp.int32)
            z_ref[0, 0] = scr_s[0, 0:1, 0:1] + jnp.zeros(
                (band_px, 1), jnp.float32)
            prec_ref[0, 0] = jnp.zeros((band_px, _F), jnp.float32)
            return
        if mode == "loop_nodma":
            def body_nd(g, carry):
                z, p = carry
                return z + scr_s[g][0:1, 0:1], p

            init_nd = (jnp.zeros((band_px, 1), jnp.float32),
                       jnp.full((band_px, 1), -1, jnp.int32))
            z, p = jax.lax.fori_loop(
                0, jnp.minimum(gn, _WINDOW), body_nd, init_nd)
            pos_ref[0, 0] = p
            z_ref[0, 0] = z
            prec_ref[0, 0] = jnp.zeros((band_px, _F), jnp.float32)
            return
        head = dma(setup_hbm, scr_s, 0, _HEAD, 0)
        head.start()

        @pl.when(gn > _HEAD)
        def _():
            dma(setup_hbm, scr_s, _HEAD, _MID, 1).start()

        @pl.when(gn > _HEAD + _MID)
        def _():
            dma(setup_hbm, scr_s, _HEAD + _MID,
                _WINDOW - _HEAD - _MID, 2).start()

        if mode.startswith("sel"):
            rhead = dma(rec_hbm, scr_r, 0, _HEAD, 3)
            rhead.start()

            @pl.when(gn > _HEAD)
            def _():
                dma(rec_hbm, scr_r, _HEAD, _MID, 4).start()

            @pl.when(gn > _HEAD + _MID)
            def _():
                dma(rec_hbm, scr_r, _HEAD + _MID,
                    _WINDOW - _HEAD - _MID, 5).start()

        pix_i = jax.lax.broadcasted_iota(jnp.int32, (band_px, 1), 0)
        px = (pix_i % tile_w).astype(jnp.float32) + 0.5
        py = ((pix_i // tile_w).astype(jnp.float32)
              + jnp.float32(t * tile_h) + 0.5)
        lane_f = jax.lax.broadcasted_iota(
            jnp.int32, (1, _GLANES), 1).astype(jnp.float32)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, _GLANES), 1)

        def eval_body(g, carry):
            @pl.when(g == _HEAD)
            def _():
                dma(setup_hbm, scr_s, _HEAD, _MID, 1).wait()

            @pl.when(g == _HEAD + _MID)
            def _():
                dma(setup_hbm, scr_s, _HEAD + _MID,
                    _WINDOW - _HEAD - _MID, 2).wait()

            zbest, posbest = carry
            c = scr_s[g]
            if mode == "loop_only":
                return zbest + c[0:1, 0:1], posbest
            qx = px - c[9:10]
            qy = py - c[10:11]
            e0 = c[0:1] * qx + c[1:2] * qy + c[2:3]
            e1 = c[3:4] * qx + c[4:5] * qy + c[5:6]
            ez = c[6:7] * qx + c[7:8] * qy + c[8:9]
            cov = (e0 >= 0.0) & (e1 >= 0.0) & (e0 + e1 <= 1.0)
            zm = jnp.where(cov, ez, jnp.inf)
            if mode == "eval_nored":
                # fold to (band_px, 1) without a true cross-lane reduce
                return zbest + zm[:, :1] + zm[:, -1:], posbest
            if mode == "red_minonly":
                zmin = jnp.min(zm, axis=1, keepdims=True)
                return jnp.minimum(zbest, zmin), posbest
            if mode == "red_argmin":
                zmin = jnp.min(zm, axis=1, keepdims=True)
                win = jnp.argmin(zm, axis=1).reshape(-1, 1)
                better = zmin < zbest
                return (jnp.where(better, zmin, zbest),
                        jnp.where(better, (glo + g) * _GLANES + win,
                                  posbest))
            if mode == "red_fold8":
                # two-stage: elementwise min-fold of the 8 chunk slices,
                # then one narrow cross-lane reduce + disambiguation
                zs = [zm[:, k * 128:(k + 1) * 128] for k in range(8)]
                zf = zs[0]
                for k in range(1, 8):
                    zf = jnp.minimum(zf, zs[k])          # (band_px, 128)
                zmin = jnp.min(zf, axis=1, keepdims=True)
                lane128 = lane_f[:, :128]
                posf = jnp.full_like(zf, 3e38)
                for k in range(7, -1, -1):
                    posf = jnp.where(zs[k] == zmin,
                                     lane128 + jnp.float32(k * 128), posf)
                win_f = jnp.min(posf, axis=1, keepdims=True)
                better = zmin < zbest
                zbest = jnp.where(better, zmin, zbest)
                posbest = jnp.where(
                    better,
                    (glo + g) * _GLANES + win_f.astype(jnp.int32),
                    posbest)
                return zbest, posbest
            zmin = jnp.min(zm, axis=1, keepdims=True)
            win_f = jnp.min(jnp.where(zm == zmin, lane_f, 3e38),
                            axis=1, keepdims=True)
            better = zmin < zbest
            zbest = jnp.where(better, zmin, zbest)
            posbest = jnp.where(
                better, (glo + g) * _GLANES + win_f.astype(jnp.int32),
                posbest)
            return zbest, posbest

        init = (jnp.full((band_px, 1), jnp.inf, jnp.float32),
                jnp.full((band_px, 1), -1, jnp.int32))
        gn0 = jnp.minimum(gn, _WINDOW)
        head.wait()
        zbest, posbest = jax.lax.fori_loop(0, gn0, eval_body, init)
        if mode == "full_scalred":
            # probe: per-band scalar min/max of winner positions (the
            # winner-chunk-range trick needs these as loop bounds)
            pv = jnp.where(posbest >= 0, posbest, jnp.int32(2**30))
            cmin = jnp.min(pv) // 128
            pv2 = jnp.where(posbest >= 0, posbest, -1)
            cmax = jnp.max(pv2) // 128
            zbest = zbest + (cmax - cmin).astype(jnp.float32) * 1e-30
        pos_ref[0, 0] = posbest
        z_ref[0, 0] = zbest

        if not mode.startswith("sel"):
            prec_ref[0, 0] = jnp.zeros((band_px, _F), jnp.float32)
            return

        def split3(rec):
            hi = rec.astype(jnp.bfloat16)
            r1 = rec - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, mid, lo

        def sel_body(g, acc):
            @pl.when(g == _HEAD)
            def _():
                dma(rec_hbm, scr_r, _HEAD, _MID, 4).wait()

            @pl.when(g == _HEAD + _MID)
            def _():
                dma(rec_hbm, scr_r, _HEAD + _MID,
                    _WINDOW - _HEAD - _MID, 5).wait()

            base = (glo + g) * _GLANES
            rec = scr_r[g]
            if mode == "sel_f32":
                onehot = ((posbest - base) == lane_i).astype(jnp.float32)
                return acc + jax.lax.dot_general(
                    onehot, rec, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            if mode == "sel_1pass":
                # precision floor probe: single bf16 pass (NOT exact)
                onehot = ((posbest - base) == lane_i).astype(jnp.bfloat16)
                return acc + jax.lax.dot_general(
                    onehot, rec.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if mode == "sel_1pass48":
                # N-independence probe: one pass, 48-wide stationary
                onehot = ((posbest - base) == lane_i).astype(jnp.bfloat16)
                rec48 = jnp.concatenate(
                    [rec, rec, rec], axis=0).astype(jnp.bfloat16)
                out48 = jax.lax.dot_general(
                    onehot, rec48, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc + out48[:, :16] + out48[:, 16:32] * 1e-30
            if mode == "sel_chunk":
                a = acc
                for k in range(8):
                    oh = ((posbest - (base + k * 128))
                          == lane_i[:, :128]).astype(jnp.bfloat16)
                    for part in split3(rec[:, k * 128:(k + 1) * 128]):
                        a = a + jax.lax.dot_general(
                            oh, part, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                return a
            # sel_3split (shipped)
            onehot = ((posbest - base) == lane_i).astype(jnp.bfloat16)
            a = acc
            for part in split3(rec):
                a = a + jax.lax.dot_general(
                    onehot, part, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return a

        acc = jnp.zeros((band_px, _F), jnp.float32)
        rhead.wait()
        prec_ref[0, 0] = jax.lax.fori_loop(0, gn0, sel_body, acc)

    kernel.__name__ = kernel.__qualname__ = f"kernel_{mode}"
    return kernel


def run_mode(mode, vndc, faces, height, width, tile_h, reps=5):
    bsz = vndc.shape[0]
    tile_w = ((width + 127) // 128) * 128
    n_bands = (height + tile_h - 1) // tile_h
    band_px = tile_h * tile_w

    @jax.jit
    def fn(verts, faces):
        glo, gn, coeffs = RP._band_windows(verts, faces, height, width,
                                           tile_h, tile_w, False)
        setup_g = RP._group_layout(coeffs)
        out = pl.pallas_call(
            make_kernel(mode, tile_h, tile_w, band_px),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(bsz, n_bands),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                scratch_shapes=[
                    pltpu.VMEM((_WINDOW, _F, _GLANES), jnp.float32),
                    pltpu.VMEM((_WINDOW, _F, _GLANES), jnp.float32),
                    pltpu.SemaphoreType.DMA((6,))],
                out_specs=[
                    pl.BlockSpec((1, 1, band_px, 1),
                                 lambda b, t, *_: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, band_px, _F),
                                 lambda b, t, *_: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, band_px, 1),
                                 lambda b, t, *_: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bsz, n_bands, band_px, 1), jnp.int32),
                jax.ShapeDtypeStruct((bsz, n_bands, band_px, _F),
                                     jnp.float32),
                jax.ShapeDtypeStruct((bsz, n_bands, band_px, 1),
                                     jnp.float32)],
        )(glo, gn, setup_g, setup_g)
        return out[0], jnp.sum(out[0])

    out, chk = fn(vndc, faces)
    _ = float(chk)
    t0 = time.time()
    for _ in range(reps):
        out, chk = fn(vndc, faces)
    _ = float(chk)
    return (time.time() - t0) / reps, out


def main():
    cfg = default_config()
    assets = synthetic_bfm(cfg, 0)
    bfm = device_bfm(assets)

    @jax.jit
    def geom_fn(cv, bfm):
        return coeffs_to_geometry(split_coeff(cv, cfg), bfm, cfg).verts_ndc

    b = int(os.environ.get("BATCH", "64"))
    tile_h = int(os.environ.get("TILEH", "2"))
    h = w = int(os.environ.get("SIZE", "224"))
    vndc = geom_fn(
        jnp.asarray(sample_coeffs(np.random.default_rng(0), cfg, b)), bfm)
    jax.block_until_ready(vndc)
    print(f"geom ready (tile_h={tile_h} size={h})", flush=True)
    modes = os.environ.get(
        "MODES", "loop_only,eval_nored,full,full_sel").split(",")
    for mode in modes:
        try:
            dt, out = run_mode(mode, vndc, bfm.faces, h, w, tile_h)
            print(f"{mode:10s}: {dt*1000:7.1f} ms/{b} -> {b/dt:7.0f} faces/s",
                  flush=True)
        except Exception as e:
            print(f"{mode:10s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
