"""Ablation harness for the Pallas rasterizer kernel (single-DMA-per-band
structure) — isolates loop overhead / affine eval / reductions / argmin and
tests an MXU-eval variant.

Run on the TPU:  python benchmarks/kernel_ablation.py
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
from facerecon_tpu.ops.binning import bin_triangles, SETUP_WIDTH

_CHUNK = 128
_WINDOW = 64
_ROW_PAD = 16


def make_kernel(mode, tile_h, width_pad, band_px):
    def kernel(lo_ref, nc_ref, coeffs_hbm, pos_ref, z_ref, scratch, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        lo_chunk = lo_ref[b, t]
        n_chunks = nc_ref[b, t]

        dma = pltpu.make_async_copy(
            coeffs_hbm.at[b, pl.ds(lo_chunk, _WINDOW)], scratch, sem)
        dma.start()

        flat_i = jax.lax.broadcasted_iota(jnp.int32, (band_px, _CHUNK), 0)
        px = (flat_i % width_pad).astype(jnp.float32) + 0.5
        py = ((flat_i // width_pad).astype(jnp.float32)
              + jnp.float32(t * tile_h) + 0.5)
        lane_f = jax.lax.broadcasted_iota(
            jnp.int32, (band_px, _CHUNK), 1).astype(jnp.float32)
        # (band_px, 3) pixel matrix for the MXU variant
        col_i = jax.lax.broadcasted_iota(jnp.int32, (band_px, 3), 0)
        sel = jax.lax.broadcasted_iota(jnp.int32, (band_px, 3), 1)
        pxc = (col_i % width_pad).astype(jnp.float32) + 0.5
        pyc = ((col_i // width_pad).astype(jnp.float32)
               + jnp.float32(t * tile_h) + 0.5)
        pix = jnp.where(sel == 0, pxc, jnp.where(sel == 1, pyc, 1.0))

        dma.wait()

        def chunk_body(j, carry):
            zbest, posbest = carry
            c = scratch[j]
            if mode == "loop_only":
                zbest = zbest + c[0:1, 0:1]
                return zbest, posbest
            if mode in ("mxu", "mxu_full"):
                def affine(sl):
                    return jax.lax.dot_general(
                        pix, c[sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                e0 = affine(slice(0, 3))
                e1 = affine(slice(3, 6))
                ez = affine(slice(6, 9))
            else:
                e0 = c[0:1] * px + c[1:2] * py + c[2:3]
                e1 = c[3:4] * px + c[4:5] * py + c[5:6]
                ez = c[6:7] * px + c[7:8] * py + c[8:9]
            if mode == "eval_only":
                zbest = jnp.minimum(zbest, jnp.min(
                    e0 + e1 + ez, axis=1, keepdims=True))
                return zbest, posbest
            cov = (e0 >= 0.0) & (e1 >= 0.0) & (e0 + e1 <= 1.0)
            zm = jnp.where(cov, ez, jnp.inf)
            zmin = jnp.min(zm, axis=1, keepdims=True)
            if mode in ("no_argmin", "mxu"):
                zbest = jnp.minimum(zbest, zmin)
                return zbest, posbest
            win_f = jnp.min(jnp.where(zm == zmin, lane_f, 3e38),
                            axis=1, keepdims=True)
            better = zmin < zbest
            zbest = jnp.where(better, zmin, zbest)
            posbest = jnp.where(
                better, (lo_chunk + j) * _CHUNK + win_f.astype(jnp.int32),
                posbest)
            return zbest, posbest

        init = (jnp.full((band_px, 1), jnp.inf, jnp.float32),
                jnp.full((band_px, 1), -1, jnp.int32))
        zbest, posbest = jax.lax.fori_loop(
            0, jnp.minimum(n_chunks, _WINDOW), chunk_body, init)
        pos_ref[0, 0] = posbest
        z_ref[0, 0] = zbest
    # distinct name per mode: identically-named kernels with identical
    # signatures can collide in executable caches
    kernel.__name__ = f"kernel_{mode}"
    kernel.__qualname__ = f"kernel_{mode}"
    return kernel


def run_mode(mode, vndc, faces, height=224, width=224, tile_h=8, reps=5):
    bsz = vndc.shape[0]
    width_pad = ((width + 127) // 128) * 128
    n_bands = (height + tile_h - 1) // tile_h
    band_px = tile_h * width_pad

    @jax.jit
    def fn(verts, faces):
        setup = jax.vmap(lambda v: bin_triangles(
            v, faces, height, width, tile_h))(verts)
        f = setup.coeffs.shape[1]
        lo_chunk = setup.band_lo // _CHUNK
        n_chunks = (setup.band_hi + _CHUNK - 1) // _CHUNK - lo_chunk
        n_chunks = jnp.maximum(n_chunks, 0).astype(jnp.int32)
        nct = (f + _CHUNK - 1) // _CHUNK + _WINDOW
        pad_f = nct * _CHUNK - f
        coeffs = jnp.pad(setup.coeffs,
                         ((0, 0), (0, pad_f), (0, _ROW_PAD - SETUP_WIDTH)))
        coeffs = coeffs.at[:, f:, 2].set(-3e38).at[:, f:, 5].set(-3e38)
        ck = jnp.swapaxes(coeffs.reshape(bsz, nct, _CHUNK, _ROW_PAD), 2, 3)
        return pl.pallas_call(
            make_kernel(mode, tile_h, width_pad, band_px),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(bsz, n_bands),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                scratch_shapes=[
                    pltpu.VMEM((_WINDOW, _ROW_PAD, _CHUNK), jnp.float32),
                    pltpu.SemaphoreType.DMA(())],
                out_specs=[
                    pl.BlockSpec((1, 1, band_px, 1),
                                 lambda b, t, *_: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, band_px, 1),
                                 lambda b, t, *_: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bsz, n_bands, band_px, 1), jnp.int32),
                jax.ShapeDtypeStruct((bsz, n_bands, band_px, 1), jnp.float32)],
        )(lo_chunk.astype(jnp.int32), n_chunks, ck)

    out = fn(vndc, faces)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(vndc, faces)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    cfg = default_config()
    assets = synthetic_bfm(cfg, 0)
    bfm = device_bfm(assets)

    @jax.jit
    def geom_fn(cv, bfm):
        return coeffs_to_geometry(split_coeff(cv, cfg), bfm, cfg).verts_ndc

    b = int(os.environ.get("BATCH", "64"))
    vndc = geom_fn(
        jnp.asarray(sample_coeffs(np.random.default_rng(0), cfg, b)), bfm)
    jax.block_until_ready(vndc)
    print("geom ready", flush=True)
    modes = os.environ.get(
        "MODES", "loop_only,eval_only,no_argmin,mxu,full,mxu_full").split(",")
    ref = None
    for mode in modes:
        try:
            dt, out = run_mode(mode, vndc, bfm.faces)
            extra = ""
            if mode == "full":
                ref = np.asarray(out[0])
            if mode == "mxu_full" and ref is not None:
                extra = f"  (pos match full: {(np.asarray(out[0]) == ref).mean():.4f})"
            print(f"{mode:10s}: {dt*1000:7.1f} ms/{b} -> {b/dt:7.0f} faces/s"
                  + extra, flush=True)
        except Exception as e:
            print(f"{mode:10s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
