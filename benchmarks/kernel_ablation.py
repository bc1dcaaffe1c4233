"""Ablation harness for the Pallas rasterizer kernel — identifies which
stage (affine eval / coverage / min-reduce / argmin / DMA) dominates.

Run on the TPU:  python benchmarks/kernel_ablation.py
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
_GROUP = 8
_ROW_PAD = 16
_BIG = 2 ** 30


def make_kernel(mode, tile_h, width_pad, band_px):
    def kernel(lo_ref, nc_ref, coeffs_hbm, pos_ref, z_ref, scratch, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        lo_chunk = lo_ref[b, t]
        n_chunks = nc_ref[b, t]
        n_groups = (n_chunks + _GROUP - 1) // _GROUP

        flat_i = jax.lax.broadcasted_iota(jnp.int32, (band_px, _CHUNK), 0)
        px = (flat_i % width_pad).astype(jnp.float32) + 0.5
        py = ((flat_i // width_pad).astype(jnp.float32)
              + jnp.float32(t * tile_h) + 0.5)
        lane = jax.lax.broadcasted_iota(jnp.int32, (band_px, _CHUNK), 1)

        def group_dma(slot, g):
            return pltpu.make_async_copy(
                coeffs_hbm.at[b, pl.ds(lo_chunk + g * _GROUP, _GROUP)],
                scratch.at[slot], sem.at[slot])

        @pl.when(n_groups > 0)
        def _():
            group_dma(0, 0).start()

        def group_body(g, carry):
            zbest, posbest = carry
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < n_groups)
            def _():
                group_dma(1 - slot, g + 1).start()
            group_dma(slot, g).wait()
            in_group = jnp.minimum(n_chunks - g * _GROUP, _GROUP)

            def chunk_body(j, carry):
                zbest, posbest = carry
                c = scratch[slot, j]
                if mode == "dma_only":
                    zbest = zbest + c[0:1, 0:1]  # touch data only
                    return zbest, posbest
                e0 = c[0:1] * px + c[1:2] * py + c[2:3]
                e1 = c[3:4] * px + c[4:5] * py + c[5:6]
                ez = c[6:7] * px + c[7:8] * py + c[8:9]
                if mode == "eval_only":
                    zbest = zbest + jnp.sum(e0 + e1 + ez, axis=1,
                                            keepdims=True) * 1e-30
                    return zbest, posbest
                cov = (e0 >= 0.0) & (e1 >= 0.0) & (e0 + e1 <= 1.0)
                zm = jnp.where(cov, ez, jnp.inf)
                zmin = jnp.min(zm, axis=1, keepdims=True)
                if mode == "no_argmin":
                    zbest = jnp.minimum(zbest, zmin)
                    return zbest, posbest
                win = jnp.min(jnp.where(zm == zmin, lane, _BIG),
                              axis=1, keepdims=True)
                better = zmin < zbest
                zbest = jnp.where(better, zmin, zbest)
                posbest = jnp.where(
                    better, (lo_chunk + g * _GROUP + j) * _CHUNK + win,
                    posbest)
                return zbest, posbest

            return jax.lax.fori_loop(0, in_group, chunk_body,
                                     (zbest, posbest))

        init = (jnp.full((band_px, 1), jnp.inf, jnp.float32),
                jnp.full((band_px, 1), -1, jnp.int32))
        zbest, posbest = jax.lax.fori_loop(0, n_groups, group_body, init)
        pos_ref[0, 0] = posbest
        z_ref[0, 0] = zbest
    return kernel


def run_mode(mode, vndc, faces, height=224, width=224, tile_h=8):
    bsz = vndc.shape[0]
    width_pad = ((width + 127) // 128) * 128
    n_bands = (height + tile_h - 1) // tile_h
    band_px = tile_h * width_pad

    @jax.jit
    def fn(verts):
        setup = jax.vmap(lambda v: bin_triangles(
            v, faces, height, width, tile_h))(verts)
        f = setup.coeffs.shape[1]
        lo_chunk = setup.band_lo // _CHUNK
        n_chunks = (setup.band_hi + _CHUNK - 1) // _CHUNK - lo_chunk
        n_chunks = jnp.maximum(n_chunks, 0).astype(jnp.int32)
        nct = ((f + _CHUNK - 1) // _CHUNK + _GROUP - 1) // _GROUP * _GROUP + _GROUP
        pad_f = nct * _CHUNK - f
        coeffs = jnp.pad(setup.coeffs,
                         ((0, 0), (0, pad_f), (0, _ROW_PAD - SETUP_WIDTH)))
        coeffs = coeffs.at[:, f:, 2].set(-3e38).at[:, f:, 5].set(-3e38)
        ck = jnp.swapaxes(coeffs.reshape(bsz, nct, _CHUNK, _ROW_PAD), 2, 3)
        return pl.pallas_call(
            make_kernel(mode, tile_h, width_pad, band_px),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(bsz, n_bands),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                scratch_shapes=[
                    pltpu.VMEM((2, _GROUP, _ROW_PAD, _CHUNK), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))],
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

    out = fn(vndc)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = fn(vndc)
    jax.block_until_ready(out)
    return (time.time() - t0) / 5


def main():
    cfg = default_config()
    assets = synthetic_bfm(cfg, 0)
    bfm = device_bfm(assets)
    geom = jax.jit(lambda cv: coeffs_to_geometry(
        split_coeff(cv, cfg), bfm, cfg).verts_ndc)
    b = int(os.environ.get("BATCH", "64"))
    vndc = geom(jnp.asarray(sample_coeffs(np.random.default_rng(0), cfg, b)))
    jax.block_until_ready(vndc)
    print("geom ready", flush=True)
    for mode in ["dma_only", "eval_only", "no_argmin", "full"]:
        try:
            dt = run_mode(mode, vndc, bfm.faces)
            print(f"{mode:10s}: {dt*1000:7.1f} ms/{b} -> {b/dt:7.0f} faces/s",
                  flush=True)
        except Exception as e:
            print(f"{mode:10s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
