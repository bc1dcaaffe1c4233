"""Smoke-test + microbenchmark for the LOOPED chunk-eval pattern
(round-5 structural fix for the Mosaic unroll wall): a fori_loop whose
trip count is popcount(mask_word), carrying the mask word as a scalar,
extracting each live chunk index with a branchless ctz bit-twiddle and
evaluating it through a dynamic pl.ds lane slice. Validates that Mosaic
compiles the pattern and measures per-live-chunk cost vs the unrolled
per-bit pl.when version the shipped kernel uses.
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

_CHUNK = 128
COL_PX = 112


def _ctz32(m):
    """Branchless count-trailing-zeros of a nonzero int32 word using only
    plain scalar ops (Mosaic has no ctz/clz primitive guarantee)."""
    m = m.astype(jnp.uint32)
    k = jnp.uint32(0)
    for shift in (16, 8, 4, 2, 1):
        low = (jnp.uint32(1) << shift) - jnp.uint32(1)
        z = (m & low) == 0
        k = k + jnp.where(z, jnp.uint32(shift), jnp.uint32(0))
        m = jnp.where(z, m >> shift, m)
    return k.astype(jnp.int32)


def _popcount32(m):
    m = m.astype(jnp.uint32)
    m = m - ((m >> 1) & jnp.uint32(0x55555555))
    m = (m & jnp.uint32(0x33333333)) + ((m >> 2) & jnp.uint32(0x33333333))
    m = (m + (m >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((m * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def kernel(mask_ref, setup_hbm, out_ref, scr_s, scr_az, sem, *, looped):
    t = pl.program_id(0)
    d = pltpu.make_async_copy(setup_hbm.at[:, pl.ds(0, 64 * _CHUNK)],
                              scr_s.at[:, :], sem.at[0])
    d.start()
    d.wait()
    scr_az[...] = jnp.full((COL_PX, _CHUNK), jnp.inf, jnp.float32)
    m0 = mask_ref[0, t]

    def chunk_eval(k):
        off = pl.multiple_of(k * _CHUNK, _CHUNK)
        cf = lambda f: scr_s[f:f + 1, pl.ds(off, _CHUNK)]
        pxc = jax.lax.broadcasted_iota(
            jnp.int32, (COL_PX, 1), 0).astype(jnp.float32)
        e0 = cf(0) * pxc + cf(1)
        e1 = cf(2) * pxc + cf(3)
        ez = cf(4) * pxc + cf(5)
        cov = (e0 >= 0.0) & (e1 >= 0.0) & (e0 + e1 <= 1.0)
        zm = jnp.where(cov, ez, jnp.inf)
        scr_az[...] = jnp.minimum(scr_az[...], zm)

    if looped:
        def body(i, m):
            chunk_eval(_ctz32(m))
            mu = m.astype(jnp.uint32)
            return (mu & (mu - 1)).astype(jnp.int32)

        jax.lax.fori_loop(0, _popcount32(m0), body, m0)
    else:
        for i in range(32):
            pl.when(((m0 >> i) & 1) != 0)(lambda i=i: chunk_eval(i))

    out_ref[0] = jnp.min(scr_az[...], axis=1, keepdims=True)


def main():
    n_prog = 2048
    rng = np.random.default_rng(0)
    setup = jnp.asarray(rng.standard_normal((8, 64 * _CHUNK)),
                        jnp.float32)
    for live in (4, 8, 16, 32):
        bits = np.zeros((1, n_prog), np.int64)
        for r in range(n_prog):
            idx = rng.choice(32, size=live, replace=False)
            bits[0, r] = int(np.sum(1 << idx.astype(np.int64)))
        mask = jnp.asarray(bits.astype(np.uint32).view(np.int32))
        for looped in (False, True):
            f = pl.pallas_call(
                functools.partial(kernel, looped=looped),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(n_prog,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                    scratch_shapes=[
                        pltpu.VMEM((8, 64 * _CHUNK), jnp.float32),
                        pltpu.VMEM((COL_PX, _CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,)),
                    ],
                    out_specs=[pl.BlockSpec((1, COL_PX, 1),
                                            lambda t, *_: (t, 0, 0),
                                            memory_space=pltpu.VMEM)],
                ),
                out_shape=[jax.ShapeDtypeStruct((n_prog, COL_PX, 1),
                                                jnp.float32)],
            )
            g = jax.jit(lambda m, s, f=f: f(m, s)[0])
            t0 = time.time()
            r = jax.block_until_ready(g(mask, setup))
            ct = time.time() - t0
            t0 = time.time()
            reps = 20
            for _ in range(reps):
                r = g(mask, setup)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / reps
            per_chunk = dt / n_prog / live * 1e9
            print(f"live={live:2d} looped={int(looped)} compile {ct:5.1f}s "
                  f"run {dt*1e3:7.3f} ms  {dt/n_prog*1e9:7.1f} ns/prog "
                  f"{per_chunk:6.1f} ns/chunk", flush=True)


if __name__ == "__main__":
    main()
