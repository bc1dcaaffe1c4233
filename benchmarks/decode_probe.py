"""Times the POST-KERNEL glue of the shaded render path: the
(B, n_bands, 16, band_px) bf16 packed kernel output -> (tri_id, color,
bary) planes (transpose + _unband + plane decode), isolated on a dummy
tensor — the headline attribution showed ~20 ms/128 between the
shade-mode pallas_call floor and the full rasterize_shaded stage.

  BATCH=128 python benchmarks/decode_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu.ops import rasterize_pallas as RP


def timed(tag, fn, *args, inner=8, reps=3):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            s = fn(a[0] * (1 + carry * 1e-30), *a[1:])
            return s * 1e-30, s
        _, ss = jax.lax.scan(body, jnp.bfloat16(0), None, length=inner)
        return jnp.sum(ss.astype(jnp.float32))

    t0 = time.time()
    _ = float(chained(*args))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = chained(*args)
    _ = float(out)
    dt = (time.time() - t0) / (reps * inner)
    print(f"{tag:30s}: {dt*1000:7.2f} ms  [compile {ct:.0f}s]", flush=True)
    return dt


def main():
    batch = int(os.environ.get("BATCH", "128"))
    size = int(os.environ.get("SIZE", "224"))
    tile_h, n_cols = 4, 7
    tile_w = RP.col_width(size, n_cols) * n_cols
    n_bands = (size + tile_h - 1) // tile_h
    band_px = tile_h * tile_w
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.random((batch, n_bands, RP._OUT_S, band_px)),
                         jnp.bfloat16)
    h = w = size

    def decode(packed):
        p = jnp.transpose(packed, (0, 2, 1, 3))
        p = RP._unband(p.reshape(batch, RP._OUT_S, n_bands * band_px),
                       batch, n_bands, tile_h, tile_w, n_cols, h, w,
                       fields=RP._OUT_S)

        def plane(k):
            return p[:, k].astype(jnp.float32)

        pos = (plane(10).astype(jnp.int32)
               + plane(11).astype(jnp.int32) * 256
               + plane(12).astype(jnp.int32) * 65536) - 1
        hit = (pos >= 0) & (pos < 70789)
        pos = jnp.where(hit, pos, -1)
        w0 = plane(6) + plane(7)
        w1 = plane(8) + plane(9)
        color = jnp.stack([jnp.where(hit, plane(2 * c) + plane(2 * c + 1),
                                     0.0) for c in range(3)], axis=-1)
        bary = jnp.stack([jnp.where(hit, v, 0.0)
                          for v in (w0, w1, 1.0 - w0 - w1)], axis=-1)
        return (jnp.sum(color[:, ::64, ::64]) + jnp.sum(bary[:, ::64, ::64])
                + jnp.sum(pos[:, ::64, ::64])).astype(jnp.bfloat16)

    def transpose_only(packed):
        p = jnp.transpose(packed, (0, 2, 1, 3))
        p = RP._unband(p.reshape(batch, RP._OUT_S, n_bands * band_px),
                       batch, n_bands, tile_h, tile_w, n_cols, h, w,
                       fields=RP._OUT_S)
        return jnp.sum(p[:, :, ::64, ::64].astype(jnp.float32)).astype(
            jnp.bfloat16)

    def onepass(packed):
        # merged single transpose: (B,nb,16,cols,th,cw)->(B,16,nb,th,cols,cw)
        p = packed.reshape(batch, n_bands, RP._OUT_S, n_cols, tile_h,
                           tile_w // n_cols)
        p = jnp.transpose(p, (0, 2, 1, 4, 3, 5))
        p = p.reshape(batch, RP._OUT_S, n_bands * tile_h,
                      tile_w)[:, :, :h, :w]
        return jnp.sum(p[:, :, ::64, ::64].astype(jnp.float32)).astype(
            jnp.bfloat16)

    timed("transpose+unband only", transpose_only, packed)
    timed("merged one-pass relayout", onepass, packed)
    timed("full decode", decode, packed)


if __name__ == "__main__":
    main()
