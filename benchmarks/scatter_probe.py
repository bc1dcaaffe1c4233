"""Scatter-min / element-gather rate probe (TPU).

Sizes the 'analytic per-triangle pixel + pixel-keyed scatter-min'
rasterizer design: sub-pixel triangles (96% cover <=1 pixel center at
224px, benchmarks/pair_stats.py) make per-pixel candidate EVAL pay
~15 VPU ops x 23-47M pairs/image, while the information content is
~2 (pixel, z-key) records per triangle. If scatter-min runs at
~1-2 cycles/element, phase 1 becomes O(K*F) instead of O(pairs) and,
critically, resolution-independent (the 512px eval explodes 5x; a
scatter does not).

Exactness plan measured here:
  pass 1: zmin_bits[p] = min over tris at p of bitcast_u32(z)   (z > 0:
          IEEE bits are order-isomorphic to the float order)
  gather: each candidate reads zmin_bits at its pixel
  pass 2: idw[p] = min over tris with bits == zmin of id

  BATCH=128 M=43008 python benchmarks/scatter_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def timed(tag, fn, *args, inner=8, reps=3):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            s = fn(*a, seed=carry)
            return s * 1e-30, s
        _, ss = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return jnp.sum(ss)

    t0 = time.time()
    _ = float(chained(*args))
    print(f"{tag}: compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = chained(*args)
    _ = float(out)
    dt = (time.time() - t0) / (reps * inner)
    b = int(os.environ.get("BATCH", "128"))
    print(f"{tag}: {dt*1000:7.2f} ms/{b}", flush=True)


def main():
    batch = int(os.environ.get("BATCH", "128"))
    m = int(os.environ.get("M", "43008"))        # ~2 candidates x 21k tris
    size = int(os.environ.get("SIZE", "224"))
    hw = size * size
    rng = np.random.default_rng(0)
    # clustered pixel targets (mesh-like: many tris -> few pixels)
    idx = jnp.asarray(
        np.minimum((rng.random((batch, m)) ** 2 * hw), hw - 1).astype(
            np.int32))
    zb = jnp.asarray(
        rng.integers(1 << 20, 1 << 30, (batch, m), dtype=np.int64).astype(
            np.uint32))
    ids = jnp.asarray(rng.integers(0, 1 << 20, (batch, m),
                                   dtype=np.int64).astype(np.uint32))
    boff = jnp.arange(batch, dtype=jnp.int32)[:, None] * hw

    def scat1(idx, zb, ids, seed):
        gi = (idx + boff + (seed * 1e-30).astype(jnp.int32)).reshape(-1)
        out = jnp.full((batch * hw,), 0xFFFFFFFF, jnp.uint32)
        out = out.at[gi].min(zb.reshape(-1), mode="drop")
        return out[0].astype(jnp.float32)

    def scat2(idx, zb, ids, seed):
        gi = (idx + boff + (seed * 1e-30).astype(jnp.int32)).reshape(-1)
        zf = zb.reshape(-1)
        out = jnp.full((batch * hw,), 0xFFFFFFFF, jnp.uint32)
        out = out.at[gi].min(zf, mode="drop")
        zmin_at = out[gi]                        # element gather back
        idw = jnp.where(zmin_at == zf, ids.reshape(-1),
                        jnp.uint32(0xFFFFFFFF))
        out2 = jnp.full((batch * hw,), 0xFFFFFFFF, jnp.uint32)
        out2 = out2.at[gi].min(idw, mode="drop")
        return (out[0] + out2[1]).astype(jnp.float32)

    def gath(idx, zb, ids, seed):
        gi = (idx + boff + (seed * 1e-30).astype(jnp.int32)).reshape(-1)
        src = jnp.zeros((batch * hw,), jnp.uint32) + zb[0, 0]
        return src[gi].sum().astype(jnp.float32)

    def segsort(idx, zb, ids, seed):
        # sort-based alternative: per-batch key sort ((pixel<<32|z) would
        # need u64; proxy with two u32 sorts to size the cost)
        k = idx + (seed * 1e-30).astype(jnp.int32)
        s = jnp.sort(k, axis=1)
        return s[0, 0].astype(jnp.float32)

    timed("scatter-min u32 1-pass", scat1, idx, zb, ids)
    timed("scatter-min 2-pass+gather", scat2, idx, zb, ids)
    timed("element gather", gath, idx, zb, ids)
    timed("sort (proxy)", segsort, idx, zb, ids)


if __name__ == "__main__":
    main()
