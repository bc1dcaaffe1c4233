"""TPU gather-form microbenchmark for the producer corner gathers.

The render-record producer is dominated by mesh-indirection gathers
(corner gather (B,3F,C) 12.1 ms/128, normals adjacency 7.3 ms/128 at
224px) running ~10x above their HBM traffic bound — TPU gathers cost
per ROW, not per byte. This probe measures the forms available so the
producer uses the cheapest one:

  BATCH=128 python benchmarks/gather_probe.py
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
            s = fn(a[0] * (1.0 + carry * 1e-30), *a[1:])
            return s * 1e-30, s
        _, ss = jax.lax.scan(body, 0.0, None, length=inner)
        return jnp.sum(ss)

    t0 = time.time()
    _ = float(chained(*args))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = chained(*args)
    _ = float(out)
    dt = (time.time() - t0) / (reps * inner)
    print(f"{tag:34s}: {dt*1000:7.2f} ms  [compile {ct:.0f}s]", flush=True)
    return dt


def main():
    batch = int(os.environ.get("BATCH", "128"))
    n = 35709
    f3 = 3 * 70789
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, size=(f3,)), jnp.int32)
    pv5 = jnp.asarray(rng.random((batch, n, 5)), jnp.float32)
    pv8 = jnp.asarray(rng.random((batch, n, 8)), jnp.float32)
    pvt = jnp.asarray(rng.random((batch, 6, n)), jnp.float32)
    pv1 = jnp.asarray(rng.random((batch, n)), jnp.float32)

    timed("rows (B,3F,5) <- (B,N,5)", lambda x: jnp.sum(
        jnp.take(x, idx, axis=1)), pv5)
    timed("rows (B,3F,8) <- (B,N,8)", lambda x: jnp.sum(
        jnp.take(x, idx, axis=1)), pv8)
    timed("lanes (B,6,3F) <- (B,6,N) ax-1", lambda x: jnp.sum(
        jnp.take(x, idx, axis=2)), pvt)
    timed("lanes (B,3F) <- (B,N) ax-1", lambda x: jnp.sum(
        jnp.take(x, idx, axis=1)), pv1)
    timed("lanes 6x(B,3F) <- 6x(B,N)", lambda x: sum(
        jnp.sum(jnp.take(x * (1.0 + k * 1e-30), idx, axis=1))
        for k in range(6)), pv1)
    # PER-IMAGE index gathers (take_along_axis): the select-by-gather
    # candidate — kernel emits per-pixel winner ROW, XLA gathers the
    # shading fields from (B, rows) f32 planes. Indices differ per
    # image (unlike every case above), so this is a batched gather.
    px, rows = 50176, 70657
    pvr = jnp.asarray(rng.random((batch, rows)), jnp.float32)
    pvr16 = jnp.asarray(rng.random((batch, 16, rows)), jnp.float32)
    bidx = jnp.asarray(rng.integers(0, rows, size=(batch, px)), jnp.int32)

    timed("talax (B,px) <- (B,rows)", lambda x: jnp.sum(
        jnp.take_along_axis(x, bidx, axis=1)), pvr)
    timed("talax 16x(B,px) <- 16x(B,rows)", lambda x: sum(
        jnp.sum(jnp.take_along_axis(x * (1.0 + k * 1e-30), bidx, axis=1))
        for k in range(16)), pvr)
    timed("talax (B,16,px) <- (B,16,rows)", lambda x: jnp.sum(
        jnp.take_along_axis(x, bidx[:, None, :], axis=2)), pvr16)

    # one_hot matmul form: (3F, N) one-hot @ (B, N, C) - MXU gather
    # (prohibitive memory at full size; scaled-down sanity only)
    # adjacency-style: (B,N,deg,3) <- (B,F,3) rows
    deg = 6
    adj = jnp.asarray(rng.integers(0, 70789, size=(n, deg)), jnp.int32)
    fn3 = jnp.asarray(rng.random((batch, 70789, 3)), jnp.float32)
    timed("adj rows (B,N*deg,3)+sum", lambda x: jnp.sum(
        jnp.take(x, adj.reshape(-1), axis=1).reshape(batch, n, deg, 3)
        .sum(2)), fn3)
    timed("adj per-k 6x(B,N,3) summed", lambda x: jnp.sum(
        sum(jnp.take(x * (1.0 + k * 1e-30), adj[:, k], axis=1)
            for k in range(deg))), fn3)


if __name__ == "__main__":
    main()
