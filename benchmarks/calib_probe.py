"""Calibrate the chained-scan timing harness: every probe in this tree
times ops via an inner lax.scan; if each scan iteration carries a fixed
overhead (dispatch, carry round-trip, fusion-boundary sync), small ops
measure inflated. Here each case runs the op K times per iteration on
k-perturbed inputs: slope (t(K=4)-t(K=1))/3 = TRUE op cost, intercept =
harness overhead.

  python benchmarks/calib_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp


def timed(tag, fn, *args, inner=16, reps=3):
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
    print(f"{tag:32s}: {dt*1000:7.3f} ms  [compile {ct:.0f}s]", flush=True)
    return dt


def main():
    batch = int(os.environ.get("BATCH", "128"))
    key = jax.random.PRNGKey(0)

    # device-side init (host->device over the tunnel is minutes for GBs)
    @jax.jit
    def mk():
        x64 = jax.random.uniform(key, (batch, 56, 56, 64),
                                 jnp.bfloat16)
        pvr = jax.random.uniform(key, (batch, 70657), jnp.float32)
        bidx = jax.random.randint(key, (batch, 50176), 0, 70656)
        return x64, pvr, bidx

    x64, pvr, bidx = mk()
    _ = float(jnp.sum(bidx[:, 0]))

    def relu_k(k):
        def f(x):
            return sum(jnp.sum(jax.nn.relu(x * (1.0 + i * 1e-30))
                               .astype(jnp.float32)) for i in range(k))
        return f

    def talax_k(k):
        def f(x, idx):
            return sum(jnp.sum(jnp.take_along_axis(
                x * (1.0 + i * 1e-30), idx, axis=1)) for i in range(k))
        return f

    t1 = timed("relu64 K=1", relu_k(1), x64)
    t4 = timed("relu64 K=4", relu_k(4), x64)
    print(f"  -> relu64 true {1000*(t4-t1)/3:.3f} ms, "
          f"overhead {1000*(t1-(t4-t1)/3):.3f} ms", flush=True)
    g1 = timed("talax K=1", talax_k(1), pvr, bidx)
    g4 = timed("talax K=4", talax_k(4), pvr, bidx)
    print(f"  -> talax true {1000*(g4-g1)/3:.3f} ms, "
          f"overhead {1000*(g1-(g4-g1)/3):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
