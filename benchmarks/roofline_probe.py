"""Raw roofline measurement for THIS device (axon TPU v5 lite): HBM
copy bandwidth and MXU matmul rate, plus the chained-harness fixed
cost. Every perf target in STATUS.md assumes v5e paper specs (819 GB/s,
197 bf16 TFLOP/s); this pins what the tunnel-attached chip actually
delivers.

  python benchmarks/roofline_probe.py
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
    print(f"{tag:34s}: {dt*1000:8.3f} ms  [compile {ct:.0f}s]", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk():
        big = jax.random.uniform(key, (256, 1024, 1024), jnp.float32)  # 1 GB
        a = jax.random.uniform(key, (8192, 8192), jnp.bfloat16)
        b = jax.random.uniform(key, (8192, 8192), jnp.bfloat16)
        return big, a, b

    big, a, b = mk()
    _ = float(jnp.sum(big[0, 0, :2]))

    # HBM: read 1 GB + write 1 GB (the forced x*(1+eps) copy) + read for
    # the sum -> ~3 GB traffic per iteration
    t = timed("copy+sum 1GB f32", lambda x: jnp.sum(x[:, :, :8]), big)
    print(f"  -> approx HBM: {(2.147 + 0.0084) / t / 1e9:.0f} GB/s "
          f"(1GB read + 1GB write)", flush=True)

    # MXU: chained 8192^3 bf16 matmul = 1.1 TFLOP per iteration
    def mm(x, y):
        return jnp.sum(jax.lax.dot(x, y,
                                   preferred_element_type=jnp.float32))

    t = timed("matmul 8192^3 bf16", mm, a, b)
    flops = 2 * 8192**3
    print(f"  -> approx MXU: {flops / t / 1e12:.1f} TFLOP/s bf16",
          flush=True)

    # fixed harness cost: nearly-free body
    tiny = jnp.zeros((8, 128), jnp.float32)
    t = timed("empty body", lambda x: jnp.sum(x), tiny)
    print(f"  -> harness fixed cost {t*1000:.3f} ms/iteration", flush=True)


if __name__ == "__main__":
    main()
