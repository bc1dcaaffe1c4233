"""Micro-probes for the serving CNN's off-roofline stages (stem 1.73,
stage1 2.60, stage2 2.67 ms/128 vs ~0.7/1.2/1.5 roofline — cnn_probe).

Questions measured here, each a one-line experiment:
  1. does XLA pad C=64 NHWC activations to 128 lanes in HBM (2x traffic
     for all of stage1)?  -> time relu on (B,56,56,64) vs (B,56,28,128)
  2. stem: reduce_window maxpool vs max-of-9-strided-slices
  3. stem: s2d 4x4 conv vs native 7x7/s2 conv (XLA may s2d internally)

  BATCH=128 python benchmarks/cnn_micro_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


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
    print(f"{tag:36s}: {dt*1000:7.2f} ms  [compile {ct:.0f}s]", flush=True)
    return dt


def main():
    batch = int(os.environ.get("BATCH", "128"))
    rng = np.random.default_rng(0)

    # --- 1. lane-padding traffic probe ---
    x64 = jnp.asarray(rng.random((batch, 56, 56, 64)), jnp.bfloat16)
    x128 = jnp.asarray(rng.random((batch, 56, 28, 128)), jnp.bfloat16)
    xf64 = x64.astype(jnp.float32)
    timed("relu (B,56,56,64) bf16", lambda x: jnp.sum(
        nn.relu(x).astype(jnp.float32)), x64)
    timed("relu (B,56,28,128) bf16", lambda x: jnp.sum(
        nn.relu(x).astype(jnp.float32)), x128)
    timed("relu (B,56,56,64) f32", lambda x: jnp.sum(nn.relu(x)), xf64)

    # --- 2/3. stem variants: all compute stem conv + relu + maxpool ---
    img = jnp.asarray(rng.random((batch, 224, 224, 3)), jnp.float32)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.float32)
    from facerecon_tpu.models.fused import _stem_to_s2d
    w4 = jnp.asarray(_stem_to_s2d(np.asarray(w7)))
    b0 = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)

    def s2d(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                     4 * c)

    def conv4(x):
        y = jax.lax.conv_general_dilated(
            s2d(x.astype(jnp.bfloat16)), w4.astype(jnp.bfloat16),
            (1, 1), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y + b0).astype(jnp.bfloat16)

    def conv7(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w7.astype(jnp.bfloat16),
            (2, 2), ((2, 3), (2, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y + b0).astype(jnp.bfloat16)

    def pool_rw(y):
        return nn.max_pool(nn.relu(y), (3, 3), strides=(2, 2),
                           padding="SAME")

    def pool_slices(y):
        y = nn.relu(y)
        # SAME 3x3/s2 on 112: out 56, window rows 2i-1..2i+1
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=-jnp.inf)
        parts = [yp[:, a:a + 112:2, b:b + 112:2, :]
                 for a in range(3) for b in range(3)]
        out = parts[0]
        for p in parts[1:]:
            out = jnp.maximum(out, p)
        return out

    timed("stem s2d-conv4 + rw-pool", lambda x: jnp.sum(
        pool_rw(conv4(x)).astype(jnp.float32)), img)
    timed("stem s2d-conv4 + slice-pool", lambda x: jnp.sum(
        pool_slices(conv4(x)).astype(jnp.float32)), img)
    timed("stem conv7/s2 + rw-pool", lambda x: jnp.sum(
        pool_rw(conv7(x)).astype(jnp.float32)), img)
    timed("stem conv7/s2 + slice-pool", lambda x: jnp.sum(
        pool_slices(conv7(x)).astype(jnp.float32)), img)
    timed("stem conv4 only", lambda x: jnp.sum(
        conv4(x).astype(jnp.float32)), img)
    timed("s2d only", lambda x: jnp.sum(
        s2d(x).astype(jnp.bfloat16).astype(jnp.float32)), img)

    # --- stage1 single block conv costs, isolated ---
    w1a = jnp.asarray(rng.standard_normal((1, 1, 256, 64)) * .05,
                      jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * .05, jnp.bfloat16)
    w1b = jnp.asarray(rng.standard_normal((1, 1, 64, 256)) * .05,
                      jnp.bfloat16)
    x256 = jnp.asarray(rng.random((batch, 56, 56, 256)), jnp.bfloat16)

    def block(x):
        co = lambda x, w, s=1: jax.lax.conv_general_dilated(
            x, w, (s, s), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        y = nn.relu(co(x, w1a))
        y = nn.relu(co(y, w3))
        y = co(y, w1b)
        return nn.relu(y + x)

    timed("stage1 block (256->64->64->256)", lambda x: jnp.sum(
        block(x).astype(jnp.float32)), x256)
    timed("  1x1 256->64 alone", lambda x: jnp.sum(
        jax.lax.conv_general_dilated(
            x, w1a, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16).astype(jnp.float32)), x256)
    x64b = jnp.asarray(rng.random((batch, 56, 56, 64)), jnp.bfloat16)
    timed("  3x3 64->64 alone", lambda x: jnp.sum(
        jax.lax.conv_general_dilated(
            x, w3, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16).astype(jnp.float32)), x64b)
    timed("  1x1 64->256 alone", lambda x: jnp.sum(
        jax.lax.conv_general_dilated(
            x, w1b, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16).astype(jnp.float32)), x64b)


if __name__ == "__main__":
    main()
