"""Device-true render-chain benchmark: geometry + rasterize + select +
shade (the full differentiable render), forward and forward+backward.

  python benchmarks/render_bench.py [--batch 64] [--size 224] [--bwd]

Reps are chained inside ONE jit dispatch (scan with a data dependency)
because per-dispatch round trips over the axon tunnel are tens of ms and
jax.block_until_ready is unreliable there — sync is a dependent scalar
fetch.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu.config import default_config
from facerecon_tpu.data.synthetic import sample_coeffs
from facerecon_tpu.ops.geometry import device_bfm
from facerecon_tpu.ops.losses import total_loss
from facerecon_tpu.ops.render import render_coeffs
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inner", type=int, default=8,
                    help="chained steps per dispatch")
    ap.add_argument("--tileh", type=int, default=None)
    ap.add_argument("--bwd", action="store_true",
                    help="measure forward+backward (grad wrt coeffs)")
    args = ap.parse_args()

    size = args.size
    tile_h = args.tileh if args.tileh is not None else (2 if size <= 256
                                                        else 1)
    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0,
                        tile_h=tile_h)
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(sample_coeffs(rng, cfg, args.batch))
    target = jnp.zeros((args.batch, size, size, 3), jnp.float32)

    def fwd_one(cv):
        out = render_coeffs(split_coeff(cv, cfg), bfm, cfg)
        return jnp.mean(out.image)

    def bwd_one(cv):
        def loss_fn(c):
            out = render_coeffs(split_coeff(c, cfg), bfm, cfg,
                                background=target)
            return total_loss(out, split_coeff(c, cfg), target, None, bfm,
                              cfg)[0]
        loss, grad = jax.value_and_grad(loss_fn)(cv)
        return loss + jnp.mean(grad)

    one = bwd_one if args.bwd else fwd_one

    @jax.jit
    def chained(cv):
        def body(carry, _):
            s = one(cv * (1.0 + carry * 1e-30))
            return s * 1e-30, s
        _, ss = jax.lax.scan(body, 0.0, None, length=args.inner)
        return jnp.sum(ss)

    t0 = time.time()
    _ = float(chained(coeffs))
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    for reps in (args.reps, 2 * args.reps):
        t0 = time.time()
        for _ in range(reps):
            out = chained(coeffs)
        _ = float(out)
        dt = (time.time() - t0) / (reps * args.inner)
        tag = "fwd+bwd" if args.bwd else "fwd"
        print(f"{tag} chain reps={reps}: {dt*1000:.1f} ms/{args.batch} -> "
              f"{args.batch/dt:.0f} faces/s", flush=True)


if __name__ == "__main__":
    main()
