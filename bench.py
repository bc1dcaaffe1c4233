"""Headline benchmark — BASELINE.md: faces/sec/chip, batch-256 regress +
render at 224x224 on one TPU v5e chip. Prints ONE JSON line.

  python bench.py            # full benchmark (compile can take minutes)
  BENCH_BATCH=64 python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

TARGET_FACES_PER_SEC = 5000.0  # BASELINE.json north-star


def main():
    from facerecon_tpu.config import default_config
    from facerecon_tpu.pipeline import (init_params, make_pipeline,
                                        make_reconstruct_fn)
    from facerecon_tpu.utils.bfm import synthetic_bfm

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    reps = int(os.environ.get("BENCH_REPS", "10"))

    cfg = default_config(batch_size=batch)
    assets = synthetic_bfm(cfg, seed=0)
    pipe = make_pipeline(cfg, assets)
    variables = init_params(pipe, jax.random.PRNGKey(0))
    recon = make_reconstruct_fn(pipe)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((batch, cfg.image_size, cfg.image_size, 3)),
        dtype=jnp.float32)

    # warmup / compile
    out = recon(variables, pipe.bfm, images)
    jax.block_until_ready(out[0])

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = recon(variables, pipe.bfm, images)
        jax.block_until_ready(out[0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    faces_per_sec = batch / dt

    print(json.dumps({
        "metric": "faces/sec/chip (regress+render, 224px, batch-%d)" % batch,
        "value": round(faces_per_sec, 1),
        "unit": "faces/s",
        "vs_baseline": round(faces_per_sec / TARGET_FACES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
