"""Headline benchmark — BASELINE.md: faces/sec/chip, batch-256 regress +
render at 224x224 on one TPU v5e chip. Prints ONE JSON line.

  python bench.py                   # headline (compile can take minutes)
  BENCH_BATCH=64 python bench.py
  BENCH_MODE=render512 python bench.py   # config 5: batch-256 512x512
                                         # rendering (no CNN), microbatched
  BENCH_MODE=train python bench.py       # config 4: full fwd+bwd
                                         # self-supervised train step
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


def emit(payload: dict) -> None:
    """Print the JSON line; with BENCH_RECORD=<file> also append it there
    (the driver only captures the headline mode's stdout — the train and
    render512 artifacts were living in STATUS prose, VERDICT r4 item 6)."""
    line = json.dumps(payload)
    print(line)
    rec = os.environ.get("BENCH_RECORD")
    if rec:
        with open(rec, "a") as f:
            f.write(line + "\n")


def render512():
    """Config-5 harness (BASELINE.json: "batch-256 512x512 rendering"):
    coefficients -> full differentiable render at 512x512, microbatched to
    bound intermediates, one JSON line."""
    from facerecon_tpu.config import default_config
    from facerecon_tpu.data.synthetic import sample_coeffs
    from facerecon_tpu.ops.geometry import device_bfm
    from facerecon_tpu.ops.render import render_coeffs
    from facerecon_tpu.utils.bfm import synthetic_bfm
    from facerecon_tpu.utils.coeffs import split_coeff

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    micro = int(os.environ.get("BENCH_MICROBATCH", "32"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    size = 512
    # 1-row bands at 512: the 512-lane column tile doubles the per-band
    # pixel count, so halve the band height to keep eval tiles VMEM-sized
    # tile_h=2 x 8 cols (col_w=64, col_px=128 full vregs) measured 308.7
    # faces/s vs 239 at the old 1x4 default — a config the looped
    # chunk-eval body compile-unblocked (round 5); 1x8 overflows the
    # 1 MiB SMEM scalar-prefetch budget at micro-32 (512 bands x 8 cols)
    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0,
                         tile_h=int(os.environ.get("BENCH_TILEH", "2")),
                         batch_size=batch,
                         raster_cols=int(os.environ.get("BENCH_COLS", "8")))
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    assert batch % micro == 0
    n_micro = batch // micro

    @jax.jit
    def render_all(bfm, coeffs):
        cs = coeffs.reshape(n_micro, micro, -1)

        def one(cv):
            out = render_coeffs(split_coeff(cv, cfg), bfm, cfg,
                                inference=True)
            return jnp.mean(out.image, axis=(1, 2, 3))  # depend on shading

        means = jax.lax.map(one, cs)
        return jnp.sum(means), means

    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(sample_coeffs(rng, cfg, batch))
    out = render_all(bfm, coeffs)
    _ = float(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = render_all(bfm, coeffs)
    _ = float(out[0])
    dt = (time.perf_counter() - t0) / reps
    emit({
        "metric": "faces/sec/chip (render-only, 512px, batch-%d)" % batch,
        "value": round(batch / dt, 1),
        "unit": "faces/s",
        "vs_baseline": None,
    })


def train_bench():
    """Config-4 harness (BASELINE.json:10): the full differentiable
    training path — CNN fwd + render + losses + backward (select matmul
    adjoint) + Adam update — chained `chunk` steps per dispatch. This is
    the tracked artifact for the differentiable render path: the headline
    bench serves the non-differentiable in-kernel-shade path, so without
    this number config-3/4 perf would be invisible (VERDICT r3 item 3)."""
    from facerecon_tpu.config import default_config
    from facerecon_tpu.pipeline import make_pipeline
    from facerecon_tpu.train import (init_state, make_optimizer,
                                     make_train_step)
    from facerecon_tpu.utils.bfm import synthetic_bfm

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    # chunk=1 measured 45% faster than chunk=4 at batch-128 (404.6 vs
    # 278.9 faces/s): the scan's TrainState carry costs ~145 ms/step,
    # far more than the ~20 ms dispatch RTT it amortizes at this step
    # size
    chunk = int(os.environ.get("BENCH_CHUNK", "1"))
    cfg = default_config(batch_size=batch)
    assets = synthetic_bfm(cfg, seed=0)
    pipe = make_pipeline(cfg, assets)
    opt = make_optimizer(cfg, total_steps=1000)
    state = init_state(pipe, opt, seed=0)
    step = make_train_step(pipe, opt, chunk=chunk)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((chunk, batch, cfg.image_size, cfg.image_size, 3)),
        dtype=jnp.float32)
    lmk = jnp.asarray(
        rng.random((chunk, batch, 68, 2)) * cfg.image_size,
        dtype=jnp.float32)

    if chunk == 1:
        images, lmk = images[0], lmk[0]    # unchunked one_step signature

    state, parts = step(state, pipe.bfm, images, lmk)   # compile + warmup
    _ = float(parts["total"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, parts = step(state, pipe.bfm, images, lmk)
    _ = float(parts["total"])                  # in-order stream sync
    dt = (time.perf_counter() - t0) / (reps * chunk)
    emit({
        "metric": "faces/sec/chip (train fwd+bwd, 224px, batch-%d)" % batch,
        "value": round(batch / dt, 1),
        "unit": "faces/s",
        "vs_baseline": None,
    })


def main():
    if os.environ.get("BENCH_MODE") == "render512":
        render512()
        return
    if os.environ.get("BENCH_MODE") == "train":
        train_bench()
        return
    from facerecon_tpu.config import default_config
    from facerecon_tpu.pipeline import (init_params, make_pipeline,
                                        make_reconstruct_fn)
    from facerecon_tpu.utils.bfm import synthetic_bfm

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    reps = int(os.environ.get("BENCH_REPS", "10"))

    # 128 measured fastest (256 exceeds HBM: render intermediates)
    micro = int(os.environ.get("BENCH_MICROBATCH", "128"))
    cfg = default_config(batch_size=batch)
    assets = synthetic_bfm(cfg, seed=0)
    pipe = make_pipeline(cfg, assets)
    variables = init_params(pipe, jax.random.PRNGKey(0))
    # serve the inference-fused model (BN folded, s2d stem — exact)
    from facerecon_tpu.pipeline import fuse_for_inference
    pipe, variables = fuse_for_inference(pipe, variables)
    inner = make_reconstruct_fn(pipe, inference=True)

    assert batch % micro == 0
    n_micro = batch // micro

    @jax.jit
    def recon(variables, bfm, images):
        """batch-256 regress+render, microbatched inside one XLA program to
        bound render intermediates (B,H,W,3verts,3ch) under HBM."""
        ims = images.reshape(n_micro, micro, *images.shape[1:])

        def one(im):
            coeff_vec, _, out = inner(variables, bfm, im)
            # depend on the rendered IMAGE: returning only mask/coeffs lets
            # XLA dead-code-eliminate the shading+interpolation stage and
            # silently benchmarks regress+rasterize instead of full render
            return coeff_vec, jnp.mean(out.image, axis=(1, 2, 3))

        coeffs, masks = jax.lax.map(one, ims)
        return coeffs.reshape(batch, -1), masks.reshape(batch,
                                                        *masks.shape[2:])

    inner_reps = int(os.environ.get("BENCH_INNER_REPS", "8"))

    @jax.jit
    def recon_chained(variables, bfm, images):
        """inner_reps batch-256 steps chained inside ONE dispatch: each rep
        consumes a scalar from the previous rep's output so XLA cannot CSE
        them away — amortizes the per-dispatch tunnel round trip, which
        otherwise dominates at this step time."""
        def body(carry, _):
            img = images * (1.0 + carry * 1e-30)
            coeffs, masks = recon(variables, bfm, img)
            return jnp.sum(masks) * 1e-30, (jnp.sum(coeffs), jnp.sum(masks))
        _, (cs, ms) = jax.lax.scan(body, 0.0, None, length=inner_reps)
        return cs, ms

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((batch, cfg.image_size, cfg.image_size, 3)),
        dtype=jnp.float32)

    # NB: jax.block_until_ready does not reliably block on the axon backend;
    # synchronize through a scalar dependency fetch instead (jitted: eager
    # ops over the tunnel cost seconds).
    @jax.jit
    def _chk(coeff_vec, mask):
        return jnp.sum(coeff_vec) + jnp.sum(mask)

    def sync(out):
        coeff_vec, mask = out
        return float(_chk(coeff_vec, mask))

    out = recon_chained(variables, pipe.bfm, images)   # warmup / compile
    _ = float(_chk(out[0], out[1]))

    t0 = time.perf_counter()
    for _ in range(reps):
        out = recon_chained(variables, pipe.bfm, images)
    _ = float(_chk(out[0], out[1]))  # in-order stream: syncs all reps
    dt = (time.perf_counter() - t0) / (reps * inner_reps)
    faces_per_sec = batch / dt

    emit({
        "metric": "faces/sec/chip (regress+render, 224px, batch-%d)" % batch,
        "value": round(faces_per_sec, 1),
        "unit": "faces/s",
        "vs_baseline": round(faces_per_sec / TARGET_FACES_PER_SEC, 4),
    })


if __name__ == "__main__":
    main()
