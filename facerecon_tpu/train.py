"""Self-supervised training driver — SURVEY.md §3 C15, workload config 4.

Per-step: batch -> CNN -> coefficient split -> synthesis -> pose -> SH ->
rasterize -> composite -> photometric + landmark + regularization losses ->
optax Adam step. The whole step is ONE jit-compiled XLA program
(SURVEY.md §4.1); with a multi-chip mesh the batch axis is sharded and XLA
all-reduces gradients over ICI (psum) — no hand-written comm.

Usage:
  python -m facerecon_tpu.train --steps 200 --batch 8 --tiny
  python -m facerecon_tpu.train --steps 100000 --batch 32 --ckpt-dir /tmp/ck
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facerecon_tpu.config import FaceReconConfig, default_config, tiny_config
from facerecon_tpu.data.synthetic import synthetic_batches
from facerecon_tpu.ops.geometry import DeviceBFM
from facerecon_tpu.ops.losses import total_loss
from facerecon_tpu.ops.render import render_coeffs
from facerecon_tpu.parallel import mesh as pmesh
from facerecon_tpu.pipeline import init_params, make_pipeline
from facerecon_tpu.utils.bfm import load_npz, synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff


class TrainState(NamedTuple):
    variables: Any    # {'params', 'batch_stats'}
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: FaceReconConfig, total_steps: int):
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.learning_rate,
        warmup_steps=min(1000, max(1, total_steps // 20)),
        decay_steps=max(2, total_steps))
    return optax.adam(sched)


def make_train_step(pipe, opt, use_landmarks: bool = True,
                    chunk: int = 1):
    """Build the jitted train step: (state, bfm, images, lmk) -> (state,
    metrics).

    chunk > 1 scans `chunk` optimizer steps inside ONE XLA dispatch over
    stacked (chunk, batch, ...) inputs — worth it only when the step is
    FAST relative to the ~20 ms per-dispatch tunnel round trip. Measured
    round 4 at batch-128 (~300 ms steps): the scan's TrainState carry
    costs ~145 ms PER STEP (316 ms unchunked vs 460 ms at chunk=4-8 —
    the ~300 MB params+opt tree round-trips through the loop-carried
    buffers), so chunk=1 is 45% faster; prefer chunk=1 unless steps are
    tens of ms. Metrics are the last step's."""
    model, cfg = pipe.model, pipe.cfg

    def loss_fn(params, batch_stats, bfm: DeviceBFM, images, gt_lmk):
        coeff_vec, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"])
        coeffs = split_coeff(coeff_vec, cfg)
        out = render_coeffs(coeffs, bfm, cfg, background=images)
        total, parts = total_loss(
            out, coeffs, images, gt_lmk if use_landmarks else None, bfm, cfg)
        return total, (parts, updates["batch_stats"])

    def one_step(state: TrainState, bfm: DeviceBFM, images, gt_lmk):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (parts, new_bs)), grads = grad_fn(
            state.variables["params"], state.variables["batch_stats"],
            bfm, images, gt_lmk)
        updates, opt_state = opt.update(
            grads, state.opt_state, state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        new_state = TrainState(
            variables={"params": params, "batch_stats": new_bs},
            opt_state=opt_state, step=state.step + 1)
        return new_state, parts

    # donate the TrainState: the ~300 MB params+opt tree aliases in place
    # instead of allocating fresh outputs every dispatch (callers always
    # rebind `state = step(state, ...)`; CPU ignores donation harmlessly)
    if chunk == 1:
        return jax.jit(one_step, donate_argnums=(0,))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk_step(state: TrainState, bfm: DeviceBFM, images_k, lmk_k):
        def body(st, xs):
            im, lk = xs
            return one_step(st, bfm, im, lk)

        state, parts_k = jax.lax.scan(body, state, (images_k, lmk_k))
        return state, jax.tree.map(lambda x: x[-1], parts_k)

    return chunk_step


def init_state(pipe, opt, seed: int = 0) -> TrainState:
    variables = init_params(pipe, jax.random.PRNGKey(seed))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    return TrainState(variables=variables,
                      opt_state=opt.init(variables["params"]),
                      step=jnp.zeros((), jnp.int32))


def run(args) -> dict:
    cfg = tiny_config() if args.tiny else default_config()
    if args.batch:
        cfg = cfg.__class__(**{**cfg.__dict__, "batch_size": args.batch})
    assets = load_npz(args.bfm) if args.bfm else synthetic_bfm(cfg, seed=0)
    pipe = make_pipeline(cfg, assets)
    opt = make_optimizer(cfg, args.steps)
    chunk = max(1, getattr(args, "chunk", 1))
    train_step = make_train_step(pipe, opt,
                                 use_landmarks=not args.no_landmarks,
                                 chunk=chunk)

    state = init_state(pipe, opt, args.seed)
    mgr = None
    if args.ckpt_dir:
        from facerecon_tpu.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.ckpt_dir)
        if args.resume and mgr.latest_step() is not None:
            restored = mgr.restore(template={
                "variables": state.variables, "opt_state": state.opt_state,
                "step": 0})
            state = TrainState(variables=restored["variables"],
                               opt_state=restored["opt_state"],
                               step=jnp.asarray(restored["step"], jnp.int32))
            print(f"resumed at step {int(state.step)}")

    # multi-chip: shard batch over the data mesh, replicate params
    mesh = pmesh.make_mesh()
    multi = len(mesh.devices.reshape(-1)) > 1
    if multi:
        state = TrainState(*pmesh.replicate(mesh, tuple(state)))
    bfm = pmesh.replicate(mesh, pipe.bfm) if multi else pipe.bfm

    writer = None
    if args.tensorboard:
        try:  # clu is installed in the target env (SURVEY.md §6); optional
            from clu import metric_writers
            writer = metric_writers.create_default_writer(args.tensorboard)
        except Exception as e:
            print(f"tensorboard writer unavailable: {e}")

    from facerecon_tpu.data.feeder import prefetch
    if getattr(args, "data_dir", None):
        # real-data ingestion (SURVEY.md C18): folder of (image, landmark)
        # pairs, aligned on the host
        from facerecon_tpu.data.folder import FolderDataset
        ds = FolderDataset(args.data_dir, cfg,
                           align=getattr(args, "align", "68pt"),
                           assets=assets)
        source = ds.batches(cfg.batch_size, seed=args.seed + 1)
    else:
        source = synthetic_batches(pipe.bfm, cfg, cfg.batch_size,
                                   seed=args.seed + 1,
                                   pool=getattr(args, "data_pool", 0))
    data = prefetch(source, depth=2)

    wire_u8 = not getattr(args, "wire_f32", False)

    def stage_images(host_images):
        """Host image batch -> device f32 [0,1], u8 on the wire.

        The host->device link is the host-fed loop's whale, not the host
        preprocessing: at batch-128/224px the f32 batch is 77 MB and the
        steady-state step measured 1209 ms vs 258 ms with the batch sent
        as uint8 and normalized on device (the same step is 268 ms with
        device-resident data — u8 staging makes host-fed training
        compute-bound). Sources are u8-decoded images, so the round trip
        costs <= 0.5/255 quantization noise on interpolated warp values.
        """
        if not wire_u8:
            return jnp.asarray(host_images)
        q = (np.asarray(host_images) * 255.0 + 0.5).astype(np.uint8)
        return jnp.asarray(q).astype(jnp.float32) / 255.0

    t0 = time.time()
    first_loss = last_loss = None
    # chunked dispatch runs whole chunks only: round the step budget DOWN
    # so --steps is never exceeded (the checkpointed/reported step count
    # stays truthful)
    n_iters = max(1, args.steps // chunk)
    if chunk > 1 and args.steps % chunk:
        print(f"--steps {args.steps} is not a multiple of --chunk {chunk}: "
              f"running {n_iters * chunk} steps")
    # throughput warmup: iter 0 compiles, and iter 1 typically RECOMPILES
    # once more (the donated TrainState comes back with different buffer
    # layouts than the freshly-initialized one) — exclude both, or short
    # runs report compile time as throughput
    warm = min(3, n_iters - 1)
    for i in range(n_iters):
        if chunk == 1:
            images, lmk, _ = next(data)
            images, lmk = stage_images(images), jnp.asarray(lmk)
            if multi:
                images, lmk = pmesh.shard_batch(mesh, (images, lmk))
        else:
            batches = [next(data) for _ in range(chunk)]
            images = jnp.stack([stage_images(b[0]) for b in batches])
            lmk = jnp.stack([jnp.asarray(b[1]) for b in batches])
            if multi:
                images, lmk = pmesh.shard_axis1(mesh, (images, lmk))
        state, parts = train_step(state, bfm, images, lmk)
        if i == 0:
            first_loss = float(parts["total"])
        if i == warm:
            jax.block_until_ready(parts["total"])
            t0 = time.time()  # exclude compiles from throughput
        if (i + 1) % args.log_every == 0 or i == n_iters - 1:
            last_loss = float(parts["total"])
            # t0 is reset after iter `warm` -> (i - warm) timed iters
            rate = (cfg.batch_size * chunk * (i - warm)
                    / max(time.time() - t0, 1e-9) if i > warm
                    else float("nan"))
            print(json.dumps({
                "step": (i + 1) * chunk,
                **{k: round(float(v), 5) for k, v in parts.items()},
                "faces_per_sec": round(rate, 1)}))
            if writer is not None:
                writer.write_scalars(
                    i + 1, {k: float(v) for k, v in parts.items()})
        if mgr and (i + 1) % cfg.checkpoint_every == 0:
            mgr.save(int(state.step), {
                "variables": jax.device_get(state.variables),
                "opt_state": jax.device_get(state.opt_state),
                "step": int(state.step)})
    data.close()
    if mgr:
        mgr.save(int(state.step), {
            "variables": jax.device_get(state.variables),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step)})
        mgr.wait()
    report = {"steps": args.steps, "first_loss": first_loss,
              "last_loss": last_loss,
              "improved": (first_loss is None or last_loss is None
                           or last_loss < first_loss)}
    print(json.dumps(report))
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--chunk", type=int, default=1,
                   help="optimizer steps per XLA dispatch (amortizes the "
                        "per-dispatch round trip)")
    p.add_argument("--data-pool", type=int, default=0,
                   help="synthetic source: pre-generate this many batches "
                        "and epoch over them (0 = endless fresh stream, "
                        "which renders ground truth on-device each step)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--wire-f32", action="store_true",
                   help="send image batches host->device as float32 "
                        "instead of the default uint8 wire format (4x "
                        "the transfer; see stage_images)")
    p.add_argument("--data-dir", default=None,
                   help="folder of (image, 68-landmark) pairs; omit for "
                        "the synthetic source")
    p.add_argument("--align", default="68pt",
                   choices=("5pt", "68pt", "none"),
                   help="alignment mode for --data-dir images")
    p.add_argument("--bfm", default=None)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no-landmarks", action="store_true")
    p.add_argument("--tensorboard", default=None,
                   help="directory for CLU/TensorBoard scalar summaries")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    run(args)


if __name__ == "__main__":
    main()
