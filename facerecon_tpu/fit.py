"""Coefficient-fitting driver — SURVEY.md §3 C17, workload config 4.

Analysis-by-synthesis: gradient descent directly on the coefficient vector of
one image (or a batch), optionally initialized by the CNN. The whole
optimization is ONE XLA program — a lax.scan over optax steps
(SURVEY.md §4.4), which is where differentiability of every geometry stage is
exercised hardest.

Targets come from disk (--images: a folder of photos with 68-landmark
side-cars, aligned on the host — the reference family's primary fit
workflow, SURVEY.md §3 C17) or are rendered synthetically from known
coefficients (the default in this asset-less environment, which also yields
recovery metrics). With --out, the fitted mesh is exported per image as
`<stem>_fit.obj` (photo in -> mesh out).

Usage:
  python -m facerecon_tpu.fit --steps 100 --out /tmp/fit_out --tiny
  python -m facerecon_tpu.fit --images photos/ --landmarks --out /tmp/fit
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from facerecon_tpu.config import FaceReconConfig, default_config, tiny_config
from facerecon_tpu.data.synthetic import render_batch, sample_coeffs
from facerecon_tpu.ops.geometry import DeviceBFM, device_bfm
from facerecon_tpu.ops.losses import total_loss
from facerecon_tpu.ops.render import render_coeffs
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff
from facerecon_tpu.utils.metrics import psnr


class FitResult(NamedTuple):
    coeffs: jnp.ndarray       # (B, n_coeff) final coefficients
    losses: jnp.ndarray       # (steps,) total loss trajectory
    final_parts: dict


def make_fit_fn(cfg: FaceReconConfig, steps: int, lr: float = 5e-3):
    """Build the jitted fit program: (coeff0, bfm, target, gt_lmk) -> FitResult."""
    opt = optax.adam(lr)

    def loss_fn(coeff_vec, bfm, target, gt_lmk):
        coeffs = split_coeff(coeff_vec, cfg)
        out = render_coeffs(coeffs, bfm, cfg, background=target)
        return total_loss(out, coeffs, target, gt_lmk, bfm, cfg)

    @jax.jit
    def fit(coeff0, bfm: DeviceBFM, target, gt_lmk=None):
        def step(carry, _):
            coeff, opt_state = carry
            (loss, _), grad = jax.value_and_grad(loss_fn, has_aux=True)(
                coeff, bfm, target, gt_lmk)
            updates, opt_state = opt.update(grad, opt_state, coeff)
            coeff = optax.apply_updates(coeff, updates)
            return (coeff, opt_state), loss

        init = (coeff0, opt.init(coeff0))
        (coeff, _), losses = jax.lax.scan(step, init, None, length=steps)
        _, parts = loss_fn(coeff, bfm, target, gt_lmk)
        return FitResult(coeffs=coeff, losses=losses, final_parts=parts)

    return fit


def net_initial_coeffs(cfg: FaceReconConfig, assets, images, ckpt: str,
                       seed: int = 0) -> jnp.ndarray:
    """CNN warm start for the fit (SURVEY.md §3 C17 "optionally
    net-initialized"): regress coefficients from a trained checkpoint and
    use them as coeff0 instead of the mean face."""
    from facerecon_tpu.checkpoint import restore_or_init
    from facerecon_tpu.pipeline import make_pipeline
    pipe = make_pipeline(cfg, assets)
    variables = restore_or_init(pipe, ckpt, seed)
    return pipe.model.apply(variables, jnp.asarray(images), train=False)


def run(args) -> dict:
    cfg = tiny_config() if args.tiny else default_config()
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(args.seed)

    if getattr(args, "images", None):
        # real-input workflow: folder of photos (+ 68-landmark side-cars),
        # aligned on the host exactly like the training pipeline
        from facerecon_tpu.data.folder import FolderDataset
        ds = FolderDataset(args.images, cfg,
                           align=getattr(args, "align", "68pt"),
                           assets=assets)
        target_np, lmk_np = ds.load_all()
        if args.landmarks and not np.isfinite(lmk_np).all():
            raise ValueError("--landmarks requested but some images have no "
                             "landmark side-car files")
        target, gt_lmk = jnp.asarray(target_np), jnp.asarray(lmk_np)
        names = ds.stems()
        batch = len(names)
        gt_coeff = None
    else:
        # ground-truth synthetic target (yields recovery metrics)
        gt_coeff = sample_coeffs(rng, cfg, args.batch)
        target_np, lmk_np = render_batch(gt_coeff, bfm, cfg)
        target, gt_lmk = jnp.asarray(target_np), jnp.asarray(lmk_np)
        names = [f"synthetic_{i}" for i in range(args.batch)]
        batch = args.batch
    # start from the mean face, or from the CNN's prediction when a
    # trained checkpoint is given
    if getattr(args, 'ckpt', None):
        coeff0 = net_initial_coeffs(cfg, assets, target, args.ckpt,
                                    args.seed)
    else:
        coeff0 = jnp.zeros((batch, cfg.n_coeff), jnp.float32)

    fit = make_fit_fn(cfg, steps=args.steps, lr=args.lr)
    t0 = time.time()
    res = fit(coeff0, bfm, target, gt_lmk if args.landmarks else None)
    jax.block_until_ready(res.coeffs)
    elapsed = time.time() - t0

    from facerecon_tpu.ops.geometry import coeffs_to_geometry
    geom = coeffs_to_geometry(split_coeff(res.coeffs, cfg), bfm, cfg)
    final = render_batch(np.asarray(res.coeffs), bfm, cfg)[0]
    losses = np.asarray(res.losses)
    report = {
        "steps": args.steps, "batch": batch, "fit_s": elapsed,
        "loss_first": float(losses[0]), "loss_last": float(losses[-1]),
        "monotone_95pct": bool(np.mean(np.diff(losses) <= 1e-4) > 0.9),
        "psnr_vs_target_db": psnr(final, target_np),
    }
    if np.isfinite(lmk_np).all():
        from facerecon_tpu.utils.metrics import landmark_rmse
        report["landmark_rmse_px"] = landmark_rmse(
            np.asarray(geom.landmarks2d), np.asarray(lmk_np))
    if args.out:
        from facerecon_tpu.utils.obj_io import save_obj
        os.makedirs(args.out, exist_ok=True)
        np.save(os.path.join(args.out, "fitted_coeffs.npy"),
                np.asarray(res.coeffs))
        np.save(os.path.join(args.out, "loss_curve.npy"), losses)
        verts = np.asarray(geom.verts_world)
        tex = np.asarray(geom.texture)
        for i, name in enumerate(names):
            save_obj(os.path.join(args.out, f"{name}_fit.obj"),
                     verts[i], tex[i], assets.faces)
    print(json.dumps(report))
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--images", default=None,
                   help="folder of photos (+68-landmark side-cars) to fit; "
                        "omit for the synthetic recovery target")
    p.add_argument("--align", default="68pt",
                   choices=("5pt", "68pt", "none"),
                   help="alignment mode for --images")
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--landmarks", action="store_true",
                   help="use ground-truth landmarks in the objective")
    p.add_argument("--ckpt", default=None,
                   help="trained CNN checkpoint: net-initialize the fit")
    p.add_argument("--out", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu)")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    run(args)


if __name__ == "__main__":
    main()
