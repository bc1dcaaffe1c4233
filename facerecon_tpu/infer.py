"""Inference/demo driver — SURVEY.md §3 C16, workload config 1.

image(s) -> coefficients, 68 landmarks, rendered face, exported .obj.
With --synthetic (default in this asset-less environment) it generates
ground-truth faces from random coefficients and reports recovery metrics.

Usage:
  python -m facerecon_tpu.infer --out /tmp/out --synthetic 4
  python -m facerecon_tpu.infer --images img1.png img2.png --ckpt ckpt_dir
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu.config import FaceReconConfig, default_config, tiny_config
from facerecon_tpu.data.synthetic import sample_coeffs, render_batch
from facerecon_tpu.pipeline import (Pipeline, make_pipeline,
                                    make_reconstruct_fn)
from facerecon_tpu.utils.bfm import BFMAssets, load_npz, synthetic_bfm
from facerecon_tpu.utils.metrics import landmark_rmse, psnr
from facerecon_tpu.utils.obj_io import save_obj


def load_image(path: str, size: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB").resize((size, size))
    return np.asarray(img, np.float32) / 255.0


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def landmark_overlay(image: np.ndarray, lmk: np.ndarray,
                     radius: int = 1) -> np.ndarray:
    """Landmark overlay plot (SURVEY.md §2 L7): green dots on the image."""
    out = np.array(image, dtype=np.float32, copy=True)
    h, w = out.shape[:2]
    for x, y in lmk:
        xi, yi = int(round(x)), int(round(y))
        y0, y1 = max(yi - radius, 0), min(yi + radius + 1, h)
        x0, x1 = max(xi - radius, 0), min(xi + radius + 1, w)
        if y0 < y1 and x0 < x1:
            out[y0:y1, x0:x1] = np.array([0.0, 1.0, 0.0])
    return out


def depth_to_image(mask: np.ndarray, verts_ndc: np.ndarray,
                   tri_id: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Depth dump (SURVEY.md §2 L7): normalized inverse depth, gray ramp.

    Per-pixel depth approximated by the winning triangle's mean vertex depth
    (sub-triangle precision is irrelevant for a visualization dump)."""
    depth = verts_ndc[:, 2]
    tri_depth3 = depth[faces[np.maximum(tri_id, 0)]]    # (H,W,3)
    tri_depth = np.where(mask, tri_depth3.mean(-1), np.nan)
    lo, hi = np.nanmin(tri_depth), np.nanmax(tri_depth)
    norm = np.where(mask, 1.0 - (tri_depth - lo) / max(hi - lo, 1e-6), 0.0)
    return np.repeat(norm[..., None], 3, axis=-1)


def get_assets(args, cfg: FaceReconConfig) -> BFMAssets:
    if args.bfm:
        return load_npz(args.bfm)
    return synthetic_bfm(cfg, seed=0)


def restore_variables(pipe: Pipeline, ckpt: str | None, seed: int = 0):
    from facerecon_tpu.checkpoint import restore_or_init
    return restore_or_init(pipe, ckpt, seed)


def run(args) -> dict:
    cfg = tiny_config() if args.tiny else default_config()
    assets = get_assets(args, cfg)
    pipe = make_pipeline(cfg, assets)
    variables = restore_variables(pipe, args.ckpt)
    if getattr(args, "fused", False):
        # serving transform: fold BN + space-to-depth stem (exact)
        from facerecon_tpu.pipeline import fuse_for_inference
        pipe, variables = fuse_for_inference(pipe, variables)
    recon = make_reconstruct_fn(pipe)
    os.makedirs(args.out, exist_ok=True)

    if args.images:
        images = np.stack([load_image(p, cfg.image_size)
                           for p in args.images])
        names = [os.path.splitext(os.path.basename(p))[0]
                 for p in args.images]
        gt_lmk = gt_coeff = None
    else:
        rng = np.random.default_rng(args.seed)
        gt_coeff = sample_coeffs(rng, cfg, args.synthetic)
        images, gt_lmk = render_batch(gt_coeff, pipe.bfm, cfg)
        names = [f"synthetic_{i}" for i in range(args.synthetic)]

    t0 = time.time()
    coeff_vec, coeffs, out = recon(variables, pipe.bfm, jnp.asarray(images))
    jax.block_until_ready(coeff_vec)
    elapsed = time.time() - t0

    verts = np.asarray(out.geometry.verts_world)
    tex = np.asarray(out.geometry.texture)
    lmk = np.asarray(out.geometry.landmarks2d)
    rendered = np.asarray(out.image)

    report = {"n_images": len(names), "forward_s": elapsed}
    for i, name in enumerate(names):
        save_obj(os.path.join(args.out, f"{name}.obj"),
                 verts[i], tex[i], assets.faces)
        save_image(os.path.join(args.out, f"{name}_render.png"), rendered[i])
        np.savetxt(os.path.join(args.out, f"{name}_landmarks.txt"), lmk[i],
                   fmt="%.4f")
        np.save(os.path.join(args.out, f"{name}_coeffs.npy"),
                np.asarray(coeff_vec)[i])
        if args.overlay:
            save_image(os.path.join(args.out, f"{name}_overlay.png"),
                       landmark_overlay(images[i], lmk[i]))
        if args.depth:
            save_image(os.path.join(args.out, f"{name}_depth.png"),
                       depth_to_image(np.asarray(out.tri_id)[i] >= 0,
                                      np.asarray(out.geometry.verts_ndc)[i],
                                      np.asarray(out.tri_id)[i],
                                      assets.faces))
    if gt_lmk is not None:
        report["landmark_rmse_px"] = landmark_rmse(lmk, gt_lmk)
        report["render_psnr_db"] = psnr(np.clip(rendered, 0, 1), images)
    print(json.dumps(report))
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", nargs="*", default=None,
                   help="aligned face images; omit for --synthetic")
    p.add_argument("--synthetic", type=int, default=4,
                   help="number of synthetic faces when no images given")
    p.add_argument("--out", default="/tmp/facerecon_out")
    p.add_argument("--ckpt", default=None, help="checkpoint dir to restore")
    p.add_argument("--fused", action="store_true",
                   help="serve the inference-fused CNN (BN folded, "
                        "space-to-depth stem; exact, ~10%% faster)")
    p.add_argument("--bfm", default=None, help=".npz BFM asset pack")
    p.add_argument("--tiny", action="store_true", help="tiny test config")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--overlay", action="store_true",
                   help="save landmark overlay plots")
    p.add_argument("--depth", action="store_true", help="save depth dumps")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu)")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    run(args)


if __name__ == "__main__":
    main()
