"""Fidelity evaluation driver — the acceptance-metric harness (BASELINE.md):
renders N sampled coefficient draws on the active backend and reports vertex
MAE, rendered PSNR, landmark RMSE, and tri_id agreement against the CPU
oracle (native C++ when available, numpy otherwise).

  python -m facerecon_tpu.evaluate --faces 4 --tiny --platform cpu
  python -m facerecon_tpu.evaluate --faces 4          # full scale on TPU
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu.config import default_config, tiny_config
from facerecon_tpu import oracle
from facerecon_tpu.data.synthetic import sample_coeffs
from facerecon_tpu.ops.geometry import device_bfm
from facerecon_tpu.ops.render import render_coeffs
from facerecon_tpu.utils import native_oracle
from facerecon_tpu.utils.bfm import load_npz, synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff
from facerecon_tpu.utils.metrics import landmark_rmse, psnr, vertex_mae


def run(args) -> dict:
    cfg = tiny_config() if args.tiny else default_config()
    assets = load_npz(args.bfm) if args.bfm else synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(args.seed)
    coeff = sample_coeffs(rng, cfg, args.faces)

    @jax.jit
    def fwd(cv, bfm):
        c = split_coeff(cv, cfg)
        out = render_coeffs(c, bfm, cfg)
        return (out.image, out.mask, out.tri_id,
                out.geometry.verts_world, out.geometry.landmarks2d)

    image, mask, tri_id, verts, lmk = map(
        np.asarray, fwd(jnp.asarray(coeff), bfm))

    vmae, psnrs, lrmse, agree = [], [], [], []
    raster = (native_oracle.rasterize if native_oracle.is_available()
              else None)
    for b in range(args.faces):
        ref = oracle.render_coeffs(coeff[b], assets, cfg, rasterize_fn=raster)
        vmae.append(vertex_mae(verts[b], ref["verts"]))
        psnrs.append(psnr(np.clip(image[b], 0, 1),
                          np.clip(ref["image"], 0, 1)))
        lrmse.append(landmark_rmse(lmk[b], ref["landmarks2d"]))
        agree.append(float((tri_id[b] == ref["tri_id"]).mean()))

    report = {
        "faces": args.faces,
        "backend": jax.default_backend(),
        "vertex_mae": float(np.max(vmae)),
        "render_psnr_db_min": float(np.min(psnrs)),
        "landmark_rmse_px": float(np.max(lrmse)),
        "tri_id_agreement_min": float(np.min(agree)),
        "meets_contract": bool(np.max(vmae) < 1e-3),
    }
    print(json.dumps(report))
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--faces", type=int, default=4)
    p.add_argument("--bfm", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    run(args)


if __name__ == "__main__":
    main()
