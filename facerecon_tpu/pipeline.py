"""High-level reconstruction pipeline — glues C14 (CNN) to C1-C10 (geometry/
render). The per-batch work is a single jit-compiled XLA program
(SURVEY.md §4.1 "TPU rebuild": host touches the loop only for data feed and
checkpointing).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from facerecon_tpu.config import FaceReconConfig
from facerecon_tpu.models.resnet import build_model
from facerecon_tpu.ops.geometry import DeviceBFM, device_bfm
from facerecon_tpu.ops.render import render_coeffs
from facerecon_tpu.utils.bfm import BFMAssets
from facerecon_tpu.utils.coeffs import split_coeff


class Pipeline(NamedTuple):
    cfg: FaceReconConfig
    bfm: DeviceBFM
    model: Any  # ResNetRegressor


def make_pipeline(cfg: FaceReconConfig, assets: BFMAssets,
                  depth: int = 50, dtype=jnp.bfloat16) -> Pipeline:
    return Pipeline(cfg=cfg, bfm=device_bfm(assets),
                    model=build_model(cfg, depth=depth, dtype=dtype))


def init_params(pipe: Pipeline, rng_key, image_size: Optional[int] = None):
    size = image_size or pipe.cfg.image_size
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = pipe.model.init(rng_key, dummy, train=False)
    return variables  # {'params': ..., 'batch_stats': ...}


def fuse_for_inference(pipe: Pipeline, variables):
    """Deploy-time transform: fold BatchNorm into conv scale/bias and
    rewrite the 3-channel stem as a space-to-depth conv (exact to f32
    rounding; models/fused.py). Returns (pipeline with the fused model,
    fused variables) — use for inference/serving; training keeps BN."""
    from facerecon_tpu.models.fused import build_fused_model, fuse_variables
    fused = Pipeline(cfg=pipe.cfg, bfm=pipe.bfm,
                     model=build_fused_model(pipe.cfg))
    return fused, fuse_variables(variables, pipe.cfg)


def regress_coeffs(pipe: Pipeline, variables, images,
                   train: bool = False):
    """images (B,H,W,3) in [0,1] -> (coeff_vector (B,n_coeff), new_variables).

    In train mode returns updated batch_stats as the second element.
    """
    if train:
        coeff, updates = pipe.model.apply(
            variables, images, train=True, mutable=["batch_stats"])
        return coeff, updates
    return pipe.model.apply(variables, images, train=False), None


def reconstruct(pipe: Pipeline, variables, images,
                background: Optional[jnp.ndarray] = None,
                render: bool = True):
    """Full forward: images -> (coeff vector, Coeffs, RenderOut|geometry).

    The reference's test.py surface (SURVEY.md §4.2): coefficients, 68
    landmarks, rendered face, mesh — in one jittable function.
    """
    coeff_vec, _ = regress_coeffs(pipe, variables, images, train=False)
    coeffs = split_coeff(coeff_vec, pipe.cfg)
    if background is None:
        background = images
    out = render_coeffs(coeffs, pipe.bfm, pipe.cfg, background=background)
    return coeff_vec, coeffs, out


def make_reconstruct_fn(pipe: Pipeline, inference: bool = False):
    """Jit-compiled forward. BFM arrays are passed as traced args (not
    baked-in constants) so one compilation serves any asset pack of the
    same shapes. inference=True renders via the forward-only in-kernel
    shaded TPU path (no gradients through the render)."""
    model, cfg = pipe.model, pipe.cfg

    @jax.jit
    def fn(variables, bfm: DeviceBFM, images):
        coeff_vec = model.apply(variables, images, train=False)
        coeffs = split_coeff(coeff_vec, cfg)
        out = render_coeffs(coeffs, bfm, cfg, background=images,
                            inference=inference)
        return coeff_vec, coeffs, out

    return fn
