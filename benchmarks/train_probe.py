"""Training-path backward attribution (TPU, device-true chained timing).

Times value_and_grad of the render loss w.r.t. successively deeper
leaves, isolating each backward stage by difference:

  records : select adjoint + shade/photo backward only
  radiance: + record-pack backward (corner-gather adjoint, affine chain)
  coeffs  : + SH/normals/geometry backward
  params  : + CNN backward + everything (the config-4 step minus Adam)

  BATCH=128 CSCALE=0.3 python benchmarks/train_probe.py
  ONLY=records,coeffs ... to subset
"""
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
from facerecon_tpu.ops import rasterize_pallas as RP
from facerecon_tpu.ops import sh as sh_ops
from facerecon_tpu.ops.geometry import coeffs_to_geometry, device_bfm
from facerecon_tpu.ops.losses import photometric_loss
from facerecon_tpu.ops.render import (_pack_split_records,
                                      _render_fields, _shade_from_sel,
                                      _stack24, render_coeffs)
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff


def timed(tag, fn, *args, inner=4, reps=3):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            s = fn(*a, seed=carry)
            return s * 1e-30, s
        _, ss = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return jnp.sum(ss)

    t0 = time.time()
    _ = float(chained(*args))
    print(f"{tag}: compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = chained(*args)
    _ = float(out)
    dt = (time.time() - t0) / (reps * inner)
    b = int(os.environ.get("BATCH", "128"))
    print(f"{tag}: {dt*1000:7.1f} ms/{b} -> {b/dt:7.0f} faces/s",
          flush=True)


def main():
    size = int(os.environ.get("SIZE", "224"))
    batch = int(os.environ.get("BATCH", "128"))
    scale = float(os.environ.get("CSCALE", "0.3"))
    cfg = default_config(image_size=size, focal=1015.0 * size / 224.0)
    assets = synthetic_bfm(cfg, seed=0)
    bfm = device_bfm(assets)
    rng = np.random.default_rng(0)
    cv = jnp.asarray(sample_coeffs(rng, cfg, batch, scale=scale))
    target = jnp.asarray(rng.random((batch, size, size, 3)),
                         dtype=jnp.float32)
    h = w = size
    rows, rid = bfm.raster_rows, bfm.raster_row_id
    pad_rows = RP.padded_rows(rows.shape[0])

    def render_loss_from_records(records, rec48, vndc, tgt):
        tid, sel = RP.rasterize_select(
            records, vndc, bfm.faces, h, w, cfg.tile_h,
            n_cols=cfg.raster_cols, row_faces=rows, row_id=rid,
            rec48=rec48)
        color, _, _ = _shade_from_sel(tid, sel, h, w, tile_h=cfg.tile_h)
        mask = (tid >= 0).astype(jnp.float32)
        img = color * mask[..., None] + tgt * (1 - mask[..., None])
        return photometric_loss(img, tgt, mask)

    @jax.jit
    def prep(cv):
        c = split_coeff(cv, cfg)
        geom = coeffs_to_geometry(c, bfm, cfg)
        radiance = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
        fields = _render_fields(geom.verts_ndc, radiance, rows, h, w,
                                corner_adj=bfm.raster_corner_adj)
        rec24 = _stack24(fields, pad_rows)
        rec48 = _pack_split_records(fields, rid, pad_rows)
        return rec24, rec48, geom.verts_ndc, radiance, geom

    rec24, rec48, vndc, radiance, _ = jax.block_until_ready(prep(cv))

    # every big array rides as an ARGUMENT: a closed-over device array is
    # baked into the HLO as a constant, and the grad modules then exceed
    # the axon remote-compile request limit (HTTP 413)

    def g_records(cv_in, tgt, rec24, rec48, vndc, radiance, seed):
        r = rec24 * (1.0 + seed * 1e-30)
        g = jax.grad(
            lambda rr: render_loss_from_records(rr, rec48, vndc, tgt))(r)
        return jnp.sum(g[:, 9:])     # skip the big radiance slice sum

    def g_radiance(cv_in, tgt, rec24, rec48, vndc, radiance, seed):
        def loss(rad):
            fields = _render_fields(vndc, rad, rows, h, w,
                                    corner_adj=bfm.raster_corner_adj)
            r24 = _stack24(fields, pad_rows)
            r48 = jax.lax.stop_gradient(
                _pack_split_records(fields, rid, pad_rows))
            return render_loss_from_records(r24, r48, vndc, tgt)
        g = jax.grad(loss)(radiance * (1.0 + seed * 1e-30))
        return jnp.sum(g)

    def g_coeffs(cv_in, tgt, rec24, rec48, vndc, radiance, seed):
        def loss(c_vec):
            out = render_coeffs(split_coeff(c_vec, cfg), bfm, cfg,
                                background=tgt)
            return photometric_loss(out.image, tgt, out.mask)
        g = jax.grad(loss)(cv_in * (1.0 + seed * 1e-30))
        return jnp.sum(g)

    def f_fwd(cv_in, tgt, rec24, rec48, vndc, radiance, seed):
        out = render_coeffs(split_coeff(cv_in * (1.0 + seed * 1e-30),
                                        cfg), bfm, cfg, background=tgt)
        return photometric_loss(out.image, tgt, out.mask)

    from facerecon_tpu.pipeline import init_params, make_pipeline
    from facerecon_tpu.train import (init_state, make_optimizer,
                                     make_train_step)
    pipe = make_pipeline(cfg, synthetic_bfm(cfg, seed=0))
    variables = init_params(pipe, jax.random.PRNGKey(0))
    lmk = jnp.asarray(rng.random((batch, 68, 2)) * size,
                      dtype=jnp.float32)

    # CNN / full-step probes pass params & state as ARGUMENTS too (the
    # 413 limit again: 100-300 MB of constants otherwise)
    def g_cnn(vars_in, tgt, seed):
        def loss(params):
            out, _ = pipe.model.apply(
                {"params": params,
                 "batch_stats": vars_in.get("batch_stats", {})},
                tgt * (1.0 + seed * 1e-30), train=True,
                mutable=["batch_stats"])
            return jnp.sum(out * out)
        g = jax.grad(loss)(vars_in["params"])
        return jax.tree.reduce(lambda a, x: a + jnp.sum(x), g, 0.0)

    opt = make_optimizer(cfg, total_steps=1000)
    state0 = init_state(pipe, opt, seed=0)
    one_step = make_train_step(pipe, opt, chunk=1)

    def f_step(st_in, tgt, lmk_in, seed):
        st, parts = one_step(st_in, pipe.bfm,
                             tgt * (1.0 + seed * 1e-30), lmk_in)
        return parts["total"]

    from facerecon_tpu.ops.losses import total_loss

    def g_vgrad(vars_in, tgt, lmk_in, seed):
        # value_and_grad of the train loss WITHOUT the optimizer update
        def loss_fn(params):
            coeff_vec, updates = pipe.model.apply(
                {"params": params,
                 "batch_stats": vars_in.get("batch_stats", {})},
                tgt * (1.0 + seed * 1e-30), train=True,
                mutable=["batch_stats"])
            coeffs = split_coeff(coeff_vec, cfg)
            out = render_coeffs(coeffs, pipe.bfm, cfg, background=tgt)
            total, _ = total_loss(out, coeffs, tgt, lmk_in, pipe.bfm,
                                  cfg)
            return total
        v, g = jax.value_and_grad(loss_fn)(vars_in["params"])
        return v + jax.tree.reduce(lambda a, x: a + jnp.sum(x), g, 0.0)

    def g_fullfwd(vars_in, tgt, lmk_in, seed):
        # the train loss FORWARD only (CNN train-mode + render + losses)
        coeff_vec, _ = pipe.model.apply(
            {"params": vars_in["params"],
             "batch_stats": vars_in.get("batch_stats", {})},
            tgt * (1.0 + seed * 1e-30), train=True,
            mutable=["batch_stats"])
        coeffs = split_coeff(coeff_vec, cfg)
        out = render_coeffs(coeffs, pipe.bfm, cfg, background=tgt)
        total, _ = total_loss(out, coeffs, tgt, lmk_in, pipe.bfm, cfg)
        return total

    def g_cnnrender(vars_in, tgt, lmk_in, seed):
        # CNN -> render -> photometric (no landmark/reg): isolates the
        # CNN->render composition from total_loss
        coeff_vec, _ = pipe.model.apply(
            {"params": vars_in["params"],
             "batch_stats": vars_in.get("batch_stats", {})},
            tgt * (1.0 + seed * 1e-30), train=True,
            mutable=["batch_stats"])
        out = render_coeffs(split_coeff(coeff_vec, cfg), pipe.bfm, cfg,
                            background=tgt)
        return photometric_loss(out.image, tgt, out.mask)

    def g_fixedtotal(cv_in, tgt, lmk_in, seed):
        # fixed coeffs -> render -> total_loss: isolates total_loss
        coeffs = split_coeff(cv_in * (1.0 + seed * 1e-30), cfg)
        out = render_coeffs(coeffs, pipe.bfm, cfg, background=tgt)
        total, _ = total_loss(out, coeffs, tgt, lmk_in, pipe.bfm, cfg)
        return total

    only = os.environ.get("ONLY")
    render_args = (cv, target, rec24, rec48, vndc, radiance)
    probes = {"fwd": ("fwd loss       ", f_fwd, render_args),
              "cnnrender": ("cnn+render+pho ", g_cnnrender,
                            (variables, target, lmk)),
              "fixedtotal": ("fixed+totalloss", g_fixedtotal,
                             (cv, target, lmk)),
              "fullfwd": ("train loss fwd ", g_fullfwd,
                          (variables, target, lmk)),
              "vgrad": ("value_and_grad ", g_vgrad,
                        (variables, target, lmk)),
              "records": ("grad@records   ", g_records, render_args),
              "radiance": ("grad@radiance  ", g_radiance, render_args),
              "coeffs": ("grad@coeffs    ", g_coeffs, render_args),
              "cnn": ("grad@cnn params", g_cnn, (variables, target)),
              "step": ("full train step", f_step,
                       (state0, target, lmk))}
    for key, (tag, fn, args) in probes.items():
        if only and key not in only.split(","):
            continue
        timed(tag, fn, *args)


if __name__ == "__main__":
    main()
