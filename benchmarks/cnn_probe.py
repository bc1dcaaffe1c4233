"""Per-stage timing of the fused serving CNN (models/fused.py) by chained
truncation: probe k runs the network UP TO cut point k, so stage cost is
the delta between consecutive probes (device-true over the axon tunnel,
same chained-scan pattern as stage_probe.py).

  python benchmarks/cnn_probe.py            # BATCH=64 DTYPE=bfloat16
  env: BATCH, REPS, INNER, DTYPE=bfloat16|float32, WDTYPE=float32|bfloat16
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
from facerecon_tpu.models.fused import build_fused_model
from facerecon_tpu.pipeline import make_pipeline, init_params, \
    fuse_for_inference
from facerecon_tpu.utils.bfm import synthetic_bfm


def timed(tag, fn, *args, inner=8, reps=3):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            s = fn(a[0] * (1.0 + carry * 1e-30), *a[1:])
            return s * 1e-30, s
        _, ss = jax.lax.scan(body, 0.0, None, length=inner)
        return jnp.sum(ss)

    t0 = time.time()
    _ = float(chained(*args))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = chained(*args)
    _ = float(out)
    dt = (time.time() - t0) / (reps * inner)
    b = args[0].shape[0]
    print(f"{tag:24s}: {dt*1000:7.2f} ms/{b}  [compile {ct:.0f}s]",
          flush=True)
    return dt


def main():
    batch = int(os.environ.get("BATCH", "64"))
    cfg = default_config(batch_size=batch)
    assets = synthetic_bfm(cfg, seed=0)
    pipe = make_pipeline(cfg, assets)
    variables = init_params(pipe, jax.random.PRNGKey(0))
    pipe, variables = fuse_for_inference(pipe, variables)
    model = pipe.model
    params = variables

    wdtype = os.environ.get("WDTYPE")
    if wdtype:  # pre-cast folded weights (bf16 serving weights experiment)
        cast = getattr(jnp, wdtype)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(cast) if a.dtype == jnp.float32 else a,
            params)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, 224, 224, 3)), jnp.float32)

    # cut points: run the module truncated after N bottleneck blocks
    # (monkey-level: re-build with shortened stage_sizes)
    cuts = [("stem+pool", (0, 0, 0, 0)),
            ("+stage1 (3 blk)", (3, 0, 0, 0)),
            ("+stage2 (4 blk)", (3, 4, 0, 0)),
            ("+stage3 (6 blk)", (3, 4, 6, 0)),
            ("full  (+stage4+head)", None)]

    prev = 0.0
    for tag, stages in cuts:
        if stages is None:
            m = model
        else:
            from facerecon_tpu.models.fused import FusedResNetRegressor
            m = FusedResNetRegressor(n_coeff=cfg.n_coeff,
                                     stage_sizes=tuple(stages),
                                     dtype=jnp.bfloat16)

        def fwd(im, m=m, nb=None if stages is None else sum(stages)):
            out = m.apply(params, im, train=False) if nb is None else None
            if out is None:
                # truncated apply: call with capture of intermediate via
                # running the submodule stack manually is complex; instead
                # run full model but on a features-truncated twin sharing
                # the same params prefix
                out = m.apply(_prefix_params(params, nb), im, train=False)
            return jnp.sum(out.astype(jnp.float32))

        dt = timed(tag, fwd, images)
        print(f"    delta {1000*(dt - prev):7.2f} ms", flush=True)
        prev = dt


def _prefix_params(params, n_blocks):
    p = dict(params["params"])
    out = {"stem": p["stem"], "head": _head_stub(p, n_blocks)}
    for i in range(n_blocks):
        out[f"FusedBottleneck_{i}"] = p[f"FusedBottleneck_{i}"]
    return {"params": out}


def _head_stub(p, n_blocks):
    # head input width after n_blocks: infer from the last kept block's
    # final conv, falling back to stem width
    if n_blocks == 0:
        width = p["stem"]["kernel"].shape[-1]
    else:
        blk = p[f"FusedBottleneck_{n_blocks-1}"]
        last = max(int(k.split("_")[1]) for k in blk if k.startswith("Conv"))
        width = blk[f"Conv_{last}"]["kernel"].shape[-1]
    n_out = p["head"]["kernel"].shape[-1]
    return {"kernel": jnp.zeros((width, n_out), jnp.float32),
            "bias": p["head"]["bias"]}


if __name__ == "__main__":
    main()
