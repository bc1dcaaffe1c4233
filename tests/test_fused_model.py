"""Inference-fused CNN (models/fused.py) equals the training model.

BN folding and the space-to-depth stem rewrite are exact transforms; with
f32 compute the fused regressor must reproduce the BN model to float
rounding on non-trivial (perturbed) parameters and batch statistics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from facerecon_tpu.models.fused import build_fused_model, fuse_variables
from facerecon_tpu.models.resnet import build_model


def _perturb(tree, key):
    flat, treedef = jtu.tree_flatten(tree)
    rngs = jax.random.split(jax.random.PRNGKey(key), len(flat))
    return jtu.tree_unflatten(
        treedef,
        [f + 0.1 * jax.random.normal(r, f.shape) for f, r in zip(flat, rngs)])


def test_fused_model_matches_bn_model(cfg):
    model = build_model(cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    # non-trivial weights + running stats (fresh init has zero head / unit
    # stats, which would hide folding mistakes)
    v = {"params": _perturb(v["params"], 1),
         "batch_stats": jtu.tree_map(
             lambda x: jnp.abs(x) + 0.01, _perturb(v["batch_stats"], 2))}

    fused = build_fused_model(cfg, dtype=jnp.float32)
    fv = fuse_variables(v, cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 64, 64, 3)), jnp.float32)
    y_bn = model.apply(v, x, train=False)
    y_f = fused.apply(fv, x)
    scale = float(jnp.abs(y_bn).max())
    assert float(jnp.abs(y_bn - y_f).max()) < 1e-5 * scale


def test_fused_param_count_matches(cfg):
    """Folding must consume every conv and BN: same conv kernels, BN gone."""
    model = build_model(cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    fv = fuse_variables(v, cfg)
    n_convs = sum(1 for p in jtu.tree_leaves_with_path(v["params"])
                  if "Conv" in str(p[0]))
    n_fused = sum(1 for p in jtu.tree_leaves_with_path(fv["params"])
                  if "kernel" in str(p[0]) and "head" not in str(p[0]))
    assert n_fused == n_convs  # one fused kernel per original conv
