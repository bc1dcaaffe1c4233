"""Aux subsystem tests: prefetch feeder, alignment preprocessing,
weight-converter mapping."""

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu.data.feeder import prefetch
from facerecon_tpu.data.preprocess import (align_face, canonical_template,
                                           similarity_transform, warp_affine)


def test_prefetch_preserves_order_and_completes():
    src = (np.full((2, 2), i) for i in range(10))
    out = list(prefetch(src, depth=3))
    assert len(out) == 10
    for i, a in enumerate(out):
        assert (a == i).all()


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise ValueError("boom")
    it = prefetch(bad(), depth=2)
    assert next(it) == 1
    try:
        next(it)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_similarity_transform_recovers_known():
    rng = np.random.default_rng(0)
    src = rng.random((5, 2)).astype(np.float32) * 100
    ang, s, t = 0.3, 1.7, np.array([5.0, -3.0])
    rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    dst = (src @ (s * rot).T) + t
    m = similarity_transform(src, dst)
    ones = np.ones((5, 1))
    back = np.concatenate([src, ones], 1) @ m.T
    np.testing.assert_allclose(back, dst, atol=1e-3)


def test_align_face_lands_on_template():
    rng = np.random.default_rng(1)
    img = rng.random((256, 256, 3)).astype(np.float32)
    tpl = canonical_template(224)
    # landmarks = template shifted/scaled in the source image
    lm5 = tpl * 0.9 + 20.0
    aligned, lm68 = align_face(img, lm5, 224, landmarks68=lm5)
    assert aligned.shape == (224, 224, 3)
    assert aligned.min() >= 0 and aligned.max() <= 1
    np.testing.assert_allclose(lm68, tpl, atol=1e-2)


def test_warp_affine_identity():
    img = np.arange(16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    out = warp_affine(img, ident, 16)
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_convert_weights_maps_by_name_and_shape(cfg, assets):
    from facerecon_tpu.convert_weights import flatten_params, import_flat
    from facerecon_tpu.pipeline import init_params, make_pipeline
    pipe = make_pipeline(cfg, assets, depth=18)
    variables = init_params(pipe, jax.random.PRNGKey(0))
    params = variables["params"]
    flat = flatten_params(params)
    # perturb and import back: everything should match
    flat2 = {k: v + 1.0 for k, v in flat.items()}
    new_params, report = import_flat(params, flat2)
    assert report["unmatched"] == 0
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(new_params)[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a) + 1.0)
