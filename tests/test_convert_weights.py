"""Structured torch-ResNet weight import (SURVEY.md §6 checkpoint row).

A torchvision-shaped ResNet-50 state_dict is synthesized in-env (torch-cpu
is available): every tensor is filled with a distinct constant, so a
mis-mapped same-shaped layer — the failure mode of greedy suffix matching —
is caught exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facerecon_tpu.convert_weights import (_resnet_key_map,
                                           from_torch_state_dict,
                                           import_torch_resnet)
from facerecon_tpu.pipeline import init_params, make_pipeline

torch = pytest.importorskip("torch")


def _template_shapes(variables):
    """flax tree address -> shape, for building the torch twin."""
    shapes = {}
    for col in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(variables[col])[0]
        for path, leaf in flat:
            key = ".".join(str(getattr(p, "key", p)) for p in path)
            shapes[(col, key)] = tuple(leaf.shape)
    return shapes


def _make_torch_sd(variables):
    """torchvision-style state_dict matching the flax template's shapes;
    tensor i is filled with the constant i."""
    shapes = _template_shapes(variables)
    key_map = _resnet_key_map(50)
    sd, truth = {}, {}
    for i, (tname, (col, module, leaf)) in enumerate(sorted(key_map.items())):
        shape = shapes[(col, f"{module}.{leaf}")]
        if tname == "fc.weight":
            shape = (1000, shape[0])      # torch (out,in); WRONG out dim
        elif tname == "fc.bias":
            shape = (1000,)
        elif tname.endswith("conv1.weight") or ".conv" in tname \
                or "downsample.0" in tname:
            # torch convs are OIHW; flax HWIO
            shape = (shape[3], shape[2], shape[0], shape[1])
        val = float(i + 1)
        sd[tname] = torch.full(shape, val)
        truth[(col, f"{module}.{leaf}")] = val
    return sd, truth


def test_structured_import_maps_every_layer(tmp_path, cfg):
    from facerecon_tpu.utils.bfm import synthetic_bfm
    pipe = make_pipeline(cfg, synthetic_bfm(cfg, 0))
    variables = init_params(pipe, jax.random.PRNGKey(0))

    sd, truth = _make_torch_sd(variables)
    path = str(tmp_path / "resnet50.pt")
    torch.save(sd, path)
    flat = from_torch_state_dict(path)
    new_vars, report = import_torch_resnet(variables, flat)

    # the classifier head (1000-class) must be skipped by shape, nothing
    # else; no unknown names
    assert sorted(s[0] for s in report["shape_skipped"]) == [
        "fc.bias", "fc.weight"]
    assert report["unknown_keys"] == []
    assert report["missing_expected"] == []
    assert report["imported"] == len(sd) - 2

    for col in ("params", "batch_stats"):
        flat_t = jax.tree_util.tree_flatten_with_path(new_vars[col])[0]
        for p, leaf in flat_t:
            key = ".".join(str(getattr(q, "key", q)) for q in p)
            want = truth.get((col, key))
            if want is None or key.startswith("Dense_0"):
                continue
            got = np.unique(np.asarray(leaf))
            assert got.size == 1 and float(got[0]) == want, (
                f"{col}/{key}: got {got}, want {want}")


def test_import_reports_shape_mismatch(cfg):
    from facerecon_tpu.utils.bfm import synthetic_bfm
    pipe = make_pipeline(cfg, synthetic_bfm(cfg, 0))
    variables = init_params(pipe, jax.random.PRNGKey(0))
    bad = {"conv1.weight": np.zeros((3, 3, 3, 64), np.float32),
           "not.a.resnet.key": np.zeros((1,), np.float32)}
    _, report = import_torch_resnet(variables, bad)
    assert report["imported"] == 0
    assert report["shape_skipped"][0][0] == "conv1.weight"
    assert report["unknown_keys"] == ["not.a.resnet.key"]


def test_tf_checkpoint_import(tmp_path):
    """from_tf_checkpoint + import_flat on a REAL TF-1.x-style checkpoint
    (plain variable names via tf.compat.v1.train.Saver — the format the
    reference family ships; SURVEY.md §6 checkpoint row)."""
    import pytest
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    from facerecon_tpu.convert_weights import from_tf_checkpoint, import_flat

    rng = np.random.default_rng(3)
    k = rng.standard_normal((4, 3)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    decoy = rng.standard_normal((7,)).astype(np.float32)
    ckpt = str(tmp_path / "tf1" / "model.ckpt")
    with tf1.Graph().as_default():
        tf1.get_variable("net/Dense_0/kernel", initializer=k)
        tf1.get_variable("net/Dense_0/bias", initializer=b)
        tf1.get_variable("net/unrelated", initializer=decoy)
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, ckpt)

    flat = from_tf_checkpoint(ckpt)
    assert "net/Dense_0/kernel" in flat
    np.testing.assert_array_equal(flat["net/Dense_0/kernel"], k)

    template = {"Dense_0": {"kernel": np.zeros((4, 3), np.float32),
                            "bias": np.zeros((3,), np.float32)},
                "Other_0": {"kernel": np.zeros((2, 2), np.float32)}}
    new_params, report = import_flat(template, flat)
    np.testing.assert_array_equal(np.asarray(new_params["Dense_0"]["kernel"]),
                                  k)
    np.testing.assert_array_equal(np.asarray(new_params["Dense_0"]["bias"]),
                                  b)
    # the unmatched template leaf keeps its value; the decoy maps nowhere
    assert np.all(np.asarray(new_params["Other_0"]["kernel"]) == 0.0)
    assert report["matched"] == 2
    assert report["unmatched"] == 1


def test_tf_cli_roundtrip(tmp_path):
    """python -m facerecon_tpu.convert_weights --tf ... --out ... produces
    a restorable orbax checkpoint (the --torch twin is tested above)."""
    import pytest
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    from facerecon_tpu import convert_weights as cw
    from facerecon_tpu.checkpoint import CheckpointManager

    # a TF1 ckpt holding one recognizable head kernel for the tiny model
    from facerecon_tpu.config import tiny_config
    from facerecon_tpu.pipeline import init_params, make_pipeline
    from facerecon_tpu.utils.bfm import synthetic_bfm
    cfg2 = tiny_config()
    pipe = make_pipeline(cfg2, synthetic_bfm(cfg2, 0))
    variables = init_params(pipe, jax.random.PRNGKey(0))
    head = variables["params"]["Dense_0"]["kernel"]
    marker = np.full(head.shape, 0.125, np.float32)

    ckpt = str(tmp_path / "tfsrc" / "model.ckpt")
    with tf1.Graph().as_default():
        tf1.get_variable("Dense_0/kernel", initializer=marker)
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, ckpt)

    out_dir = str(tmp_path / "converted")
    cw.main(["--tf", ckpt, "--out", out_dir, "--tiny"])
    mgr = CheckpointManager(out_dir)
    state = mgr.restore()
    got = np.asarray(state["variables"]["params"]["Dense_0"]["kernel"])
    np.testing.assert_array_equal(got, marker)
