"""Pretrained-weights import converter — SURVEY.md §6 (checkpoint row).

The reference family ships TF-1.x checkpoints of the coefficient-regressor
CNN. No reference weights exist in this environment, so this module defines
the conversion CONTRACT and a working generic path:

  * `import_flat(params_template, flat)` maps a {path: array} dict onto the
    flax parameter tree by matching paths and shapes — the common ground for
    any external checkpoint once its reader produces name->array pairs;
  * `from_torch_state_dict` / `from_tf_checkpoint` are thin readers that
    produce that flat dict (torch-cpu is available in-env; TF reader is
    gated on tensorflow being importable).

Usage:
  python -m facerecon_tpu.convert_weights --torch sd.pt --out ckpt_dir
"""

from __future__ import annotations

import argparse
from typing import Dict, Mapping

import numpy as np
import jax


def flatten_params(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out


def import_flat(params_template, flat: Mapping[str, np.ndarray],
                strict: bool = False):
    """Map a flat {name: array} dict onto a flax param tree by name+shape.

    Names are matched on the normalized tail (case/sep-insensitive); arrays
    must match shapes exactly. Unmatched template leaves keep their values.
    Returns (new_params, report dict).
    """
    def norm(k: str) -> str:
        return k.lower().replace(".", "/").replace("-", "_")

    budget = {norm(k): np.asarray(v) for k, v in flat.items()}
    used, missed = [], []

    def pick(path_key: str, leaf):
        nk = norm(path_key)
        for cand, arr in budget.items():
            if (cand.endswith(nk) or nk.endswith(cand)) \
                    and arr.shape == leaf.shape:
                used.append(cand)
                return jax.numpy.asarray(arr, dtype=leaf.dtype)
        missed.append(path_key)
        return leaf

    flat_t = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for path, leaf in flat_t[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        leaves.append(pick(key, leaf))
    new_params = jax.tree_util.tree_unflatten(flat_t[1], leaves)
    report = {"matched": len(used), "unmatched": len(missed),
              "unmatched_keys": missed[:20]}
    if strict and missed:
        raise ValueError(f"unmatched parameters: {missed[:10]} ...")
    return new_params, report


def _resnet_key_map(depth: int = 50) -> Dict[str, tuple]:
    """Deterministic torchvision-ResNet name -> facerecon tree address map.

    Structured on (layer index, block index, param kind) — NOT greedy
    name-suffix matching, which mis-maps same-shaped layers (every ResNet
    has dozens). Addresses are ('params'|'batch_stats', module, leaf).
    """
    stages = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}[depth]

    def bn(prefix, module):
        return {
            f"{prefix}.weight": ("params", module, "scale"),
            f"{prefix}.bias": ("params", module, "bias"),
            f"{prefix}.running_mean": ("batch_stats", module, "mean"),
            f"{prefix}.running_var": ("batch_stats", module, "var"),
        }

    m = {"conv1.weight": ("params", "Conv_0", "kernel"),
         "fc.weight": ("params", "Dense_0", "kernel"),
         "fc.bias": ("params", "Dense_0", "bias")}
    m.update(bn("bn1", "BatchNorm_0"))
    blk = 0
    for li, n_blocks in enumerate(stages):
        for k in range(n_blocks):
            mod = f"BottleneckBlock_{blk}"
            pre = f"layer{li + 1}.{k}"
            for j in (1, 2, 3):
                m[f"{pre}.conv{j}.weight"] = (
                    "params", f"{mod}.Conv_{j - 1}", "kernel")
                m.update(bn(f"{pre}.bn{j}", f"{mod}.BatchNorm_{j - 1}"))
            if k == 0:
                # only the first block of a stage projects the residual
                # (channel/stride change) — in torchvision AND in
                # models/resnet.py's shape-mismatch condition
                m[f"{pre}.downsample.0.weight"] = (
                    "params", f"{mod}.Conv_3", "kernel")
                m.update(bn(f"{pre}.downsample.1", f"{mod}.BatchNorm_3"))
            blk += 1
    return m


def import_torch_resnet(variables, flat: Mapping[str, np.ndarray],
                        depth: int = 50):
    """Import a torchvision-style ResNet state_dict (already converted to
    a flat numpy dict by from_torch_state_dict) into {params, batch_stats}
    by the structured _resnet_key_map. The classifier head is skipped when
    its shape differs (the reference regresses coefficients, not classes).

    Returns (variables, report) where report lists every decision.
    """
    key_map = _resnet_key_map(depth)
    new_vars = jax.tree_util.tree_map(np.asarray, variables)
    imported, skipped, unknown = [], [], []

    def address(col, module, leaf):
        node = new_vars[col]
        for part in module.split("."):
            node = node[part]
        return node, leaf

    for name, arr in flat.items():
        if name not in key_map:
            unknown.append(name)
            continue
        col, module, leaf = key_map[name]
        node, leaf_key = address(col, module, leaf)
        arr = np.asarray(arr)
        if name == "fc.weight":
            arr = arr.T          # torch Linear is (out, in); flax (in, out)
        if node[leaf_key].shape != arr.shape:
            skipped.append((name, tuple(arr.shape),
                            tuple(node[leaf_key].shape)))
            continue
        node[leaf_key] = arr.astype(node[leaf_key].dtype)
        imported.append(name)

    missing = [k for k in key_map
               if k not in flat and not k.startswith("fc.")]
    report = {"imported": len(imported), "shape_skipped": skipped,
              "unknown_keys": unknown,
              "missing_expected": missing}
    return ({"params": jax.tree_util.tree_map(jax.numpy.asarray,
                                              new_vars["params"]),
             "batch_stats": jax.tree_util.tree_map(jax.numpy.asarray,
                                                   new_vars["batch_stats"])},
            report)


def from_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        a = v.detach().cpu().numpy()
        # torch convs are OIHW; flax expects HWIO
        if a.ndim == 4:
            a = np.transpose(a, (2, 3, 1, 0))
        out[k] = a
    return out


def from_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    try:
        import tensorflow as tf  # present in-env, avoided elsewhere
    except Exception as e:  # pragma: no cover
        raise RuntimeError("tensorflow unavailable for TF ckpt import") from e
    reader = tf.train.load_checkpoint(path)
    return {k: reader.get_tensor(k)
            for k in reader.get_variable_to_shape_map()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch", default=None)
    p.add_argument("--tf", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    from facerecon_tpu.config import default_config, tiny_config
    from facerecon_tpu.pipeline import init_params, make_pipeline
    from facerecon_tpu.utils.bfm import synthetic_bfm
    from facerecon_tpu.checkpoint import CheckpointManager

    cfg = tiny_config() if args.tiny else default_config()
    pipe = make_pipeline(cfg, synthetic_bfm(cfg, 0))
    variables = init_params(pipe, jax.random.PRNGKey(0))

    if args.torch:
        flat = from_torch_state_dict(args.torch)
        new_vars, report = import_torch_resnet(variables, flat)
        variables = {**variables, **new_vars}
    elif args.tf:
        flat = from_tf_checkpoint(args.tf)
        params, report = import_flat(variables["params"], flat)
        variables = {**variables, "params": params}
    else:
        raise SystemExit("provide --torch or --tf")

    print(report)
    mgr = CheckpointManager(args.out)
    mgr.save(0, {"variables": jax.device_get(variables), "step": 0})
    mgr.wait()
    print(f"saved converted checkpoint to {args.out}")


if __name__ == "__main__":
    main()
