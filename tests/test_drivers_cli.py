"""Driver-level tests exercising run() entry points on the tiny CPU config
(the CLI surfaces of workload configs 1/4/5 + the fidelity evaluator)."""

import argparse
import json

import numpy as np


def _ns(**kw):
    return argparse.Namespace(**kw)


def test_evaluate_meets_contract(tmp_path):
    from facerecon_tpu import evaluate
    rep = evaluate.run(_ns(faces=2, bfm=None, tiny=True, seed=0))
    assert rep["meets_contract"]
    assert rep["vertex_mae"] < 1e-6
    assert rep["tri_id_agreement_min"] > 0.999


def test_infer_writes_outputs(tmp_path):
    from facerecon_tpu import infer
    out = str(tmp_path / "o")
    rep = infer.run(_ns(images=None, synthetic=2, out=out, ckpt=None,
                        bfm=None, tiny=True, seed=0, overlay=True,
                        depth=True))
    assert rep["n_images"] == 2
    for suffix in (".obj", "_render.png", "_landmarks.txt", "_coeffs.npy",
                   "_overlay.png", "_depth.png"):
        assert (tmp_path / "o" / f"synthetic_0{suffix}").exists(), suffix


def test_fit_improves(tmp_path):
    from facerecon_tpu import fit
    rep = fit.run(_ns(steps=60, batch=1, lr=2e-2, landmarks=True,
                      out=None, tiny=True, seed=0))
    assert rep["loss_last"] < rep["loss_first"]


def test_track_cli_smoke():
    """CLI surface only — loss decreases and metrics are finite. The real
    geometry-recovery thresholds (vertex MAE, landmark RMSE against the
    generating coefficients) live in test_fit_track_ckpt.py."""
    from facerecon_tpu import track
    rep = track.run(_ns(frames=4, refine_steps=30, lr=1e-2, bfm=None,
                        tiny=True, seed=0))
    assert rep["loss_last"] < rep["loss_first"]
    assert np.isfinite(rep["psnr_db"])
