"""TPU-hardware parity contract (BASELINE.json "bitwise-close").

The interpret-mode tests prove the kernel exactly matches the numpy
oracle when both run the same f32 ops. On real TPU the affine edge form
evaluates with TPU rounding, so a sliver of pixels sitting exactly on a
z-fighting tie can pick the other face. This test pins that carve-out
down as an ASSERTED property instead of a journal note: tri_id mismatch
rate <= 5e-5 of covered pixels, and every mismatching pixel is a genuine
depth tie (|z_tpu - z_oracle| < 1e-3) — never a wrong-geometry pixel.

Runs only on real TPU hardware: the suite's conftest forces the CPU
backend, so the check executes in a clean-env subprocess and is skipped
unless RUN_TPU_TESTS=1 (set it when a TPU is attached).
"""

import json
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import json
import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu import oracle
from facerecon_tpu.config import default_config
from facerecon_tpu.data.synthetic import sample_coeffs
from facerecon_tpu.ops import geometry as G
from facerecon_tpu.ops import rasterize_pallas as RP
from facerecon_tpu.utils.bfm import synthetic_bfm
from facerecon_tpu.utils.coeffs import split_coeff

assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()

cfg = default_config()
assets = synthetic_bfm(cfg, seed=0)
bfm = G.device_bfm(assets)
rng = np.random.default_rng(7)
batch = 4
cv = jnp.asarray(sample_coeffs(rng, cfg, batch, scale=0.3))
geom = G.coeffs_to_geometry(split_coeff(cv, cfg), bfm, cfg)
h = w = cfg.image_size

tid_t, _, z_t = RP.rasterize_batch(geom.verts_ndc, bfm.faces,
                                   height=h, width=w, tile_h=cfg.tile_h)
tid_t = np.asarray(tid_t)
z_t = np.asarray(z_t)

vndc = np.asarray(geom.verts_ndc)
mism = 0
cov = 0
bad_depth = 0
for b in range(batch):
    tid_o, _, z_o = oracle.rasterize(vndc[b], assets.faces, h, w)
    covered = (tid_o >= 0) | (tid_t[b] >= 0)
    cov += int(covered.sum())
    d = covered & (tid_t[b] != tid_o)
    mism += int(d.sum())
    # a legitimate mismatch is a z-fighting tie: both faces meet the
    # pixel at (near-)equal depth. Compare the two winners' depths.
    zo = np.where(np.isfinite(z_o), z_o, 0.0)
    zt = np.where(np.isfinite(z_t[b]), z_t[b], 0.0)
    bad_depth += int((d & (np.abs(zo - zt) >= 1e-3)).sum())
print(json.dumps({"mismatch": mism, "covered": cov,
                  "bad_depth": bad_depth}))
"""


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") != "1",
                    reason="needs real TPU (set RUN_TPU_TESTS=1)")
def test_tpu_tri_id_tie_bound():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True,
        text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-3000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["covered"] > 0
    rate = stats["mismatch"] / stats["covered"]
    # the z-fighting carve-out: rare, and ALWAYS a genuine depth tie
    assert rate <= 5e-5, stats
    assert stats["bad_depth"] == 0, stats
