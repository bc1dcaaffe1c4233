"""TPU-hardware parity contract (BASELINE.json "bitwise-close").

The interpret-mode tests prove the kernel exactly matches the numpy
oracle when both run the same f32 ops. On real TPU the affine edge form
evaluates with TPU rounding, so a sliver of pixels sitting exactly on a
z-fighting tie can pick the other face. This test pins that carve-out
down as an ASSERTED property instead of a journal note: tri_id mismatch
rate <= 5e-5 of covered pixels (measured 2e-5 = 0.99998 agreement on the
round-3 kernel, STATUS.md fidelity table; the bound is 2.5x that,
averaged over two seeds to absorb tie-cluster variance), and every
mismatching pixel is a genuine z-fighting tie on a both-covered pixel
(|z_tpu - z_oracle| < 1e-3) — never a wrong-geometry or wrong-coverage
pixel.

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
h = w = cfg.image_size
mism = 0
cov = 0
bad_depth = 0
# two seeds: the 5e-5 bound is tight enough (~20 tie pixels over one
# 4-image batch) that a single unlucky tie cluster could flake it;
# averaging over 2 batches halves the variance at negligible cost
for seed in (7, 8):
    rng = np.random.default_rng(seed)
    batch = 4
    cv = jnp.asarray(sample_coeffs(rng, cfg, batch, scale=0.3))
    geom = G.coeffs_to_geometry(split_coeff(cv, cfg), bfm, cfg)

    tid_t, _, z_t = RP.rasterize_batch(geom.verts_ndc, bfm.faces,
                                       height=h, width=w,
                                       tile_h=cfg.tile_h)
    tid_t = np.asarray(tid_t)
    z_t = np.asarray(z_t)

    vndc = np.asarray(geom.verts_ndc)
    for b in range(batch):
        tid_o, _, z_o = oracle.rasterize(vndc[b], assets.faces, h, w)
        covered = (tid_o >= 0) | (tid_t[b] >= 0)
        cov += int(covered.sum())
        d = covered & (tid_t[b] != tid_o)
        mism += int(d.sum())
        # a legitimate mismatch is a z-fighting tie on a pixel BOTH
        # rasterizers cover: the two winners meet at (near-)equal depth.
        # A coverage disagreement (one side background) is never a tie —
        # count it as bad directly instead of comparing against a
        # sentinel depth (z is camera-space today, far from 0, but an
        # NDC-range depth convention would put real depths near 0).
        both = (tid_o >= 0) & (tid_t[b] >= 0)
        tie_ok = both & (np.abs(np.where(both, z_o, 0.0)
                                - np.where(both, z_t[b], 0.0)) < 1e-3)
        bad_depth += int((d & ~tie_ok).sum())
print(json.dumps({"mismatch": mism, "covered": cov,
                  "bad_depth": bad_depth}))
"""


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") != "1",
                    reason="needs real TPU (set RUN_TPU_TESTS=1)")
def test_tpu_tri_id_tie_bound():
    # undo ONLY the conftest's fake-multi-device injection; any unrelated
    # XLA flags the user had set stay in force for the child
    env = dict(os.environ)
    flags = [t for t in env.get("XLA_FLAGS", "").split()
             if not t.startswith("--xla_force_host_platform_device_count")]
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    # budget: ~190 s of TPU compiles + 8 numpy-oracle rasterizations at
    # 224^2 (~90 s each) — 1200 s was measured just short
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True,
        text=True, timeout=2700,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-3000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["covered"] > 0
    rate = stats["mismatch"] / stats["covered"]
    # the z-fighting carve-out: rare, and ALWAYS a genuine depth tie
    assert rate <= 5e-5, stats
    assert stats["bad_depth"] == 0, stats
