"""Native C++ CPU rasterizer vs numpy oracle: bitwise-identical outputs
(same f32 operation order, FMA contraction disabled)."""

import numpy as np
import pytest
import jax.numpy as jnp

from facerecon_tpu import oracle
from facerecon_tpu.ops import geometry as G
from facerecon_tpu.utils import native_oracle
from facerecon_tpu.utils.coeffs import split_coeff

from conftest import make_coeff

pytestmark = pytest.mark.skipif(not native_oracle.is_available(),
                                reason="g++ toolchain unavailable")


def test_native_matches_numpy_oracle_bitwise_soup():
    for seed in range(5):
        rng = np.random.default_rng(200 + seed)
        verts = rng.uniform(-1.0, 1.0, size=(40, 3)).astype(np.float32)
        verts[:, 2] = rng.uniform(5.0, 15.0, size=40)
        faces = rng.integers(0, 40, size=(60, 3)).astype(np.int32)
        tid_o, bary_o, z_o = oracle.rasterize(verts, faces, 48, 48)
        tid_n, bary_n, z_n = native_oracle.rasterize(verts, faces, 48, 48)
        np.testing.assert_array_equal(tid_n, tid_o)
        np.testing.assert_array_equal(bary_n, bary_o)
        np.testing.assert_array_equal(z_n, z_o)


def test_native_matches_numpy_oracle_face_mesh(cfg, assets, rng):
    coeff = make_coeff(cfg, rng, batch=1)
    bfm = G.device_bfm(assets)
    c = split_coeff(jnp.asarray(coeff), cfg)
    geom = G.coeffs_to_geometry(c, bfm, cfg)
    vndc = np.asarray(geom.verts_ndc)[0]
    h = w = cfg.image_size
    tid_o, bary_o, z_o = oracle.rasterize(vndc, assets.faces, h, w)
    tid_n, bary_n, z_n = native_oracle.rasterize(vndc, assets.faces, h, w)
    np.testing.assert_array_equal(tid_n, tid_o)
    np.testing.assert_array_equal(bary_n, bary_o)
    np.testing.assert_array_equal(z_n, z_o)
