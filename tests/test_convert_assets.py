"""`.mat` -> `.npz` converter roundtrip (SURVEY.md §3 C1: the reference
loads MATLAB BFM packs; convert_assets bridges them to the npz loader)."""

import numpy as np
import pytest

sio = pytest.importorskip("scipy.io")

from facerecon_tpu.config import tiny_config
from facerecon_tpu.convert_assets import convert
from facerecon_tpu.utils.bfm import load_npz, synthetic_bfm


@pytest.fixture(scope="module")
def src():
    return synthetic_bfm(tiny_config(), seed=3)


def test_deep3d_style_roundtrip(tmp_path, src):
    mat = tmp_path / "bfm_front.mat"
    out = tmp_path / "bfm.npz"
    sio.savemat(mat, {
        "meanshape": src.mean_shape[None, :],
        "idBase": src.id_basis,
        "exBase": src.exp_basis,
        "meantex": src.mean_tex[None, :],
        "texBase": src.tex_basis,
        "tri": src.faces.astype(np.float64) + 1,     # 1-indexed, float mat
        "keypoints": src.landmark_index[None, :].astype(np.float64) + 1,
        "skinmask": src.skin_mask[None, :],
    })
    convert(str(mat), str(out), verbose=False)
    got = load_npz(str(out))
    np.testing.assert_array_equal(got.faces, src.faces)
    np.testing.assert_array_equal(got.landmark_index, src.landmark_index)
    np.testing.assert_allclose(got.mean_shape, src.mean_shape)
    np.testing.assert_allclose(got.id_basis, src.id_basis)
    np.testing.assert_allclose(got.exp_basis, src.exp_basis)
    np.testing.assert_allclose(got.skin_mask, src.skin_mask)
    # Deep3DFace bases are eigenvalue-scaled -> unit sigmas
    assert np.all(got.sigma_id == 1.0) and np.all(got.sigma_tex == 1.0)
    # derived tables recomputed and usable
    assert got.vertex_face_adj.shape[0] == got.n_vertices
    assert got.raster_row_id.shape[0] == got.raster_rows.shape[0]
    assert got.raster_rows.shape[0] % 128 == 0


def test_bfm09_style_with_exp_side_file(tmp_path, src):
    mat = tmp_path / "model.mat"
    expm = tmp_path / "exp.mat"
    out = tmp_path / "bfm09.npz"
    k_id = src.id_basis.shape[1]
    sio.savemat(mat, {
        "shapeMU": src.mean_shape[:, None],
        "shapePC": src.id_basis,
        "shapeEV": src.sigma_id[:, None],
        "texMU": src.mean_tex[:, None],
        "texPC": src.tex_basis,
        "texEV": src.sigma_tex[:, None],
        "tl": src.faces.astype(np.float64) + 1,
    })
    sio.savemat(expm, {
        "expPC": src.exp_basis,
        "expEV": src.sigma_exp[:, None],
    })
    convert(str(mat), str(out), n_id=k_id,
            n_exp=src.exp_basis.shape[1], n_tex=src.tex_basis.shape[1],
            exp_mat=str(expm), verbose=False)
    got = load_npz(str(out))
    np.testing.assert_array_equal(got.faces, src.faces)
    np.testing.assert_allclose(got.id_basis, src.id_basis)
    np.testing.assert_allclose(got.sigma_id, src.sigma_id)
    np.testing.assert_allclose(got.exp_basis, src.exp_basis)
    np.testing.assert_allclose(got.sigma_exp, src.sigma_exp)
    # BFM09 ships no keypoints/skinmask: loud defaults
    assert got.skin_mask.shape == (got.n_vertices,)
    assert np.all(got.skin_mask == 1.0)


def test_truncation_and_bad_indices(tmp_path, src):
    mat = tmp_path / "model.mat"
    sio.savemat(mat, {
        "shapeMU": src.mean_shape[:, None],
        "shapePC": src.id_basis,
        "shapeEV": src.sigma_id[:, None],
        "texMU": src.mean_tex[:, None],
        "texPC": src.tex_basis,
        "texEV": src.sigma_tex[:, None],
        "tl": src.faces.astype(np.float64) + 1,
    })
    got = convert(str(mat), str(tmp_path / "t.npz"), n_id=7, n_exp=5,
                  n_tex=6, verbose=False)
    assert got.id_basis.shape[1] == 7
    assert got.exp_basis.shape[1] == 5 and np.all(got.exp_basis == 0.0)
    assert got.tex_basis.shape[1] == 6

    bad = dict(sio.loadmat(str(mat)))
    bad["tl"] = bad["tl"] + 10_000  # out of range
    sio.savemat(str(mat), bad)
    with pytest.raises(ValueError, match="out of range"):
        convert(str(mat), str(tmp_path / "b.npz"), verbose=False)

    sio.savemat(str(mat), {"something_else": np.zeros(3)})
    with pytest.raises(ValueError, match="unrecognized"):
        convert(str(mat), str(tmp_path / "c.npz"), verbose=False)
