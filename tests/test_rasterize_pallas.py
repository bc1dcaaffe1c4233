"""Pallas TPU rasterizer under pytest via interpret mode (SURVEY.md §5.3).

The flagship kernel (ops/rasterize_pallas.py) must match the numpy oracle
exactly in interpret mode — including the fused record-select phase, the
custom VJP, and the multi-window overflow path that spatially incoherent
face orderings exercise. These tests run the SAME kernel code the TPU runs
(interpret=True only swaps the executor), so a kernel regression fails CI.
"""

import numpy as np
import jax
import jax.numpy as jnp

from facerecon_tpu import oracle
from facerecon_tpu.ops import geometry as G
from facerecon_tpu.ops import rasterize_pallas as RP
from facerecon_tpu.ops import sh as sh_ops
from facerecon_tpu.ops.render import (_pack_render_records,
                                      _shade_from_sel, shade_packed)
from facerecon_tpu.utils.coeffs import split_coeff

from conftest import make_coeff


def _sel_img(sel, height, width, tile_h):
    """BANDED (B, n_bands, 48, band_px) select output -> (B, 48, H, W)
    numpy image planes (the kernel's band pixel order is row-major)."""
    a = np.asarray(sel)
    b, nb, nf, band_px = a.shape
    tile_w = band_px // tile_h
    a = a.transpose(0, 2, 1, 3).reshape(b, nf, nb * tile_h, tile_w)
    return a[:, :, :height, :width]


def _geom(cfg, assets, rng, batch=1, yaw=None):
    bfm = G.device_bfm(assets)
    coeff = make_coeff(cfg, rng, batch=batch)
    if yaw is not None:
        # in-plane (roll) rotation widens the static-binning band spans —
        # the historical failure mode of the fixed-window kernel
        coeff[:, cfg.coeff_split[2] + 2] = yaw
    c = split_coeff(jnp.asarray(coeff), cfg)
    return bfm, c, G.coeffs_to_geometry(c, bfm, cfg)


def test_pallas_matches_oracle_on_face_mesh(cfg, assets, rng):
    bfm, _, geom = _geom(cfg, assets, rng)
    vndc = np.asarray(geom.verts_ndc)[0]
    h = w = cfg.image_size
    tid_o, bary_o, z_o = oracle.rasterize(vndc, assets.faces, h, w)
    tid_p, bary_p, z_p = RP.rasterize(jnp.asarray(vndc), bfm.faces,
                                      height=h, width=w)
    tid_p = np.asarray(tid_p)
    assert np.array_equal(tid_p, tid_o)
    cov = tid_o >= 0
    np.testing.assert_allclose(np.asarray(bary_p)[cov], bary_o[cov],
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(z_p)[cov], z_o[cov],
                               rtol=1e-4, atol=1e-4)
    # contract: barycentrics sum to 1 inside coverage, 0 outside
    s = np.asarray(bary_p).sum(-1)
    np.testing.assert_allclose(s[cov], 1.0, atol=1e-3)
    assert np.all(s[~cov] == 0.0)


def test_pallas_shuffled_face_order_multi_window(cfg, assets, rng):
    """Shuffled faces destroy spatial coherence: every band's candidate
    span covers ~the whole mesh, far beyond one DMA window. Round 1
    silently truncated here; the multi-window loop must stay exact."""
    bfm, _, geom = _geom(cfg, assets, rng)
    vndc = np.asarray(geom.verts_ndc)[0]
    h = w = cfg.image_size
    perm = np.random.default_rng(3).permutation(assets.faces.shape[0])
    faces_sh = assets.faces[perm]
    tid_o, _, _ = oracle.rasterize(vndc, faces_sh, h, w)
    tid_p, _, _ = RP.rasterize(jnp.asarray(vndc), jnp.asarray(faces_sh),
                               height=h, width=w)
    assert np.array_equal(np.asarray(tid_p), tid_o)


def test_pallas_inplane_rotation(cfg, assets, rng):
    """45° roll widens band spans (binning degrades gracefully, never
    incorrectly)."""
    bfm, _, geom = _geom(cfg, assets, rng, yaw=np.pi / 4)
    vndc = np.asarray(geom.verts_ndc)[0]
    h = w = cfg.image_size
    tid_o, _, _ = oracle.rasterize(vndc, assets.faces, h, w)
    tid_p, _, _ = RP.rasterize(jnp.asarray(vndc), bfm.faces,
                               height=h, width=w)
    assert np.array_equal(np.asarray(tid_p), tid_o)


def test_pallas_triangle_soup():
    h = w = 48
    local = np.random.default_rng(11)
    n_verts = 40
    verts = local.uniform(-1.0, 1.0, size=(n_verts, 3)).astype(np.float32)
    verts[:, 2] = local.uniform(5.0, 15.0, size=n_verts)
    faces = local.integers(0, n_verts, size=(60, 3)).astype(np.int32)
    tid_o, _, z_o = oracle.rasterize(verts, faces, h, w)
    tid_p, _, z_p = RP.rasterize(jnp.asarray(verts), jnp.asarray(faces),
                                 height=h, width=w)
    tid_p, z_p = np.asarray(tid_p), np.asarray(z_p)
    diff = tid_p != tid_o
    # random soups contain exact-tie overlaps where 1-ulp rounding between
    # the affine and direct edge forms flips the winner; depth must agree
    assert diff.mean() < 2e-2
    za = np.where(np.isfinite(z_p), z_p, 0.0)
    zb = np.where(np.isfinite(z_o), z_o, 0.0)
    if diff.any():
        assert np.abs(za - zb)[diff].max() < 1e-3


def test_fused_select_matches_gather_path(cfg, assets, rng):
    """rasterize_select (the TPU render hot path) must match the plain jnp
    gather shading: radiance through the 16-bit hi/lo split (rel err
    <= 2^-16), barycentrics through the full-precision affine fields."""
    bfm, c, geom = _geom(cfg, assets, rng, batch=2)
    h = w = cfg.image_size
    radiance = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
    records = _pack_render_records(
        geom.verts_ndc, radiance, bfm.faces, h, w,
        RP.padded_rows(bfm.faces.shape[0]))
    tid, sel = RP.rasterize_select(
        records, geom.verts_ndc, bfm.faces, h, w, cfg.tile_h)
    color_f, bary_f, _ = _shade_from_sel(tid, sel, h, w, tile_h=cfg.tile_h)

    tid_ref, _, _ = RP.rasterize_batch(
        geom.verts_ndc, bfm.faces, height=h, width=w, tile_h=cfg.tile_h)
    color_r, bary_r = shade_packed(tid_ref, geom.verts_ndc, radiance,
                                   bfm.faces, h, w)
    assert np.array_equal(np.asarray(tid), np.asarray(tid_ref))
    np.testing.assert_allclose(np.asarray(color_f), np.asarray(color_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(bary_f), np.asarray(bary_r),
                               atol=1e-4)
    # background pixels must select the zero record (sel is banded)
    bg = np.asarray(tid) < 0
    sel_i = _sel_img(sel, h, w, cfg.tile_h)
    assert np.all(np.moveaxis(sel_i, 1, -1)[bg] == 0.0)


def test_fused_select_vjp_is_scatter_add(cfg, assets, rng):
    """d/d records of the reconstructed attributes == scatter-add of the
    per-pixel cotangent over winner positions (the §9.6 contract)."""
    bfm, c, geom = _geom(cfg, assets, rng)
    h = w = cfg.image_size
    radiance = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
    records = _pack_render_records(
        geom.verts_ndc, radiance, bfm.faces, h, w,
        RP.padded_rows(bfm.faces.shape[0]))
    tid, sel = RP.rasterize_select(
        records, geom.verts_ndc, bfm.faces, h, w, cfg.tile_h)
    local = np.random.default_rng(5)
    g17 = jnp.asarray(local.standard_normal(
        (*tid.shape, 17)).astype(np.float32))

    def f(r):
        out = RP.rasterize_select(r, geom.verts_ndc, bfm.faces, h, w,
                                  cfg.tile_h)[1]
        b, nb, nf, band_px = out.shape
        tile_w = band_px // cfg.tile_h
        out = jnp.transpose(out, (0, 1, 3, 2))     # banded, field-minor
        out = out.reshape(b, nb * cfg.tile_h, tile_w, nf)[:, :h, :w]
        rad = out[..., 0:9] + out[..., 9:18]       # reconstructed radiance
        wcf = (out[..., 18:24] + out[..., 24:30]
               + out[..., 30:36])                  # affine w-coefficients
        anc = jnp.stack([out[..., 36:39].sum(-1),
                         out[..., 39:42].sum(-1)], -1)
        return jnp.sum(jnp.concatenate([rad, wcf, anc], -1) * g17)

    grad = np.asarray(jax.grad(f)(records))   # (B, 24, rows) field-major
    pos = np.asarray(tid)
    exp = np.zeros((records.shape[0], records.shape[2], 24), np.float32)
    gn = np.concatenate([np.asarray(g17),
                         np.zeros((*pos.shape, 7), np.float32)], -1)
    b_idx, i_idx, j_idx = np.nonzero(pos >= 0)
    np.add.at(exp, (b_idx, pos[b_idx, i_idx, j_idx]),
              gn[b_idx, i_idx, j_idx])
    # the matmul adjoint carries the cotangent at 16-bit (hi/lo bf16
    # split) — training-grade precision by design
    np.testing.assert_allclose(grad, exp.transpose(0, 2, 1), atol=1e-4)


def test_shaded_matches_select_path(cfg, assets, rng):
    """rasterize_shaded (the inference hot path: in-kernel barycentric +
    radiance blend, 16-field output) must match rasterize_select +
    _shade_from_sel to the bf16 hi/lo packing of the final color/bary
    (>=16 significand bits), with IDENTICAL tri_id."""
    bfm, c, geom = _geom(cfg, assets, rng, batch=2)
    h = w = cfg.image_size
    radiance = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
    records = _pack_render_records(
        geom.verts_ndc, radiance, bfm.faces, h, w,
        RP.padded_rows(bfm.faces.shape[0]))
    tid_s, sel = RP.rasterize_select(
        records, geom.verts_ndc, bfm.faces, h, w, cfg.tile_h)
    color_s, bary_s, _ = _shade_from_sel(tid_s, sel, h, w, tile_h=cfg.tile_h)

    tid, color, bary = RP.rasterize_shaded(
        records, geom.verts_ndc, bfm.faces, height=h, width=w,
        tile_h=cfg.tile_h)
    assert np.array_equal(np.asarray(tid), np.asarray(tid_s))
    np.testing.assert_allclose(np.asarray(color), np.asarray(color_s),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(bary), np.asarray(bary_s),
                               atol=1e-4)


def test_raster_row_order_and_columns_match_identity(cfg, assets, rng):
    """The shipped TPU configuration — static (y-bin, x)-sorted chunk-
    aligned raster row order + multi-column windows — must produce
    IDENTICAL tri_id/sel/zbuf to the identity-order single-column path
    (same float ops on the same winner records; only the candidate
    enumeration changes), and its VJP must be the identity VJP routed
    through the row permutation."""
    bfm, c, geom = _geom(cfg, assets, rng, batch=2)
    h = w = cfg.image_size
    radiance = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
    f = bfm.faces.shape[0]

    rec_id = _pack_render_records(
        geom.verts_ndc, radiance, bfm.faces, h, w, RP.padded_rows(f))
    tid0, sel0 = RP.rasterize_select(
        rec_id, geom.verts_ndc, bfm.faces, h, w, cfg.tile_h)

    rows = bfm.raster_rows
    rid = bfm.raster_row_id
    rec_rows = _pack_render_records(
        geom.verts_ndc, radiance, rows, h, w,
        RP.padded_rows(rows.shape[0]))
    for n_cols in (1, 4):
        tid, sel = RP.rasterize_select(
            rec_rows, geom.verts_ndc, bfm.faces, h, w, cfg.tile_h,
            n_cols=n_cols, row_faces=rows, row_id=rid)
        assert np.array_equal(np.asarray(tid), np.asarray(tid0)), n_cols
        # fields 45:48 carry the winner's RASTER ROW bytes (the backward's
        # one-hot key) and legitimately differ between row orders; all
        # render-visible fields must be identical
        sel_i = _sel_img(sel, h, w, cfg.tile_h)
        sel0_i = _sel_img(sel0, h, w, cfg.tile_h)
        np.testing.assert_array_equal(sel_i[:, :45], sel0_i[:, :45])
        # the row bytes decode to the PERMUTED winner row: row_id[row]
        # must equal the winner face id at every covered pixel
        rown = (sel_i[:, 45] + sel_i[:, 46] * 256 + sel_i[:, 47] * 65536
                ).astype(np.int64) - 1
        cov = np.asarray(tid) >= 0
        rid_np = np.asarray(rid)
        assert np.array_equal(rid_np[rown[cov]], np.asarray(tid)[cov])

    # VJP: the row-order gradient is the identity gradient permuted to
    # rows (zero at bin-pad rows)
    def loss_id(r):
        _, sel = RP.rasterize_select(
            r, geom.verts_ndc, bfm.faces, h, w, cfg.tile_h)
        return jnp.sum(sel[:, :, 9:18] ** 2)

    def loss_rows(r):
        _, sel = RP.rasterize_select(
            r, geom.verts_ndc, bfm.faces, h, w, cfg.tile_h, n_cols=4,
            row_faces=rows, row_id=rid)
        return jnp.sum(sel[:, :, 9:18] ** 2)

    g_id = np.asarray(jax.grad(loss_id)(rec_id))     # (B, 24, rows)
    g_rows = np.asarray(jax.grad(loss_rows)(rec_rows))
    rid_np = np.asarray(rid)
    live = rid_np <= f - 1
    np.testing.assert_allclose(g_rows[:, :, :rid_np.shape[0]][:, :, live],
                               g_id[:, :, rid_np[live]], atol=1e-5)
    assert np.all(g_rows[:, :, :rid_np.shape[0]][:, :, ~live] == 0.0)


def test_pallas_z_fighting_tie_rule(cfg):
    """Two identical triangles: the lower face id must win, also across
    chunk/group boundaries (the second copy padded far down the array)."""
    verts = np.array([[-0.5, -0.5, 8.0], [0.5, -0.5, 8.0], [0.0, 0.5, 8.0]],
                     np.float32)
    n_copies = 3000   # second copy lands in a different group
    verts = np.tile(verts, (2, 1))
    faces = np.zeros((n_copies, 3), np.int32)
    faces[0] = [0, 1, 2]
    faces[1:-1] = [0, 0, 0]        # degenerate fillers
    faces[-1] = [3, 4, 5]          # identical triangle, highest id
    tid, _, _ = RP.rasterize(jnp.asarray(verts), jnp.asarray(faces),
                             height=32, width=32)
    tid = np.asarray(tid)
    assert set(np.unique(tid)) <= {-1, 0}


def test_pack_gradient_finite_on_degenerate_triangle(cfg, assets):
    """A zero-area triangle makes the affine-form reciprocal 1/area infinite;
    the where-discarded branch still NaN's the gradient unless the operand
    is guarded (this NaN'd training on TPU). The pack must stay finite."""
    from facerecon_tpu.ops.render import _pack_render_records
    bfm = G.device_bfm(assets)
    n = assets.n_vertices
    rng = np.random.default_rng(0)
    v = rng.standard_normal((1, n, 3)).astype(np.float32)
    # collapse the first triangle's corners to one point
    f0 = assets.faces[0]
    v[0, f0[1]] = v[0, f0[0]]
    v[0, f0[2]] = v[0, f0[0]]
    verts = jnp.asarray(v)
    radiance = jnp.ones((1, n, 3), jnp.float32)
    rows = RP.padded_rows(assets.n_faces)

    def loss(vv):
        rec = _pack_render_records(vv, radiance, bfm.faces, 32, 32, rows)
        return jnp.sum(rec ** 2)

    g = jax.grad(loss)(verts)
    assert bool(jnp.isfinite(g).all()), "NaN gradient on degenerate triangle"


def test_pack_split_records_matches_split_of_pack24(cfg, assets, rng):
    """The ONE-materialization pre-split pack (_pack_split_records,
    built directly from the shared field blocks) must be BIT-IDENTICAL
    to splitting the 24-field attribute record (splits commute with the
    zero row padding; same float ops either way). This pins the fold
    that lets XLA dead-code the 24-stack out of the training forward."""
    from facerecon_tpu.ops.render import (_pack_render_records,
                                          _pack_split_records,
                                          _render_fields)
    bfm, c, geom = _geom(cfg, assets, rng, batch=2)
    h = w = cfg.image_size
    radiance = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
    rows, rid = bfm.raster_rows, bfm.raster_row_id
    pad_rows = RP.padded_rows(rows.shape[0])

    rec24 = _pack_render_records(geom.verts_ndc, radiance, rows, h, w,
                                 pad_rows,
                                 corner_adj=bfm.raster_corner_adj)
    ref = RP._split_records(rec24, rid)
    fields = _render_fields(geom.verts_ndc, radiance, rows, h, w,
                            corner_adj=bfm.raster_corner_adj)
    got = _pack_split_records(fields, rid, pad_rows)
    assert got.dtype == ref.dtype and got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_contract_path_row_order_matches_identity(cfg, assets, rng):
    """rasterize_batch (the §9.5 contract path, routed through the fused
    select kernel with the z/w-affine contract record) must produce the
    SAME (tri_id, bary, zbuf) under the asset's raster row order + column
    tiles as under identity order/1 column — the id-valued tie rule and
    the exact bf16 record splits make the output row-order-invariant."""
    bfm, _, geom = _geom(cfg, assets, rng, batch=2)
    h = w = cfg.image_size
    tid_a, bary_a, z_a = RP.rasterize_batch(
        geom.verts_ndc, bfm.faces, height=h, width=w, tile_h=cfg.tile_h)
    tid_b, bary_b, z_b = RP.rasterize_batch(
        geom.verts_ndc, bfm.faces, height=h, width=w, tile_h=cfg.tile_h,
        n_cols=cfg.raster_cols, row_faces=bfm.raster_rows,
        row_id=bfm.raster_row_id)
    assert np.array_equal(np.asarray(tid_a), np.asarray(tid_b))
    np.testing.assert_array_equal(np.asarray(bary_a), np.asarray(bary_b))
    cov = np.asarray(tid_a) >= 0
    np.testing.assert_array_equal(np.asarray(z_a)[cov],
                                  np.asarray(z_b)[cov])


def test_skin_record_select_matches_gather_mask(cfg, assets, rng):
    """The 56-row training record's select-delivered skin mask must equal
    the per-pixel gather it replaces (losses.skin_mask_image) to the
    16-bit hi/lo split precision (rel err <= 2^-16, same contract as the
    radiance fields): the skin corners ride rows 48:54, and the blend
    uses the same barycentrics in the same corner order."""
    from facerecon_tpu.ops.losses import skin_mask_image
    from facerecon_tpu.ops.render import (RenderOut, _pack_split_records,
                                          _render_fields, _stack24)
    bfm, c, geom = _geom(cfg, assets, rng, batch=2)
    h = w = cfg.image_size
    radiance = sh_ops.illuminate(geom.texture, geom.normals, c.gamma)
    rows, rid = bfm.raster_rows, bfm.raster_row_id
    pad_rows = RP.padded_rows(rows.shape[0])
    fields = _render_fields(geom.verts_ndc, radiance, rows, h, w,
                            corner_adj=bfm.raster_corner_adj)
    rec56 = _pack_split_records(fields, rid, pad_rows,
                                skin=bfm.raster_skin)
    assert rec56.shape[1] == 56
    tid, sel = RP.rasterize_select(
        _stack24(fields, pad_rows), geom.verts_ndc, bfm.faces, h, w,
        cfg.tile_h, row_faces=rows, row_id=rid, rec48=rec56)
    _, bary, skin = _shade_from_sel(tid, sel, h, w, tile_h=cfg.tile_h)
    assert skin is not None
    out = RenderOut(image=None, mask=(tid >= 0).astype(jnp.float32),
                    tri_id=tid, bary=bary, radiance=None, geometry=None)
    ref = skin_mask_image(out, bfm)
    got = out.mask * skin
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5)
