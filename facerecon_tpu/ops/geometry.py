"""Geometry core — SURVEY.md §3 C3-C6, C10; math per SURVEY.md §9.1-9.3.

Everything is pure jnp, batched over a leading B axis, and designed to fuse
into a handful of MXU matmuls under jit (the (B,K)x(K,3N) synthesis matmuls
are the dominant geometry FLOPs). float32 throughout — the fidelity contract
is bitwise-closeness to a CPU oracle (SURVEY.md §7), so no bf16 here.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import ops as jops

from facerecon_tpu.config import FaceReconConfig
from facerecon_tpu.utils.coeffs import Coeffs


class DeviceBFM(NamedTuple):
    """BFMAssets mirrored as device arrays (a jit-traceable pytree)."""
    mean_shape: jnp.ndarray      # (3N,)
    id_basis: jnp.ndarray        # (3N, K_id)
    exp_basis: jnp.ndarray       # (3N, K_exp)
    mean_tex: jnp.ndarray        # (3N,)
    tex_basis: jnp.ndarray       # (3N, K_tex)
    sigma_id: jnp.ndarray
    sigma_exp: jnp.ndarray
    sigma_tex: jnp.ndarray
    faces: jnp.ndarray           # (F, 3) int32
    landmark_index: jnp.ndarray  # (68,) int32
    skin_mask: jnp.ndarray       # (N,) f32
    vertex_face_adj: jnp.ndarray  # (N, deg_max) int32, F = pad sentinel
    vertex_corner_adj: jnp.ndarray  # (N, deg_max) int32, 3F = pad
    face_adj_slot: jnp.ndarray   # (F, 3) int32 flat v*deg_max+rank
    raster_rows: jnp.ndarray     # (F', 3) int32 padded raster row order
    raster_row_id: jnp.ndarray   # (F',) int32 face id per row, F+1 = pad
    raster_corner_adj: jnp.ndarray  # (N, deg_max) int32: per vertex, the
                                 # flat CORNER-MAJOR ROW-ORDERED corner
                                 # positions (slot * F' + row) it appears
                                 # at in the render-record gather; 3F' =
                                 # pad. Derived here (not an asset field):
                                 # it makes the record pack's adjoint a
                                 # fixed gather instead of a scatter-add.
    vertex_corner_adj_cm: jnp.ndarray  # (N, deg_max) int32: the same
                                 # corner adjacency in CORNER-MAJOR
                                 # ORIGINAL-FACE-ORDER positions
                                 # (slot * F + face; pad 3F) — the
                                 # adjoint table of the PLANE-form corner
                                 # gathers (take_corner_planes) used by
                                 # the normals path.
    raster_skin: jnp.ndarray     # (3, F') f32: skin-mask value at each
                                 # raster-row corner (skin_mask indexed by
                                 # raster_rows, corner-major). Static per
                                 # asset — rides the 56-row training
                                 # select record so the photometric
                                 # loss's skin mask needs no per-pixel
                                 # gather (ops/render._pack_split_records)


def device_bfm(assets) -> DeviceBFM:
    import numpy as np
    derived = ("raster_corner_adj", "vertex_corner_adj_cm", "raster_skin")
    vals = {f: jnp.asarray(getattr(assets, f))
            for f in DeviceBFM._fields if f not in derived}
    vca = np.asarray(assets.vertex_corner_adj)      # flat face*3+slot
    rid = np.asarray(assets.raster_row_id)
    n_f = assets.faces.shape[0]
    n_rows = rid.shape[0]
    row_of_face = np.zeros(n_f, np.int64)
    live = rid < n_f
    row_of_face[rid[live]] = np.nonzero(live)[0]
    face = np.clip(vca // 3, 0, n_f - 1)
    rca = np.where(vca >= 3 * n_f, 3 * n_rows,
                   (vca % 3) * n_rows + row_of_face[face])
    vals["raster_corner_adj"] = jnp.asarray(rca.astype(np.int32))
    cm = np.where(vca >= 3 * n_f, 3 * n_f, (vca % 3) * n_f + face)
    vals["vertex_corner_adj_cm"] = jnp.asarray(cm.astype(np.int32))
    rows = np.asarray(assets.raster_rows)          # (F', 3), pad rows
    sk = np.asarray(assets.skin_mask, np.float32)  # point at vertex 0 etc.
    vals["raster_skin"] = jnp.asarray(sk[rows.T])  # (3, F')
    return DeviceBFM(**vals)


# --- C3: shape/texture synthesis (SURVEY.md §9.1) ---

# TPU matmuls default to bf16 passes; the fidelity contract (vertex MAE
# < 1e-3 vs the CPU oracle) requires true-f32 synthesis — bf16 here measured
# 1.1e-3 vertex MAE and 84% tri_id agreement at full scale.
_F32 = jax.lax.Precision.HIGHEST


def shape_formation(alpha, beta, bfm: DeviceBFM) -> jnp.ndarray:
    """S = S_mean + A_id alpha + A_exp beta  -> (B, N, 3)."""
    flat = (bfm.mean_shape[None, :]
            + jnp.matmul(alpha, bfm.id_basis.T, precision=_F32)
            + jnp.matmul(beta, bfm.exp_basis.T, precision=_F32))
    return flat.reshape(alpha.shape[0], -1, 3)


def texture_formation(delta, bfm: DeviceBFM) -> jnp.ndarray:
    """T = T_mean + A_tex delta, scaled to [0,1] -> (B, N, 3)."""
    flat = (bfm.mean_tex[None, :]
            + jnp.matmul(delta, bfm.tex_basis.T, precision=_F32))
    return (flat / 255.0).reshape(delta.shape[0], -1, 3)


# --- C4: rigid pose (SURVEY.md §9.2) ---

def compute_rotation(angles) -> jnp.ndarray:
    """Euler radians (B,3) -> R = Rz(psi) Ry(phi) Rx(theta), (B,3,3)."""
    theta, phi, psi = angles[..., 0], angles[..., 1], angles[..., 2]
    c, s = jnp.cos, jnp.sin
    one = jnp.ones_like(theta)
    zero = jnp.zeros_like(theta)
    rx = jnp.stack([one, zero, zero,
                    zero, c(theta), -s(theta),
                    zero, s(theta), c(theta)], -1).reshape(*theta.shape, 3, 3)
    ry = jnp.stack([c(phi), zero, s(phi),
                    zero, one, zero,
                    -s(phi), zero, c(phi)], -1).reshape(*phi.shape, 3, 3)
    rz = jnp.stack([c(psi), -s(psi), zero,
                    s(psi), c(psi), zero,
                    zero, zero, one], -1).reshape(*psi.shape, 3, 3)
    # even 3x3 composes at bf16 by default on TPU (1e-3 error in R)
    return jnp.matmul(jnp.matmul(rz, ry, precision=_F32), rx,
                      precision=_F32)


def rigid_transform(shape, rotation, trans) -> jnp.ndarray:
    """V = S R^T + t : (B,N,3),(B,3,3),(B,3) -> (B,N,3)."""
    return (jnp.einsum("bni,bji->bnj", shape, rotation, precision=_F32)
            + trans[:, None, :])


# --- C5: camera & projection (SURVEY.md §9.3) ---

def camera_depth(verts, cfg: FaceReconConfig) -> jnp.ndarray:
    """z' = c - V_z (camera at (0,0,c) looking down -z)."""
    return cfg.camera_distance - verts[..., 2]


def perspective_projection(verts, cfg: FaceReconConfig) -> jnp.ndarray:
    """World verts (B,N,3) -> pixel coords (B,N,2), image y down."""
    zp = camera_depth(verts, cfg)
    u = cfg.focal * verts[..., 0] / zp + cfg.center
    v = cfg.center - cfg.focal * verts[..., 1] / zp
    return jnp.stack([u, v], axis=-1)


def to_ndc(verts, cfg: FaceReconConfig) -> jnp.ndarray:
    """World verts -> (B,N,3) [x_ndc, y_ndc, depth z'] for the rasterizer.

    x_ndc=(u-W/2)/(W/2), y_ndc=(H/2-v)/(H/2) per SURVEY.md §9.3.
    """
    zp = camera_depth(verts, cfg)
    half = cfg.image_size / 2.0
    x_ndc = cfg.focal * verts[..., 0] / zp / half
    y_ndc = cfg.focal * verts[..., 1] / zp / half
    return jnp.stack([x_ndc, y_ndc, zp], axis=-1)


# --- C6: vertex normals (area-weighted, SURVEY.md §9.4) ---

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def take_corners(per_vert, faces_flat, corner_adj, n_out: int):
    """Gather per-vertex rows to per-face-corner rows with a GATHER-based
    adjoint: jnp.take's natural backward is a scatter-add, which runs at
    ~element/cycle on TPU and dominated the training backward. The mesh
    adjacency is fixed, so the adjoint is itself a gather: each vertex sums
    the cotangents of its incident corners via vertex_corner_adj
    (utils.bfm.vertex_face_adjacency with_corners=True)."""
    del corner_adj, n_out
    return jnp.take(per_vert, faces_flat, axis=-2)


@jax.custom_vjp
def take_corner_planes(planes, faces_flat, corner_adj):
    """PLANE-form corner gather: tuple of (B, N) per-vertex field planes
    -> tuple of (B, 3F) corner planes, gathered along the MINOR axis.

    TPU gathers cost per ROW, not per byte: the row form
    jnp.take((B,N,C), idx, axis=-2) measured 5.5 ms/128 for C=5 at 224px
    while C independent minor-axis (B, idx) <- (B, N) gathers measure
    1.6 ms/128 TOTAL (benchmarks/gather_probe.py) — the narrow-row
    gather pays ~a row per cycle; the plane form runs at ~HBM bandwidth
    and extra planes fuse almost free. The adjoint is the same
    gather-based corner-adjacency sum as take_corners, also in plane
    form (minor-axis gathers in the backward too)."""
    del corner_adj
    return tuple(jnp.take(p, faces_flat, axis=-1) for p in planes)


def _tcp_fwd(planes, faces_flat, corner_adj):
    return (take_corner_planes(planes, faces_flat, corner_adj),
            (corner_adj, planes[0].shape))


def _tcp_bwd(res, g):
    corner_adj, pshape = res
    deg = corner_adj.shape[1]

    def one(gp):
        # per-slot gathers (see _accumulate_fn_planes: a (B, N, deg)
        # reshape-sum pads deg to 128 lanes); same summation order
        g_pad = jnp.concatenate(
            [gp, jnp.zeros((*gp.shape[:-1], 1), gp.dtype)], axis=-1)
        total = jnp.take(g_pad, corner_adj[:, 0], axis=-1)
        for k in range(1, deg):
            total = total + jnp.take(g_pad, corner_adj[:, k], axis=-1)
        return total

    return tuple(one(gp) for gp in g), None, None


take_corner_planes.defvjp(_tcp_fwd, _tcp_bwd)


def _tc_fwd(per_vert, faces_flat, corner_adj, n_out):
    return (take_corners(per_vert, faces_flat, corner_adj, n_out),
            (corner_adj, per_vert.shape))


def _tc_bwd(n_out, res, g):
    corner_adj, vshape = res
    n_vertices, deg = vshape[-2], corner_adj.shape[1]
    pad_shape = list(g.shape)
    pad_shape[-2] = 1
    g_pad = jnp.concatenate([g, jnp.zeros(pad_shape, g.dtype)], axis=-2)
    picked = jnp.take(g_pad, corner_adj.reshape(-1), axis=-2)
    picked = picked.reshape(*g.shape[:-2], n_vertices, deg, g.shape[-1])
    return picked.sum(axis=-2), None, None


take_corners.defvjp(_tc_fwd, _tc_bwd)


@jax.custom_vjp
def _accumulate_face_normals(face_n, adj, faces):
    """Sum each vertex's adjacent face normals by GATHER, with a
    gather-based backward too: d face_n[f] = sum_k g[faces[f, k]] — each
    face corner reads its vertex's cotangent (no scatter)."""
    n_vertices = adj.shape[0]
    pad_shape = list(face_n.shape)
    pad_shape[-2] = 1
    face_n_pad = jnp.concatenate(
        [face_n, jnp.zeros(pad_shape, face_n.dtype)], axis=-2)
    gathered = jnp.take(face_n_pad, adj.reshape(-1), axis=-2)
    gathered = gathered.reshape(
        *face_n.shape[:-2], n_vertices, adj.shape[1], 3)
    return jnp.sum(gathered, axis=-2)


def _afn_fwd(face_n, adj, faces):
    return _accumulate_face_normals(face_n, adj, faces), faces


def _afn_bwd(faces, g):
    picked = jnp.take(g, faces.reshape(-1), axis=-2)
    picked = picked.reshape(*g.shape[:-2], faces.shape[0], 3, 3)
    return picked.sum(axis=-2), None, None


_accumulate_face_normals.defvjp(_afn_fwd, _afn_bwd)


@jax.custom_vjp
def _accumulate_fn_planes(fn_planes, adj, faces):
    """PLANE form of _accumulate_face_normals: tuple of (B, F) face-normal
    component planes -> tuple of (B, N) vertex sums, all gathers along the
    MINOR axis (the (B,N,deg,3) row-gather form measured 3.8 ms/128 at
    224px; plane gathers run at ~bandwidth — benchmarks/gather_probe.py).
    Backward per plane: d face_n[f] = sum_k g[faces[f, k]] — three minor
    gathers, no scatter."""
    n_vertices, deg = adj.shape

    def one(p):
        # per-slot gathers, NOT one (B, N*deg) gather + (B, N, deg) sum:
        # the reshape's minor dim deg(~6) pads to 128 lanes in the TPU
        # tiled layout (~21x traffic amplification if materialized);
        # deg separate (B, N) minor-axis gathers fuse into the sum.
        # Same k = 0..deg-1 summation order -> bit-identical.
        p_pad = jnp.concatenate(
            [p, jnp.zeros((*p.shape[:-1], 1), p.dtype)], axis=-1)
        total = jnp.take(p_pad, adj[:, 0], axis=-1)
        for k in range(1, deg):
            total = total + jnp.take(p_pad, adj[:, k], axis=-1)
        return total

    return tuple(one(p) for p in fn_planes)


def _afnp_fwd(fn_planes, adj, faces):
    return _accumulate_fn_planes(fn_planes, adj, faces), faces


def _afnp_bwd(faces, g):
    def one(gp):
        return sum(jnp.take(gp, faces[:, c], axis=-1) for c in range(3))

    return tuple(one(gp) for gp in g), None, None


_accumulate_fn_planes.defvjp(_afnp_fwd, _afnp_bwd)


def compute_norm(verts, faces, n_vertices: int, adj=None,
                 corner_adj=None, corner_adj_cm=None) -> jnp.ndarray:
    """Per-vertex normals: area-weighted face normals summed per vertex.

    With `adj` (precomputed (N, deg_max) vertex->face adjacency, padded with
    F) the accumulation is a fixed GATHER — TPU scatters (segment_sum) cost
    ~1 element/cycle and dominated geometry time; without adj the
    segment_sum fallback is used (arbitrary meshes at load time get
    adjacency from utils.bfm.vertex_face_adjacency anyway).

    With `corner_adj_cm` (DeviceBFM.vertex_corner_adj_cm) the whole path
    runs in PLANE form: per-component minor-axis gathers for both the
    corner fetch and the accumulation, with gather-based adjoints — the
    row-gather form cost 7.3 ms/128 at 224px vs ~2 in plane form
    (benchmarks/gather_probe.py: TPU gathers pay per row, not per byte).
    Same float ops on the same values, so the result is bit-identical.
    """
    if corner_adj_cm is not None and adj is not None:
        f = faces.shape[0]
        idx_cm = jnp.transpose(faces).reshape(-1)           # corner-major
        planes = tuple(verts[..., k] for k in range(3))     # (B, N) each
        cx, cy, cz = take_corner_planes(planes, idx_cm, corner_adj_cm)

        def corner(p, c):
            return p[..., c * f:(c + 1) * f]

        ax = corner(cx, 1) - corner(cx, 0)                  # v1 - v0
        ay = corner(cy, 1) - corner(cy, 0)
        az = corner(cz, 1) - corner(cz, 0)
        bx = corner(cx, 2) - corner(cx, 0)                  # v2 - v0
        by = corner(cy, 2) - corner(cy, 0)
        bz = corner(cz, 2) - corner(cz, 0)
        fn = (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)
        vn = _accumulate_fn_planes(fn, adj[:, :], faces)
        vert_n = jnp.stack(vn, axis=-1)                     # (B, N, 3)
        norm = jnp.linalg.norm(vert_n, axis=-1, keepdims=True)
        return vert_n / jnp.maximum(norm, 1e-8)
    if corner_adj is not None:
        # scatter-free corner gather (incl. its backward)
        corners = take_corners(verts, faces.reshape(-1), corner_adj,
                               3 * faces.shape[0])
        corners = corners.reshape(*verts.shape[:-2], faces.shape[0], 3, 3)
        v0, v1, v2 = (corners[..., 0, :], corners[..., 1, :],
                      corners[..., 2, :])
    else:
        v0 = jnp.take(verts, faces[:, 0], axis=-2)
        v1 = jnp.take(verts, faces[:, 1], axis=-2)
        v2 = jnp.take(verts, faces[:, 2], axis=-2)
    face_n = jnp.cross(v1 - v0, v2 - v0)  # area-weighted (not normalized)
    if adj is not None and corner_adj is not None:
        vert_n = _accumulate_face_normals(face_n, adj, faces)
    elif adj is not None:
        pad_shape = list(face_n.shape)
        pad_shape[-2] = 1
        face_n_pad = jnp.concatenate(
            [face_n, jnp.zeros(pad_shape, face_n.dtype)], axis=-2)
        gathered = jnp.take(face_n_pad, adj.reshape(-1), axis=-2)
        gathered = gathered.reshape(
            *face_n.shape[:-2], n_vertices, adj.shape[1], 3)
        vert_n = jnp.sum(gathered, axis=-2)
    else:
        idx = faces.reshape(-1)  # (3F,)
        tiled = jnp.repeat(face_n, 3, axis=-2)  # (..., 3F, 3)
        vert_n = jops.segment_sum(
            jnp.moveaxis(tiled, -2, 0), idx, num_segments=n_vertices)
        vert_n = jnp.moveaxis(vert_n, 0, -2)
    norm = jnp.linalg.norm(vert_n, axis=-1, keepdims=True)
    return vert_n / jnp.maximum(norm, 1e-8)


# --- C10: landmark projection ---

def project_landmarks(verts, bfm: DeviceBFM, cfg: FaceReconConfig):
    """Gather the 68 landmark vertices and project to 2D pixels (B,68,2)."""
    lm_verts = jnp.take(verts, bfm.landmark_index, axis=-2)
    return perspective_projection(lm_verts, cfg)


# --- full coefficient -> world geometry helper ---

class Geometry(NamedTuple):
    shape: jnp.ndarray        # (B,N,3) canonical shape
    verts_world: jnp.ndarray  # (B,N,3) posed
    verts_ndc: jnp.ndarray    # (B,N,3) [x_ndc,y_ndc,depth]
    texture: jnp.ndarray      # (B,N,3) albedo [0,1]
    normals: jnp.ndarray      # (B,N,3) world-space vertex normals
    landmarks2d: jnp.ndarray  # (B,68,2) pixel coords


def coeffs_to_geometry(c: Coeffs, bfm: DeviceBFM,
                       cfg: FaceReconConfig) -> Geometry:
    shape = shape_formation(c.id, c.exp, bfm)
    tex = texture_formation(c.tex, bfm)
    rot = compute_rotation(c.angles)
    verts = rigid_transform(shape, rot, c.trans)
    n_vertices = shape.shape[-2]
    # normals rotate with the mesh: compute in canonical frame, rotate
    normals = compute_norm(shape, bfm.faces, n_vertices,
                           adj=bfm.vertex_face_adj,
                           corner_adj=bfm.vertex_corner_adj,
                           corner_adj_cm=bfm.vertex_corner_adj_cm)
    normals = jnp.einsum("bni,bji->bnj", normals, rot, precision=_F32)
    return Geometry(
        shape=shape,
        verts_world=verts,
        verts_ndc=to_ndc(verts, cfg),
        texture=tex,
        normals=normals,
        landmarks2d=project_landmarks(verts, bfm, cfg),
    )
