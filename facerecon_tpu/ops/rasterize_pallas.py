"""Pallas TPU z-buffer rasterizer — SURVEY.md §3 C8, design §9.5.

Placeholder module: `is_available()` gates the backend choice in
ops/render.py. The tiled Pallas kernel lands behind `rasterize_batch` with
the same contract as ops/rasterize_jnp.py.
"""

from __future__ import annotations


def is_available() -> bool:
    return False


def rasterize_batch(verts_ndc, faces, *, height, width, cfg):
    raise NotImplementedError("Pallas rasterizer not yet wired in")
