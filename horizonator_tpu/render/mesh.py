"""Mesh rasterizer: the reference's triangle pipeline, re-built for parity.

The reference renders a dense regular-grid triangulation -- two triangles
per DEM cell split along the (i,j)->(i+1,j+1) diagonal
(horizonator-lib.c:496-507) -- through an equirect vertex shader
(vertex.glsl:112-156), a geometry-shader seam cull that drops triangles
spanning more than a quarter of the viewport (geometry.glsl:21-27), and a
z-buffered fill with depth = normalized slant range (vertex.glsl:155).

This module reproduces those exact semantics as a jittable JAX renderer:
batched vertex projection through the shared geometry module, the same
diagonal split, the same seam-cull rule, barycentric coverage with
perspective-correct-enough linear depth interpolation, and a scatter-min
z-buffer. It exists for *fidelity*: parity runs against the production
ray-march renderers (which are algebraically equivalent for a heightfield
under this projection but sample the surface differently) and as the
oracle for the reference's triangle-level behaviors. The production path
is the Pallas window kernel (window.py); scatter-min is not a fast TPU
operation and this renderer is O(triangles x bbox) -- use it at test
scales or for offline exact-mesh renders.

Triangles are rasterized into a fixed per-triangle pixel bounding box
(``max_bbox`` static); triangles projecting larger than the box (very
close terrain at low resolutions) are counted and dropped -- choose znear/
resolution so overflow_count == 0 for exact runs (returned for asserting).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .. import geometry
from .raymarch import RenderParams

DEG = math.pi / 180.0


def _project_vertices(dem, params: RenderParams, *, width, height,
                      cells_per_deg):
    """Project every DEM vertex: returns x (pixel, fractional), y, rng
    (slant meters), plus az unwrapped near the window center."""
    p = params
    n = dem.shape[0]
    cell_n = geometry.EARTH_RADIUS_M * DEG / cells_per_deg
    cell_e = cell_n * p.cos_viewer_lat

    jj = jnp.arange(n, dtype=jnp.float32)
    ii = jnp.arange(n, dtype=jnp.float32)
    east = (ii[None, :] - p.viewer_cell_i) * cell_e             # (n, n)
    north = (jj[:, None] - p.viewer_cell_j) * cell_n
    h = dem - p.viewer_z

    d_ne = jnp.hypot(east, north)
    rng = jnp.hypot(d_ne, h)
    az = jnp.arctan2(east, north)

    az1u, az_center, az_ndc_per_rad = geometry.az_window_rad(
        p.az_rad0, p.az_rad1)
    azu = geometry.unwrap_near_rad(az, az_center)
    az_ndc = (azu - az_center) * az_ndc_per_rad
    el = jnp.arctan2(h - d_ne * d_ne * p.curv, d_ne)
    aspect = width / height
    el_ndc = el * az_ndc_per_rad * aspect

    x = (az_ndc + 1.0) * 0.5 * width - 0.5       # pixel-center coords
    y = (1.0 - el_ndc) * 0.5 * height - 0.5
    return x, y, rng, d_ne, az_ndc


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cells_per_deg", "max_bbox"))
def render_mesh(dem, params: RenderParams, *, width, height, cells_per_deg,
                max_bbox=12):
    """Rasterize the reference's terrain mesh. Returns (image, ranges,
    overflow_count); image/ranges use the same conventions as
    render_panorama (BGR u8 sky-blue / f32 slant meters, invisible -1)."""
    p = params
    n = dem.shape[0]
    x, y, rng, d_ne, az_ndc = _project_vertices(
        dem, params, width=width, height=height, cells_per_deg=cells_per_deg)

    # Vertex ids of the two triangles per cell, diagonal (i,j)->(i+1,j+1)
    # (horizonator-lib.c:496-507): lower (v00, v10, v11), upper (v00, v11,
    # v01), with v_ab = vertex at (j+a, i+b).
    def corners(arr):
        a00 = arr[:-1, :-1].ravel()
        a10 = arr[:-1, 1:].ravel()
        a01 = arr[1:, :-1].ravel()
        a11 = arr[1:, 1:].ravel()
        return a00, a10, a01, a11

    tris = []
    for arr in (x, y, rng, d_ne, az_ndc):
        a00, a10, a01, a11 = corners(arr)
        lower = jnp.stack([a00, a10, a11], axis=1)     # (C, 3)
        upper = jnp.stack([a00, a11, a01], axis=1)
        tris.append(jnp.concatenate([lower, upper], axis=0))   # (T, 3)
    tx, ty, trng, tdne, tazn = tris
    t_count = tx.shape[0]

    # Culls -- all per reference semantics:
    #   seam: max-min az_ndc > 0.5 (a quarter of the 2-wide ndc viewport,
    #         geometry.glsl:21-27);
    #   clip: any vertex nearer znear or farther zfar in horizontal
    #         distance (vertex.glsl clips via gl depth outside [0,1]).
    span = tazn.max(axis=1) - tazn.min(axis=1)
    keep = (span <= 0.5)
    keep &= (tdne.min(axis=1) <= p.zfar) & (tdne.max(axis=1) >= p.znear)
    keep &= (tdne.max(axis=1) > p.znear)   # fully-inside-znear dropped

    # Bounding boxes, clamped to the viewport.
    x0 = jnp.floor(tx.min(axis=1)).astype(jnp.int32)
    x1 = jnp.ceil(tx.max(axis=1)).astype(jnp.int32)
    y0 = jnp.floor(ty.min(axis=1)).astype(jnp.int32)
    y1 = jnp.ceil(ty.max(axis=1)).astype(jnp.int32)
    overflow = keep & ((x1 - x0 >= max_bbox) | (y1 - y0 >= max_bbox))
    keep &= ~overflow
    keep &= (x1 >= 0) & (x0 < width) & (y1 >= 0) & (y0 < height)
    overflow_count = jnp.sum(overflow)

    x0c = jnp.clip(x0, 0, width - 1)
    y0c = jnp.clip(y0, 0, height - 1)

    # Rasterize each triangle over its max_bbox x max_bbox window.
    bb = jnp.arange(max_bbox, dtype=jnp.float32)
    px = x0c[:, None].astype(jnp.float32) + bb[None, :]         # (T, B)
    py = y0c[:, None].astype(jnp.float32) + bb[None, :]

    ax, bx, cx = tx[:, 0], tx[:, 1], tx[:, 2]
    ay, by, cy = ty[:, 0], ty[:, 1], ty[:, 2]
    det = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    pxg = px[:, None, :]                                        # (T, 1, B)
    pyg = py[:, :, None]                                        # (T, B, 1)
    w0 = ((bx - ax)[:, None, None] * (pyg - ay[:, None, None])
          - (by - ay)[:, None, None] * (pxg - ax[:, None, None])) / \
        det[:, None, None]
    w1 = ((cx - bx)[:, None, None] * (pyg - by[:, None, None])
          - (cy - by)[:, None, None] * (pxg - bx[:, None, None])) / \
        det[:, None, None]
    w2 = 1.0 - w0 - w1
    # w0 = barycentric weight of vertex C, w1 of A, w2 of B (from the edge
    # functions); coverage = all same-sign-ish (GL fills either winding).
    inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)

    depth = (w1[...] * trng[:, 0][:, None, None]
             + w2 * trng[:, 1][:, None, None]
             + w0 * trng[:, 2][:, None, None])
    dne_i = (w1 * tdne[:, 0][:, None, None]
             + w2 * tdne[:, 1][:, None, None]
             + w0 * tdne[:, 2][:, None, None])

    gx = x0c[:, None, None] + jnp.arange(max_bbox, dtype=jnp.int32)[None,
                                                                    None, :]
    gy = y0c[:, None, None] + jnp.arange(max_bbox, dtype=jnp.int32)[None, :,
                                                                    None]
    gx = jnp.broadcast_to(gx, depth.shape)
    gy = jnp.broadcast_to(gy, depth.shape)
    valid = (inside & keep[:, None, None]
             & (gx < width) & (gy < height)
             & (dne_i >= p.znear) & (dne_i <= p.zfar))

    flat_idx = jnp.where(valid, gy * width + gx, width * height)
    zbuf = jnp.full((width * height + 1,), jnp.inf, jnp.float32)
    zbuf = zbuf.at[flat_idx.ravel()].min(
        jnp.where(valid, depth, jnp.inf).ravel())
    # d_ne buffer for the color ramp, keyed LEXICOGRAPHICALLY on
    # (depth, d_ne): pass 1 scattered the exact f32 min depth; pass 2
    # restricts to fragments EXACTLY equal to that stored min (at least one
    # exists by construction -- no tolerance needed) and takes the min d_ne
    # among exact-depth ties. GL's tie winner is arbitrary; this one is
    # deterministic.
    dbuf = jnp.full((width * height + 1,), jnp.inf, jnp.float32)
    won = valid & (depth == zbuf[flat_idx])
    dbuf = dbuf.at[flat_idx.ravel()].min(
        jnp.where(won, dne_i, jnp.inf).ravel())

    zb = zbuf[:width * height].reshape(height, width)
    db = dbuf[:width * height].reshape(height, width)
    sky = ~jnp.isfinite(zb)
    ranges = jnp.where(sky, -1.0, zb)

    red = jnp.clip((db - p.znear_color) / (p.zfar_color - p.znear_color),
                   0.0, 1.0)
    r8 = jnp.round(red * 255.0).astype(jnp.uint8)
    image = jnp.stack([jnp.where(sky, 255, 0).astype(jnp.uint8),
                       jnp.zeros((height, width), jnp.uint8),
                       jnp.where(sky, 0, r8).astype(jnp.uint8)], axis=-1)
    return image, ranges, overflow_count
