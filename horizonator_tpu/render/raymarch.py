"""Column ray-march panorama renderer (pure jax.numpy; jit/vmap-able).

This replaces the reference's whole GL pipeline -- mesh build
(horizonator-lib.c:403-512), vertex/geometry/fragment shaders (vertex.glsl,
geometry.glsl, fragment.glsl), the z-buffered draw (horizonator-lib.c:887-899)
and the depth->range readback (horizonator-lib.c:978-1047) -- with a direct
algorithm that exploits the projection's structure: in an equirectangular
panorama every image column IS a fixed azimuth, so visibility per column is a
1D horizon scan along the ray:

  for each column x (azimuth az_x):
      march the ray at distances d_0..d_{K-1} in [znear, zfar];
      sample the terrain surface -> elevation angle el_k;
      running max M_k = max(el_0..el_k) is the horizon profile so far;
      pixel row y (elevation el_y) is filled by the FIRST sample with
      M_k >= el_y; no sample -> sky.

This produces the same image contract as the reference's rasterizer (same
projection, same distance-red shading ramp vertex.glsl:159-162, same BGR/u8 +
float32-range outputs, top row first, invisible=-1, horizonator.h:155-169)
without triangles, and it is embarrassingly parallel over (columns x steps):
it maps onto the TPU VPU as dense (W,K) vector math plus one cummax and a
batched binary search. A full 360-degree panorama needs no seam handling at
all (the reference must discard seam-spanning triangles, geometry.glsl:21-27).

Sampling the surface at <= 1 cell spacing along the ray reproduces the
triangulated surface to sub-cell accuracy; ``surface='triangulated'`` samples
the reference's exact two-triangles-per-cell surface (diagonal from (i,j) to
(i+1,j+1), horizonator-lib.c:496-507), ``surface='bilinear'`` uses the smooth
bilinear patch (default).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import geometry

DEG = math.pi / 180.0


class RenderParams(NamedTuple):
    """Traced per-render scene/camera state (replaces GL uniforms,
    horizonator.h:23-35). All float32 scalars."""
    viewer_cell_i: jax.Array   # fractional grid coords of the viewer
    viewer_cell_j: jax.Array
    viewer_z: jax.Array        # viewer elevation, meters
    cos_viewer_lat: jax.Array
    az_rad0: jax.Array         # azimuth of the LEFT viewport edge
    az_rad1: jax.Array         # azimuth of the RIGHT viewport edge
    znear: jax.Array           # clip distances, meters (horizonator.h:9-10)
    zfar: jax.Array
    znear_color: jax.Array     # shading ramp extents, meters
    zfar_color: jax.Array


def _sample_surface(dem, i_pos, j_pos, surface):
    """Sample the terrain surface at fractional grid coords.

    dem: (N, N) float32, dem[j, i], row 0 = south. Out-of-grid handled by the
    caller via masking; indices are clipped here only for memory safety.
    """
    n = dem.shape[0]
    i0 = jnp.clip(jnp.floor(i_pos), 0, n - 2).astype(jnp.int32)
    j0 = jnp.clip(jnp.floor(j_pos), 0, n - 2).astype(jnp.int32)
    fi = jnp.clip(i_pos - i0, 0.0, 1.0)
    fj = jnp.clip(j_pos - j0, 0.0, 1.0)
    flat = dem.reshape(-1)
    base = j0 * n + i0
    z00 = jnp.take(flat, base)
    z10 = jnp.take(flat, base + 1)
    z01 = jnp.take(flat, base + n)
    z11 = jnp.take(flat, base + n + 1)
    if surface == "bilinear":
        top = z00 + (z10 - z00) * fi
        bot = z01 + (z11 - z01) * fi
        return top + (bot - top) * fj
    elif surface == "triangulated":
        # Two triangles per cell split along the (i,j)->(i+1,j+1) diagonal,
        # matching the reference mesh (horizonator-lib.c:496-507).
        z_lower = z00 + (z10 - z00) * fi + (z11 - z10) * fj  # fj <= fi half
        z_upper = z00 + (z11 - z01) * fi + (z01 - z00) * fj  # fj >  fi half
        return jnp.where(fj <= fi, z_lower, z_upper)
    else:
        raise ValueError(f"unknown surface mode {surface!r}")


def _first_crossing(m, t):
    """Batched lower-bound search: for sorted-ascending rows m (W, K) and
    thresholds t (W, H), the smallest k with m[w, k] >= t[w, h]; K if none.

    Hand-rolled branch-free binary search: ceil(log2(K+1)) rounds of
    take_along_axis gathers on (W, H) index arrays. This profiles far better
    on TPU than vmapped jnp.searchsorted.
    """
    w, k = m.shape
    h = t.shape[1]
    lo = jnp.zeros((w, h), jnp.int32)
    hi = jnp.full((w, h), k, jnp.int32)
    for _ in range(max(1, (k + 1).bit_length())):
        active = lo < hi
        mid = (lo + hi) >> 1
        vals = jnp.take_along_axis(m, jnp.minimum(mid, k - 1), axis=1)
        go_right = active & (vals < t)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return lo


def march_tanel(dem, params: RenderParams, *, width, nsteps, cells_per_deg,
                surface="bilinear"):
    """The (W, K) march: per-column sample distances, elevation tangents, and
    the running-max horizon profile.

    Returns (tanel (W,K), run_max (W,K), d (K,), az (W,)).
    """
    p = params
    az_rad1, az_center, az_ndc_per_rad = geometry.az_window_rad(p.az_rad0, p.az_rad1)
    x = jnp.arange(width, dtype=jnp.float32)
    az_ndc = (x + 0.5) / width * 2.0 - 1.0
    az = az_center + az_ndc / az_ndc_per_rad                      # (W,)

    k = jnp.arange(nsteps, dtype=jnp.float32)
    step = (p.zfar - p.znear) / nsteps
    d = p.znear + (k + 0.5) * step                                # (K,)

    # Meters per grid cell (vertex.glsl:128-130): east scale carries
    # cos(viewer_lat).
    cell_m_north = geometry.EARTH_RADIUS_M * DEG / cells_per_deg
    cell_m_east = cell_m_north * p.cos_viewer_lat

    sin_az = jnp.sin(az)[:, None]
    cos_az = jnp.cos(az)[:, None]
    dk = d[None, :]
    i_pos = p.viewer_cell_i + dk * sin_az / cell_m_east           # (W,K)
    j_pos = p.viewer_cell_j + dk * cos_az / cell_m_north

    n = dem.shape[0]
    in_grid = ((i_pos >= 0) & (i_pos <= n - 1) &
               (j_pos >= 0) & (j_pos <= n - 1))
    z = _sample_surface(dem, i_pos, j_pos, surface)
    tanel = jnp.where(in_grid, (z - p.viewer_z) / dk, -3.0e38)
    run_max = jax.lax.cummax(tanel, axis=1)
    return tanel, run_max, d, az


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "nsteps", "cells_per_deg",
                     "surface", "refine", "textured"))
def render_panorama(dem, params: RenderParams, *, width, height, nsteps,
                    cells_per_deg, surface="bilinear", refine=True,
                    textured=False, atlas=None, atlas_params=None):
    """Render one panorama.

    Args:
      dem: (N, N) float32 elevation grid, dem[j, i], row 0 = SOUTH edge.
      params: RenderParams (traced scalars -- camera moves don't recompile).
      width, height: output size (static).
      nsteps: ray-march sample count (static); <=1-cell spacing recommended.
      surface: 'bilinear' or 'triangulated' (reference mesh parity).
      refine: linearly interpolate the hit distance between the bracketing
        samples (analogous to the rasterizer interpolating across a triangle).
      textured / atlas / atlas_params: OSM texture mode
        (0.7*texture + 0.3*shading blend, fragment.glsl:21).

    Returns:
      image: (H, W, 3) uint8 **BGR** (the reference's byte order,
        horizonator.h:160-162), top row first. Sky pixels are blue
        (glClearColor(0,0,1), horizonator-lib.c:185).
      ranges: (H, W) float32 3D slant range in meters; invisible/sky = -1
        (horizonator.h:164, depth->range math horizonator-lib.c:978-1047).
    """
    p = params
    tanel, run_max, d, az = march_tanel(
        dem, p, width=width, nsteps=nsteps, cells_per_deg=cells_per_deg,
        surface=surface)

    # Pixel-row elevation angles: top row first, square angular pixels
    # (el_ndc spans [-1,1] over the height; el = el_ndc*(az span)/2/aspect,
    # horizonator-lib.c:1007-1012).
    az_rad1u, _, az_ndc_per_rad = geometry.az_window_rad(p.az_rad0, p.az_rad1)
    aspect = width / height
    y = jnp.arange(height, dtype=jnp.float32)
    el_ndc = 1.0 - (2.0 * y + 1.0) / height
    el = el_ndc / az_ndc_per_rad / aspect                         # (H,)
    t_y = jnp.tan(el)

    # First sample covering each pixel: lower-bound of t_y in the running max.
    tt = jnp.broadcast_to(t_y[None, :], (width, height))
    idx = _first_crossing(run_max, tt)                            # (W,H)
    sky = idx >= nsteps
    idxc = jnp.minimum(idx, nsteps - 1)

    step = (p.zfar - p.znear) / nsteps
    d_hit = p.znear + (idxc.astype(jnp.float32) + 0.5) * step
    if refine:
        m1 = jnp.take_along_axis(run_max, idxc, axis=1)
        m0 = jnp.take_along_axis(run_max, jnp.maximum(idxc - 1, 0), axis=1)
        denom = m1 - m0
        alpha = jnp.where(denom > 0, (tt - m0) / jnp.where(denom > 0, denom, 1.0), 1.0)
        alpha = jnp.clip(alpha, 0.0, 1.0)
        d_prev = d_hit - step
        d_ref = d_prev + alpha * step
        # Only refine interior hits; the first sample has no bracket.
        d_hit = jnp.where(idxc > 0, d_ref, d_hit)
    d_hit = jnp.clip(d_hit, p.znear, p.zfar)

    # Slant range: the pixel's ray at elevation el_y meets the surface at
    # horizontal distance d_hit -> range = d/cos(el) = hypot(d, d*tan el)
    # (horizonator-lib.c:1013-1025).
    ranges_wh = d_hit / jnp.cos(el)[None, :]
    ranges_wh = jnp.where(sky, -1.0, ranges_wh)

    # Distance-red shading ramp (vertex.glsl:159-162): red =
    # clamp((distance_ne - znear_color)/(zfar_color - znear_color), 0, 1).
    red = jnp.clip((d_hit - p.znear_color) / (p.zfar_color - p.znear_color),
                   0.0, 1.0)

    if not textured:
        r8 = jnp.round(red * 255.0).astype(jnp.uint8)
        zeros = jnp.zeros_like(r8)
        sky_u8 = sky.astype(jnp.uint8)
        # BGR byte order; sky = blue (255,0,0) in BGR.
        b = sky_u8 * 255
        g = zeros
        r = jnp.where(sky, 0, r8).astype(jnp.uint8)
        image_wh3 = jnp.stack([b, g, r], axis=-1)                 # (W,H,3)
    else:
        from . import texture as _texture
        # Surface grid coords of each hit -> texture sample.
        cell_m_north = geometry.EARTH_RADIUS_M * DEG / cells_per_deg
        cell_m_east = cell_m_north * p.cos_viewer_lat
        sin_az = jnp.sin(az)[:, None]
        cos_az = jnp.cos(az)[:, None]
        i_hit = p.viewer_cell_i + d_hit * sin_az / cell_m_east
        j_hit = p.viewer_cell_j + d_hit * cos_az / cell_m_north
        tex_bgr = _texture.sample_atlas_bgr(atlas, atlas_params, i_hit, j_hit,
                                            cells_per_deg)
        shade = jnp.stack([jnp.zeros_like(red), jnp.zeros_like(red), red],
                          axis=-1)
        # fragment.glsl:21: 0.7*texture + 0.3*shading.
        mixed = 0.7 * tex_bgr + 0.3 * shade * 255.0
        img = jnp.round(jnp.clip(mixed, 0.0, 255.0)).astype(jnp.uint8)
        sky_bgr = jnp.array([255, 0, 0], jnp.uint8)
        image_wh3 = jnp.where(sky[..., None], sky_bgr, img)

    image = jnp.swapaxes(image_wh3, 0, 1)                          # (H,W,3)
    ranges = jnp.swapaxes(ranges_wh, 0, 1)                         # (H,W)
    return image, ranges


@functools.partial(jax.jit, static_argnames=("width", "nsteps", "cells_per_deg",
                                             "surface"))
def horizon_profile(dem, params: RenderParams, *, width, nsteps, cells_per_deg,
                    surface="bilinear"):
    """Per-column horizon: (az (W,), tan_el (W,)) -- the skyline. This is the
    parity metric against the GL reference (BASELINE.md) and the core of the
    viewshed ops."""
    _, run_max, _, az = march_tanel(
        dem, params, width=width, nsteps=nsteps, cells_per_deg=cells_per_deg,
        surface=surface)
    return az, run_max[:, -1]
