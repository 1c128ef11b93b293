"""OSM texture atlas sampling for ``--texture`` renders.

The reference packs slippy-map tiles into one GL texture and samples it in the
fragment shader with coordinates computed per-vertex using a 2nd-order Taylor
expansion of the mercator latitude equation (vertex.glsl:51-61,
horizonator-lib.c:707-759). On TPU the exact ``log(tan...)`` is as cheap as
the polynomial, so we use the exact spherical-mercator equations
(https://wiki.openstreetmap.org/wiki/Slippy_map_tilenames) per PIXEL -- strictly
more accurate than the reference.

Atlas layout: (NtilesY*256, NtilesX*256, 3) BGR, row 0 = the NORTH edge (tile
row ``osmtile_lowest_y``; slippy y grows southward).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

OSM_RENDER_ZOOM = 12     # horizonator-lib.c:25
OSM_TILE_PX = 256        # horizonator-lib.c:26-27
DEG = math.pi / 180.0


class AtlasParams(NamedTuple):
    """Static geometry of the packed tile atlas."""
    origin_cell_lon_deg: float   # lon of DEM grid cell i=0
    origin_cell_lat_deg: float   # lat of DEM grid cell j=0
    osmtile_lowest_x: int
    osmtile_lowest_y: int
    ntiles_x: int
    ntiles_y: int
    zoom: int = OSM_RENDER_ZOOM


def tile_xy_from_latlon(lat_deg: float, lon_deg: float, zoom: int) -> tuple[int, int]:
    """Integer slippy-tile indices containing a lat/lon
    (horizonator-lib.c:225-245)."""
    n = float(1 << zoom)
    lon = lon_deg * DEG
    lat = lat_deg * DEG
    x = int(min(n, max(0.0, lon * n / (2 * math.pi) + n / 2)))
    y = int(n / 2 * (1.0 - math.log((math.sin(lat) + 1.0) / math.cos(lat))
                     / math.pi))
    return x, y


def atlas_px_from_grid(i_pos, j_pos, ap: AtlasParams, cells_per_deg: int):
    """DEM grid coords -> fractional pixel coords into the atlas (exact
    mercator; the reference approximates this, vertex.glsl:51-61)."""
    n = float(1 << ap.zoom)
    lon = (ap.origin_cell_lon_deg + i_pos / cells_per_deg) * DEG
    lat = (ap.origin_cell_lat_deg + j_pos / cells_per_deg) * DEG
    xtile = lon * n / (2.0 * math.pi) + n / 2.0
    ytile = n / 2.0 * (1.0 - jnp.log((jnp.sin(lat) + 1.0) / jnp.cos(lat))
                       / math.pi)
    px = (xtile - ap.osmtile_lowest_x) * OSM_TILE_PX
    py = (ytile - ap.osmtile_lowest_y) * OSM_TILE_PX
    return px, py


def sample_atlas_bgr(atlas, ap: AtlasParams, i_pos, j_pos, cells_per_deg: int):
    """Bilinear atlas sample at DEM grid coords. atlas: (Hat, Wat, 3) uint8
    BGR, row 0 = north. Returns float32 BGR in [0, 255]."""
    px, py = atlas_px_from_grid(i_pos, j_pos, ap, cells_per_deg)
    h, w = atlas.shape[0], atlas.shape[1]
    x0 = jnp.clip(jnp.floor(px - 0.5), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(py - 0.5), 0, h - 2).astype(jnp.int32)
    fx = jnp.clip(px - 0.5 - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(py - 0.5 - y0, 0.0, 1.0)[..., None]
    flat = atlas.reshape(-1, 3).astype(jnp.float32)
    base = y0 * w + x0
    c00 = jnp.take(flat, base, axis=0)
    c10 = jnp.take(flat, base + 1, axis=0)
    c01 = jnp.take(flat, base + w, axis=0)
    c11 = jnp.take(flat, base + w + 1, axis=0)
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy
