"""Shared projection math: lat/lon/ele <-> equirect pixel coordinates.

One jittable implementation used by the renderer, the annotator, and picking.
The reference carries this math twice -- on the GPU (vertex.glsl:112-156) and
on the CPU (horizonator-lib.c:1055-1213, with the author's note "mostly lifted
from vertex.glsl. Would be nice to consolidate") -- this module is that
consolidation.

Conventions (identical to the reference):

- azimuth 0 = North, 90 deg = East; az = atan2(east, north);
- tangent-plane flat-earth model: east  = dlon_rad * Rearth * cos(viewer_lat),
  north = dlat_rad * Rearth (vertex.glsl:128-130, error analysis at
  vertex.glsl:65-88: ~7.8 m at 10 km);
- the azimuth window [az0, az1] maps to the full viewport width; az1 is
  unwrapped to lie in (az0, az0 + 2*pi];
- el_ndc = atan2(h, distance_ne) * aspect * az_ndc_per_rad, i.e. square
  angular pixels (vertex.glsl:153);
- pixel centers: x = (az_ndc+1)/2*W - 0.5 with x in (-0.5, W-0.5)
  (horizonator-lib.c:1092-1094); y counts DOWN from the top row.

Functions are pure jax.numpy, usable under jit/vmap and on numpy scalars.
"""

from __future__ import annotations

import jax.numpy as jnp

EARTH_RADIUS_M = 6371000.0   # vertex.glsl:30
DEG = jnp.pi / 180.0


def unwrap_near_rad(x, near):
    """Unwrap angle x to lie within pi of ``near`` (vertex.glsl:34-38)."""
    d = (x - near) / (2.0 * jnp.pi)
    return (d - jnp.round(d)) * 2.0 * jnp.pi + near


def az_window_rad(az_rad0, az_rad1):
    """Normalize the azimuth window: az1 unwrapped to (az0, az0+2pi], plus the
    center and the ndc scale (horizonator-lib.c:1075-1083)."""
    az_rad1 = unwrap_near_rad(az_rad1 - az_rad0, jnp.pi) + az_rad0
    # az1 == az0 means a FULL circle, not an empty window: C roundf rounds
    # half away from zero so the reference's unwrap lands on az0 + 2pi,
    # while jnp.round's half-to-even lands on az0 (-> division by zero
    # below). Patch only the degenerate case so every other window stays
    # bitwise identical.
    az_rad1 = jnp.where(az_rad1 <= az_rad0, az_rad0 + 2.0 * jnp.pi, az_rad1)
    az_center = (az_rad0 + az_rad1) / 2.0
    az_ndc_per_rad = 2.0 / (az_rad1 - az_rad0)
    return az_rad1, az_center, az_ndc_per_rad


def x_from_az(az_rad, az_rad0, az_rad1, width):
    """Map azimuth -> pixel x. Returns (x, az_ndc, az_ndc_per_rad); the caller
    checks |az_ndc| <= 1 for visibility (horizonator-lib.c:1062-1095)."""
    _, az_center, az_ndc_per_rad = az_window_rad(az_rad0, az_rad1)
    az = unwrap_near_rad(az_rad, az_center)
    az_ndc = (az - az_center) * az_ndc_per_rad
    x = (az_ndc + 1.0) / 2.0 * width - 0.5
    return x, az_ndc, az_ndc_per_rad


def latlon_to_en(lat, lon, lat_viewer, cos_lat_viewer, lon_viewer):
    """Tangent-plane east/north meters from the viewer (vertex.glsl:128-130)."""
    east = (lon - lon_viewer) * DEG * EARTH_RADIUS_M * cos_lat_viewer
    north = (lat - lat_viewer) * DEG * EARTH_RADIUS_M
    return east, north


def en_to_latlon(east, north, lat_viewer, cos_lat_viewer, lon_viewer):
    """Inverse of latlon_to_en (horizonator-lib.c:1209-1210)."""
    lon = lon_viewer + east / EARTH_RADIUS_M / DEG / cos_lat_viewer
    lat = lat_viewer + north / EARTH_RADIUS_M / DEG
    return lat, lon


EARTH_CURV_SPHERICAL = None   # filled below (needs EARTH_RADIUS_M)
REFRACTION_K_STD = 0.13       # standard terrestrial refraction coefficient


def curvature_coeff(mode):
    """Apparent-elevation drop rate 1/(2 R_effective) in 1/m for
    RenderParams.curv / project(curv=...).

    'none' (or None/0): the reference's flat tangent plane -- exact parity.
    'spherical': geometric earth curvature, 1/(2R).
    'refracted': curvature minus standard atmospheric refraction,
        (1 - k)/(2R) with k = 0.13 -- what terrestrial panoramas actually
        show. A float passes through as an explicit coefficient.
    """
    if mode in (None, "none", 0, 0.0, False):
        return 0.0
    if mode == "spherical":
        return 1.0 / (2.0 * EARTH_RADIUS_M)
    if mode == "refracted":
        return (1.0 - REFRACTION_K_STD) / (2.0 * EARTH_RADIUS_M)
    if isinstance(mode, str):
        raise ValueError(
            f"unknown curvature mode {mode!r}: expected 'none', 'spherical', "
            "'refracted', or a numeric coefficient in 1/m")
    return float(mode)


def project(lat_viewer, cos_lat_viewer, lon_viewer, ele_viewer,
            lat, lon, ele, az_rad0, az_rad1, width, height, curv=0.0):
    """Project a world point into the panorama.

    Returns (x, y, range_enh, visible) where ``visible`` is a bool mask for
    |az_ndc|<=1 and |el_ndc|<=1 (the reference returns false instead,
    horizonator-lib.c:1097-1155). range_enh is the 3D slant range in meters.
    Fully vectorized: lat/lon/ele may be arrays. ``curv`` must match the
    render's RenderParams.curv for annotations/picks to line up.
    """
    east, north = latlon_to_en(lat, lon, lat_viewer, cos_lat_viewer, lon_viewer)
    dist_sq_ne = east * east + north * north
    x, az_ndc, az_ndc_per_rad = x_from_az(
        jnp.arctan2(east, north), az_rad0, az_rad1, width)
    h = ele - ele_viewer
    distance_ne = jnp.sqrt(dist_sq_ne)
    range_enh = jnp.sqrt(dist_sq_ne + h * h)
    aspect = width / height
    # apparent elevation: tan el = h/d - d*curv (atan2 form keeps d=0 safe)
    el_ndc = (jnp.arctan2(h - dist_sq_ne * curv, distance_ne)
              * aspect * az_ndc_per_rad)
    y = (-el_ndc + 1.0) / 2.0 * height - 0.5
    visible = (jnp.abs(az_ndc) <= 1.0) & (jnp.abs(el_ndc) <= 1.0)
    return x, y, range_enh, visible


def pixel_az_el_rad(x, y, az_deg0, az_deg1, width, height):
    """Azimuth/elevation at the CENTER of pixel (x, y), y counted from the top
    row (horizonator-lib.c:1181-1201). Degrees in, radians out.

    The renderer unwraps az1 to (az0, az0+360]; the reference's unproject
    does not (its tools keep center+-radius windows that never wrap, so it
    never sees one). Our API accepts wrapped windows (render(350, 10)) and
    over-wound ones (render(0, 540) renders a 180-deg window), so
    normalize the span into (0, 360] here too -- pick()/annotate links
    would otherwise map pixels to the wrong azimuth. Windows already in
    (0, 360] keep az1 bitwise."""
    span0 = az_deg1 - az_deg0
    turns = jnp.where(span0 <= 0.0, jnp.floor(-span0 / 360.0) + 1.0,
                      -jnp.ceil(span0 / 360.0) + 1.0)
    az_deg1 = az_deg1 + 360.0 * turns
    az_ndc = (x + 0.5) / width * 2.0 - 1.0
    az = (az_ndc * (az_deg1 - az_deg0) / 2.0 + (az_deg1 + az_deg0) / 2.0) * DEG
    el_ndc = 1.0 - (y + 0.5) / height * 2.0   # top row -> +1 side
    aspect = width / height
    el = el_ndc * (az_deg1 - az_deg0) / 2.0 / aspect * DEG
    return az, el


def unproject(x, y, range_enh, range_en,
              lat_viewer, cos_lat_viewer, lon_viewer,
              az_deg0, az_deg1, width, height):
    """Pixel + range -> lat/lon (horizonator-lib.c:1157-1213).

    Exactly one of range_enh (3D slant) / range_en (horizontal) should be > 0;
    with both arrays given, range_en wins where positive, matching the
    branchless vectorized form of the reference's either/or contract.
    """
    az, el = pixel_az_el_rad(x, y, az_deg0, az_deg1, width, height)
    range_en = jnp.where(range_en > 0, range_en, jnp.cos(el) * range_enh)
    east = range_en * jnp.sin(az)
    north = range_en * jnp.cos(az)
    return en_to_latlon(east, north, lat_viewer, cos_lat_viewer, lon_viewer)


def sun_position(lat_deg: float, lon_deg: float, when) -> tuple[float, float]:
    """Solar (azimuth_deg cw from north, altitude_deg) at a UTC time.

    Host-side astronomy for hillshade's sun (api/CLI ``sun_time=``): the
    low-precision NOAA/Meeus formulas (mean longitude + equation-of-center
    ecliptic position, mean obliquity, GMST hour angle), accurate to a few
    hundredths of a degree over +-2 centuries of J2000 -- far below
    hillshade's visual sensitivity. ``when``: a datetime (naive = UTC,
    aware = converted) or an ISO-8601 string.
    """
    import math as m
    from datetime import datetime, timezone

    if isinstance(when, str):
        when = datetime.fromisoformat(when)
    if when.tzinfo is not None:
        when = when.astimezone(timezone.utc).replace(tzinfo=None)
    epoch = datetime(2000, 1, 1, 12, 0, 0)              # J2000.0 (TT~UTC)
    n = (when - epoch).total_seconds() / 86400.0

    L = m.radians((280.460 + 0.9856474 * n) % 360.0)    # mean longitude
    g = m.radians((357.528 + 0.9856003 * n) % 360.0)    # mean anomaly
    lam = L + m.radians(1.915) * m.sin(g) + m.radians(0.020) * m.sin(2 * g)
    eps = m.radians(23.439 - 4.0e-7 * n)                # obliquity
    ra = m.atan2(m.cos(eps) * m.sin(lam), m.cos(lam))   # right ascension
    dec = m.asin(m.sin(eps) * m.sin(lam))               # declination

    ut_h = when.hour + when.minute / 60.0 + when.second / 3600.0
    gmst_h = (6.697375 + 0.0657098242 * (n - ut_h / 24.0)
              + 1.00273790935 * ut_h) % 24.0
    lst = m.radians((gmst_h * 15.0 + lon_deg) % 360.0)  # local sidereal
    H = lst - ra                                        # hour angle

    lat = m.radians(lat_deg)
    alt = m.asin(m.sin(dec) * m.sin(lat)
                 + m.cos(dec) * m.cos(lat) * m.cos(H))
    az = m.atan2(-m.sin(H),
                 m.tan(dec) * m.cos(lat) - m.sin(lat) * m.cos(H))
    return (m.degrees(az) % 360.0, m.degrees(alt))
