"""DEM-region sharding: mosaics larger than one chip's HBM.

SURVEY.md section 5.8(c): shard the elevation grid itself across devices in
row bands, exchanging a ONE-ROW halo -- the same overlap convention the
reference's tile mosaic uses between adjacent .hgt files (dem.c:161-171,
285-291) -- and combine per-band horizon contributions with a max
all-reduce.

Why this is exact: the horizon along a ray is max over samples of the
elevation angle, and the crossing march's samples partition cleanly by the
DEM row band that contains them. A band's local march (crossing.py geometry
is translation-invariant: shift viewer_cell_j by the band origin) evaluates
exactly the samples whose interpolation stencil lies inside band+halo:

- row-crossing samples on the halo row use the horizontal pair within that
  row (correct from the halo);
- column-crossing samples between the last band row and the halo row use
  the vertical pair (last row, halo row) -- the reason the halo exists;
- samples on the shared boundary are computed by BOTH neighbors with
  identical values; max() is idempotent, so no seam handling is needed.

Collectives: one ppermute (each device sends its first row to its
predecessor; the last band's halo slot is shape-filler only, masked invalid
via march_crossing's j_hi so the north edge matches the unsharded march
exactly) + one pmax. Each device
holds 1/R of the grid (+1 row): memory scales with the region axis; compute
per device is the full (W, K) march (compose with the "az" axis of
sharding.make_sharded_horizon to scale compute too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map          # jax >= 0.8
except ImportError:                    # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..render.crossing import pack_scene, march_crossing


def make_region_sharded_horizon(mesh: Mesh, *, width, k_cross, cells_per_deg,
                                axis="region", az_axis=None):
    """Build fn(dem (n, n) f32 [n % R == 0], params) -> (az (W,), tan_el
    (W,)) with the DEM row-sharded over mesh axis ``axis`` and the horizon
    combined exactly across bands.

    With ``az_axis`` set (a second mesh axis), image columns additionally
    shard into azimuth wedges: memory scales with the region axis AND
    compute with the az axis -- the full 2D scaling mesh. Wedge outputs
    concatenate (disjoint columns); band contributions pmax within each
    wedge group.
    """
    r = mesh.shape[axis]
    n_az = mesh.shape[az_axis] if az_axis else 1
    if width % n_az:
        raise ValueError(f"width {width} not divisible by az axis {n_az}")
    w_local = width // n_az

    def local_fn(dem_band, params):
        # dem_band: (nb, n) -- this device's rows [idx*nb, (idx+1)*nb)
        nb = dem_band.shape[0]
        idx = jax.lax.axis_index(axis)

        # halo: receive the NEXT band's first row. The last band has no real
        # row beyond the grid's north edge; it still appends a (zero) row so
        # every device runs the same shapes, but marks it INVALID via j_hi
        # below -- matching the unsharded march, which masks everything
        # beyond row n-1 (rather than interpolating toward fabricated data).
        first_row = dem_band[0:1, :]
        perm = [(i, (i - 1) % r) for i in range(r)]
        halo = jax.lax.ppermute(first_row, axis, perm)
        halo = jnp.where(idx == r - 1, jnp.zeros_like(halo), halo)
        local = jnp.concatenate([dem_band, halo], axis=0)      # (nb+1, n)
        j_hi = jnp.where(idx == r - 1, jnp.float32(nb - 1), jnp.float32(nb))

        # Rectangular local grid (nb+1 rows x n cols): march_crossing
        # supports it directly; samples outside the band are masked by the
        # local row bound and computed by the owning neighbor instead.
        p_local = params._replace(
            viewer_cell_j=params.viewer_cell_j
            - (idx * nb).astype(jnp.float32))
        if az_axis:
            from .sharding import _wedge_params
            p_local = _wedge_params(p_local, jax.lax.axis_index(az_axis),
                                    n_az)
        scene = pack_scene(local)
        tanel, _, _, az = march_crossing(
            scene, p_local, width=w_local, k_cross=k_cross,
            cells_per_deg=cells_per_deg, j_hi=j_hi)
        h = jnp.max(tanel, axis=1)
        return az, jax.lax.pmax(h, axis)

    out_col = P(az_axis) if az_axis else P()
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(out_col, out_col))
    return jax.jit(sharded)
