"""Mid-field texture fidelity by distance band (VERDICT r4 missing #2).

The reference samples z12 tiles (~31.6 m/texel at lat 34) at EVERY distance
(fragment.glsl:21, horizonator-lib.c:25-27). The TPU build's textured
default is hybrid: atlas-true z12 texels to ``exact_near_m`` via the
viewer-patch contraction, half-cell grid2x planes (~46 m at SRTM3) beyond.
At the 4096-wide headline a 31.6 m texel subtends >= 1 px out to ~20.6 km,
so the band between exact_near_m and ~20 km renders from the resampled
planes rather than the atlas. This measures what that actually costs in
fidelity: PSNR / mean abs err vs the EXACT per-pixel-gather oracle, split
by range band (0-1.2 / 1.2-2.5 / 2.5-5 / 5-20 / >20 km), for grid2x and
hybrid at each static-cap-feasible exact_near_m (1200 / 2500 / 3500 m --
window.exact_near_sizes caps the patch at 3500 m for z12/SRTM3/lat34), on
two atlas types:

  - 'blocks': 4-texel z12 checker (~126 m features) -- the detail class a
    z12 map tile actually carries (roads, field edges);
  - 'noise': independent random texels -- the adversarial resampling worst
    case (no real map looks like this; it bounds the error from above).

TWO oracle comparisons per variant, because the total error has two
independent terms:

  refine=True  (the production default): the oracle samples the atlas at
    the REFINED per-pixel hit position while the in-kernel paths color at
    the march's CROSSING position (quantized ~1 cell along-ray) -- so this
    row measures position-quantization + texel-resolution together. On
    this scene (synth_dem carries 30 m/cell white noise, adversarially
    rough) the position term dominates every band.
  refine=False: the oracle's d_hit IS the crossing distance, so oracle
    and in-kernel paths sample the SAME surface positions and the
    difference is PURE texel resolution -- the number VERDICT r4 missing
    #2 asks to bound by band. The hybrid rows must read ~0 inside their
    exact_near_m (proof the exact-near path engages and is atlas-true).

Also times each variant at the config-6 frame setup so the fidelity/cost
trade is on one page. Run on the real TPU:
    python benchmarks/profile_texture_bands.py
"""

import functools
import math
import sys

import numpy as np

sys.path.insert(0, ".")
from benchmarks.suite import synth_dem, make_params, timed_chain, log


def make_atlas(kind, ap, rng):
    h, w = ap.ntiles_y * 256, ap.ntiles_x * 256
    if kind == "noise":
        a = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    else:                                  # 'blocks': 4-px z12 checker
        gy = (np.arange(h)[:, None] + ap.osmtile_lowest_y * 256) // 4
        gx = (np.arange(w)[None, :] + ap.osmtile_lowest_x * 256) // 4
        chk = ((gx + gy) % 2).astype(np.uint8) * 180 + 40
        a = np.stack([chk, 255 - chk, np.full_like(chk, 120)], -1)
    return a


def main():
    import jax
    import jax.numpy as jnp
    from horizonator_tpu.compile_cache import harden_cache
    harden_cache("/tmp/jax_bench_cache2")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from horizonator_tpu.render.raymarch import render_panorama
    from horizonator_tpu.render.crossing import k_cross_for
    from horizonator_tpu.render.texture import (
        AtlasParams, pack_atlas, tile_xy_from_latlon, atlas_to_grid_colors,
        prepare_color_planes)
    from horizonator_tpu.render.window import prepare_aligned_scene

    n = 3400
    cpd = 1200
    lat0, lon0 = 34.0 - n / (2 * cpd) + 0.0, -118.0   # grid j=0 south edge
    dem = jax.device_put(synth_dem(n))
    p = make_params(n)                                # full circle, 40 km
    k = k_cross_for(40000.0, cpd, 34.3, n=n)
    span = n / cpd
    x_lo, y_lo = tile_xy_from_latlon(lat0 + span, lon0, 12)
    x_hi, y_hi = tile_xy_from_latlon(lat0, lon0 + span, 12)
    ap = AtlasParams(origin_cell_lon_deg=lon0, origin_cell_lat_deg=lat0,
                     osmtile_lowest_x=x_lo - 1, osmtile_lowest_y=y_lo - 1,
                     ntiles_x=x_hi - x_lo + 3, ntiles_y=y_hi - y_lo + 3)
    log(f"atlas {ap.ntiles_x}x{ap.ntiles_y} z12 tiles")
    rng = np.random.default_rng(3)

    W, H = 4096, 1024
    base = functools.partial(render_panorama, width=W, height=H,
                             nsteps=k, cells_per_deg=cpd, sampler="window",
                             lat_hint_deg=34.3, textured=True)
    bands = [(0.0, 1.2e3), (1.2e3, 2.5e3), (2.5e3, 5e3), (5e3, 20e3),
             (20e3, 40e3)]

    for kind in ("blocks", "noise"):
        atlas = jax.device_put(pack_atlas(jnp.asarray(
            make_atlas(kind, ap, rng))))
        colors = prepare_color_planes(
            atlas_to_grid_colors(atlas, ap, n, cpd, scale=2))
        colors = jax.tree.map(jax.device_put, colors)
        scene = prepare_aligned_scene(dem, k, color_planes=colors)

        for refine in (True, False):
            rbase = functools.partial(base, refine=refine)
            img_ex, rng_ex = rbase(dem, p, atlas=atlas, atlas_params=ap)
            img_ex = np.asarray(img_ex).astype(np.int32)
            ranges = np.asarray(rng_ex)
            vis = ranges > 0

            variants = [("grid2x", None)] + [
                (f"hybrid@{int(e)}m", e) for e in (1200.0, 2500.0, 3500.0)]
            for name, e in variants:
                img, rr = rbase(dem, p, color_planes=colors,
                                aligned_scene=scene,
                                atlas=atlas if e else None,
                                atlas_params=ap if e else None,
                                exact_near_m=e)
                assert np.array_equal(np.asarray(rr), ranges)
                d = np.abs(np.asarray(img).astype(np.int32) - img_ex)
                cols = []
                for lo, hi in bands:
                    m = vis & (ranges >= lo) & (ranges < hi)
                    if m.sum() < 100:
                        cols.append("       --")
                        continue
                    mse = float((d[m].astype(np.float64) ** 2).mean())
                    psnr = 10 * math.log10(255.0 ** 2 / max(mse, 1e-9))
                    cols.append(f"{psnr:5.1f}dB/{d[m].mean():5.2f}")
                if refine:
                    fn = lambda dem, colors, scene, atlas_, pp, e=e: base(
                        dem, pp, color_planes=colors, aligned_scene=scene,
                        atlas=atlas_ if e else None,
                        atlas_params=ap if e else None, exact_near_m=e)
                    t = timed_chain(fn, dem, colors, scene, atlas, p,
                                    iters=10)
                    tcol = f"{t*1e3:6.2f} ms"
                else:
                    tcol = "   --   "
                rtag = "pos+tex" if refine else "tex-only"
                print(f"{kind:6s} {rtag:8s} {name:13s} {tcol} | "
                      + " | ".join(cols), flush=True)
        print(f"{kind:6s} bands: " + " | ".join(
            f"{lo/1e3:g}-{hi/1e3:g}km" for lo, hi in bands), flush=True)


if __name__ == "__main__":
    main()
