"""Per-stage split of the textured-LOD frame (VERDICT r4 weak #3).

Config 9 (SRTM1/300 km, 2048x512, color mip chain) measured 4.29 ms/vp
textured vs 1.912 untextured = 2.24x, against the headline's pinned ~1.8x
structural textured ratio -- ~0.6-0.8 ms unaccounted. This times each piece
on the real chip so the gap is attributable:

  - march_lod alone, textured vs untextured (per-LEVEL too: one
    march_window per LevelSpec, each with its own packed color window);
  - the fused resolve on the LOD march's output rows, textured (kv) vs
    untextured -- same per-stage ceiling treatment profile_roll_ceiling
    gave the headline resolve;
  - full render_panorama both ways (the config-9 per-frame numbers).

Run on the real TPU:  python benchmarks/profile_lod_parts.py
"""

import functools
import math
import sys

import numpy as np

sys.path.insert(0, ".")
from benchmarks.suite import synth_dem, make_params, timed_chain, log


def main():
    import jax
    import jax.numpy as jnp
    from horizonator_tpu.compile_cache import harden_cache
    harden_cache("/tmp/jax_bench_cache2")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from horizonator_tpu.render.lod import (build_pyramid,
                                            build_color_pyramid, lod_plan,
                                            march_lod)
    from horizonator_tpu.render.raymarch import render_panorama
    from horizonator_tpu.render.window import march_window
    from horizonator_tpu.render.lod import _scaled_params
    from horizonator_tpu.render.crossing import N_NEAR

    log(f"device: {jax.devices()[0]}")
    n = 3601
    W, H = 2048, 512
    dem = synth_dem(n)
    plan = lod_plan(300000.0, W, 3600, 34.0, n)
    nlev = 1 + max(sp.level for sp in plan)
    log(f"plan: {[(s.level, int(s.d_lo), int(s.d_hi), s.k_lo, s.k_len) for s in plan]}")
    pyr = tuple(jax.device_put(x) for x in build_pyramid(dem, nlev))
    rng = np.random.default_rng(3)
    colors = jnp.asarray(rng.integers(0, 255, (3, n, n)).astype(np.float32))
    cpyr = tuple(jax.device_put(x) for x in build_color_pyramid(colors,
                                                                nlev, n))
    p = make_params(n, zfar=300000.0, vz=1200.0, lat=34.0)

    # full frame
    base = functools.partial(render_panorama, width=W, height=H, nsteps=1,
                             cells_per_deg=3600, sampler="lod",
                             lat_hint_deg=34.0, lod_plan=plan)
    t_u = timed_chain(lambda pyr, pp: base(pyr, pp), pyr, p, iters=8)
    t_t = timed_chain(lambda pyr, cp, pp: base(pyr, pp, textured=True,
                                               color_planes=cp),
                      pyr, cpyr, p, iters=8)
    log(f"frame: untextured {t_u*1e3:.3f} ms, textured {t_t*1e3:.3f} ms "
        f"(ratio {t_t/t_u:.2f})")

    # march alone (sum of per-level kernels + concat)
    def m_u(pyr, pp):
        tanel, run_max, d, az = march_lod(
            pyr, pp, width=W, plan=plan, cells_per_deg=3600,
            lat_hint_deg=34.0)
        return tanel

    def m_t(pyr, cp, pp):
        tanel, run_max, d, az, tex = march_lod(
            pyr, pp, width=W, plan=plan, cells_per_deg=3600,
            lat_hint_deg=34.0, color_pyramid=cp)
        return tanel + tex.astype(jnp.float32)
    tm_u = timed_chain(m_u, pyr, p, iters=8)
    tm_t = timed_chain(m_t, pyr, cpyr, p, iters=8)
    log(f"march_lod: untextured {tm_u*1e3:.3f} ms, textured "
        f"{tm_t*1e3:.3f} ms (ratio {tm_t/tm_u:.2f})")
    log(f"resolve+assembly (frame - march): untextured "
        f"{(t_u-tm_u)*1e3:.3f} ms, textured {(t_t-tm_t)*1e3:.3f} ms")

    # per-level marches
    for si, spec in enumerate(plan):
        dem_l = pyr[spec.level]
        cpd_l = 3600 / (2 ** spec.level)
        is_first = si == 0

        def prep(pp, spec=spec):
            p_l = _scaled_params(pp, spec.level)
            return p_l._replace(
                znear=jnp.maximum(pp.znear, jnp.float32(spec.d_lo)),
                zfar=jnp.minimum(pp.zfar, jnp.float32(spec.d_hi)))

        def lvl_u(dem_l, pp, spec=spec, is_first=is_first):
            outs = march_window(
                dem_l, prep(pp), width=W, k_cross=spec.k_lo + spec.k_len,
                cells_per_deg=cpd_l, lat_hint_deg=34.0,
                n_near=N_NEAR if is_first else 0,
                znear_hint_m=100.0 if is_first else None)
            return outs[0]

        def lvl_t(dem_l, cp_l, pp, spec=spec, is_first=is_first):
            outs = march_window(
                dem_l, prep(pp), width=W, k_cross=spec.k_lo + spec.k_len,
                cells_per_deg=cpd_l, lat_hint_deg=34.0,
                n_near=N_NEAR if is_first else 0,
                znear_hint_m=100.0 if is_first else None,
                color_planes=cp_l)
            return outs[0] + outs[4].astype(jnp.float32)
        tl_u = timed_chain(lvl_u, dem_l, p, iters=6)
        tl_t = timed_chain(lvl_t, dem_l, cpyr[spec.level], p, iters=6)
        log(f"  level {spec.level} (k {spec.k_lo}..{spec.k_lo+spec.k_len}):"
            f" untextured {tl_u*1e3:.3f} ms, textured {tl_t*1e3:.3f} ms"
            f" (+{(tl_t-tl_u)*1e3:.3f})")


if __name__ == "__main__":
    main()
