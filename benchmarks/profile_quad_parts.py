"""Stage split of the QUADRANT viewshed contraction (VERDICT r4 next #6).

The round-4 quadrant split brought the viewer-centered 800^2 full-circle
raster (config 7) to 0.44-0.52 ms. The remaining VERDICT ask is a Pallas
per-j-block pass 2 (contract over ~32 polar columns instead of ~2*(W/8+8)
per cell) with a <= 0.3 ms target -- or a measured rejection. Before
building that, attribute the 0.44 ms to stages, as cumulative pipelines
(each adds one stage of _grid_quad's work; differences = stage costs):

  march        _raw_polar alone (window kernel, W x K polar field)
  +geom        + per-cell geometry: az/xc/dist/mask + 4-slice bilinear
               cell elevation + t_cell (mirror of _grid_contract:421-488)
  +tb          + the two region-B quarter-arc tables (hw x 2SQ, masked
               max over K)
  +ta          + the region-A tables (per row chunk inside half_rows)
  full         viewshed_grid(method='contract', full_circle=True) --
               full minus (+ta) ~= pass 2, the one-hot column contraction

Stages mirror ops/viewshed._grid_quad (same shapes, same arc slicing);
they are a measurement mirror, not the implementation.

Run on the TPU:  python benchmarks/profile_quad_parts.py
"""

import functools
import math
import sys
import time

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    from horizonator_tpu.compile_cache import harden_cache
    harden_cache("/tmp/jax_bench_cache2")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from horizonator_tpu import geometry
    from horizonator_tpu.ops import viewshed_grid
    from horizonator_tpu.ops.viewshed import _raw_polar, _window, _unwrap
    from horizonator_tpu.render.crossing import k_cross_for
    from horizonator_tpu.profiling import device_time_chain, measure_rtt
    sys.path.insert(0, "benchmarks")
    from suite import synth_dem, make_params

    log(f"device: {jax.devices()[0]}")
    n = 1200
    dem = jax.device_put(synth_dem(n))
    p0 = make_params(n, znear=50.0, zfar=20000.0)
    nsteps = k_cross_for(20000.0, 1200, 34.3, n=n)
    hw, W = 400, 720
    rc = min(hw, 200)                        # _grid_contract's default
    DEG = math.pi / 180.0
    NEG = jnp.float32(-3.0e38)
    P2 = 2 * hw
    qa = math.pi / 4.0
    SQ = min(W, W // 8 + 8)
    kw = dict(width=W, nsteps=nsteps, cells_per_deg=1200,
              sampler="window", lat_hint_deg=34.3, znear_hint_m=50.0,
              aligned_scene=None)
    log(f"W={W} K={nsteps} hw={hw} SQ={SQ} rc={rc}")

    def perturb(a, i):
        return tuple(x._replace(viewer_cell_i=x.viewer_cell_i + i)
                     if hasattr(x, "viewer_cell_i") else x for x in a)

    rtt = measure_rtt()
    log(f"rtt {rtt * 1e3:.1f} ms")
    res = {}

    def t(name, fn, *args, reps=64):
        t0 = time.time()
        sec = device_time_chain(fn, *args, perturb=perturb, reps=reps,
                                iters=5, rtt=rtt)
        res[name] = sec
        log(f"{name:10s} {sec * 1e3:.3f} ms  "
            f"(wall incl compile {time.time() - t0:.0f} s)")
        return sec

    # ---- stage fns (cumulative pipelines) -------------------------------
    def march(d_, p):
        tanel, d, half, az, _ = _raw_polar(d_, p, surface="bilinear", **kw)
        return tanel, d, half, az

    def geom(d_, p):
        """Mirror of _grid_contract:421-488 (viewer-centered)."""
        cell_n = geometry.EARTH_RADIUS_M * DEG / 1200
        cell_e = cell_n * p.cos_viewer_lat
        di = jnp.arange(P2, dtype=jnp.float32) - hw + 0.5
        dj = jnp.arange(P2, dtype=jnp.float32) - hw + 0.5
        nn = dj * cell_n
        ee = di * cell_e
        _, az_center, az_ndc_per_rad = _window(p)
        az = jnp.arctan2(ee[None, :], nn[:, None])
        az_u = _unwrap(az, az_center)
        x_ndc = (az_u - az_center) * az_ndc_per_rad
        xcol = jnp.round((x_ndc + 1.0) / 2.0 * W - 0.5).astype(jnp.int32)
        in_az = (x_ndc >= -1.0) & (x_ndc <= 1.0)
        xc = jnp.clip(xcol, 0, W - 1)
        dist = jnp.sqrt(ee[None, :] ** 2 + nn[:, None] ** 2)
        in_r = (dist >= p.znear) & (dist <= p.zfar)
        n0, n1 = d_.shape
        pj = p.viewer_cell_j + dj
        pi = p.viewer_cell_i + di
        pad = hw + 2
        demp = jnp.pad(d_.astype(jnp.float32), pad, mode="edge")
        j0 = jnp.floor(pj[0])
        i0 = jnp.floor(pi[0])
        fj = pj[0] - j0
        fi = pi[0] - i0
        S = P2 + 2
        js = jnp.clip(j0 + pad, 0, (n0 + 2 * pad) - S).astype(jnp.int32)
        is_ = jnp.clip(i0 + pad, 0, (n1 + 2 * pad) - S).astype(jnp.int32)
        win = jax.lax.dynamic_slice(demp, (js, is_), (S, S))
        z = ((1 - fj) * (1 - fi) * win[:-2, :-2]
             + (1 - fj) * fi * win[:-2, 1:-1]
             + fj * (1 - fi) * win[1:-1, :-2]
             + fj * fi * win[1:-1, 1:-1])
        t_cell = (z - p.viewer_z) / dist - dist * p.curv
        ing = (((pj >= 0) & (pj <= n0 - 1))[:, None]
               & ((pi >= 0) & (pi <= n1 - 1))[None, :])
        mask = in_az & in_r & ing
        region_a = jnp.abs(nn)[:, None] >= jnp.abs(ee)[None, :]
        return nn, ee, xc, t_cell, mask, region_a, az_center

    def arcs(tanel, d, half_step, az_center):
        """Mirror of _grid_quad's quarter-arc tables."""
        _, azc = az_center, az_center
        cosx = jnp.cos(azc - math.pi
                       + 2.0 * math.pi * (jnp.arange(W) + 0.5) / W)
        sinx = jnp.sin(azc - math.pi
                       + 2.0 * math.pi * (jnp.arange(W) + 0.5) / W)
        xids = jnp.arange(W, dtype=jnp.int32)
        col2 = lambda a: jax.lax.optimization_barrier(
            jnp.concatenate([a, a], axis=0))
        cos2, sin2, half2 = col2(cosx), col2(sinx), col2(half_step)
        tan2, d2 = col2(tanel), col2(d)
        xid2 = col2(xids)
        K = tanel.shape[1]

        def arc(theta0):
            xf = ((theta0 - azc + math.pi) * W / (2.0 * math.pi) - 0.5)
            s = jnp.mod(jnp.floor(xf) - 2.0, W).astype(jnp.int32)
            return dict(
                cos=jax.lax.dynamic_slice(cos2, (s,), (SQ,)),
                sin=jax.lax.dynamic_slice(sin2, (s,), (SQ,)),
                half=jax.lax.dynamic_slice(half2, (s,), (SQ,)),
                tan=jax.lax.dynamic_slice(tan2, (s, 0), (SQ, K)),
                dd=jax.lax.dynamic_slice(d2, (s, 0), (SQ, K)),
                xid=jax.lax.dynamic_slice(xid2, (s,), (SQ,)))

        def cat(arcs_):
            return {k: jnp.concatenate([a[k] for a in arcs_], axis=0)
                    for k in arcs_[0]}
        A_by_row = {"S": cat([arc(math.pi), arc(math.pi - qa)]),
                    "N": cat([arc(-qa), arc(0.0)])}
        B_by_col = {"W": cat([arc(-3.0 * qa), arc(-math.pi / 2.0)]),
                    "E": cat([arc(math.pi / 2.0), arc(qa)])}
        return A_by_row, B_by_col

    hpad = (-hw) % rc
    nh = (hw + hpad) // rc

    def tb_tables(B_by_col, ee):
        def tb_for(colhalf, ee_half):
            B = B_by_col[colhalf]
            ee_p = jnp.pad(ee_half, (0, hpad), constant_values=1.0)

            def tb_chunk(ee_c):
                r = ee_c[:, None] / B["sin"][None, :] - B["half"][None, :]
                msk = B["dd"][None] < r[:, :, None]
                return jnp.max(jnp.where(msk, B["tan"][None], NEG), axis=-1)
            TB = jax.lax.map(tb_chunk, ee_p.reshape(nh, rc))
            return TB.reshape(-1, TB.shape[-1])[:hw]
        return {"W": tb_for("W", ee[:hw]), "E": tb_for("E", ee[hw:])}

    def ta_tables(A_by_row, nn):
        outs = []
        for rowhalf, rsl in (("S", slice(0, hw)), ("N", slice(hw, P2))):
            A = A_by_row[rowhalf]
            nn_p = jnp.pad(nn[rsl], (0, hpad), constant_values=1.0)

            def ta_chunk(nn_c, A=A):
                r = nn_c[:, None] / A["cos"][None, :] - A["half"][None, :]
                return jnp.max(jnp.where(A["dd"][None] < r[:, :, None],
                                         A["tan"][None], NEG), axis=-1)
            outs.append(jax.lax.map(ta_chunk, nn_p.reshape(nh, rc)))
        return outs

    # ---- cumulative pipelines ------------------------------------------
    def pipe_march(d_, p):
        tanel, d, half, az = march(d_, p)
        return jnp.max(tanel) + jnp.max(d) + jnp.max(half)

    def pipe_geom(d_, p):
        tanel, d, half, az = march(d_, p)
        nn, ee, xc, t_cell, mask, ra, azc = geom(d_, p)
        return (jnp.max(tanel) + jnp.max(d) + jnp.max(half)
                + jnp.max(t_cell) + jnp.sum(xc) + jnp.sum(mask))

    def pipe_tb(d_, p):
        tanel, d, half, az = march(d_, p)
        nn, ee, xc, t_cell, mask, ra, azc = geom(d_, p)
        A_by_row, B_by_col = arcs(tanel, d, half, azc)
        TB = tb_tables(B_by_col, ee)
        return (jnp.max(TB["W"]) + jnp.max(TB["E"])
                + jnp.max(t_cell) + jnp.sum(xc) + jnp.sum(mask))

    def pipe_ta(d_, p):
        tanel, d, half, az = march(d_, p)
        nn, ee, xc, t_cell, mask, ra, azc = geom(d_, p)
        A_by_row, B_by_col = arcs(tanel, d, half, azc)
        TB = tb_tables(B_by_col, ee)
        TAs = ta_tables(A_by_row, nn)
        return (jnp.max(TB["W"]) + jnp.max(TB["E"])
                + sum(jnp.max(x) for x in TAs)
                + jnp.max(t_cell) + jnp.sum(xc) + jnp.sum(mask))

    fn = functools.partial(viewshed_grid, method="contract",
                           full_circle=True, out_halfwidth=hw,
                           **{k: v for k, v in kw.items()
                              if k != "aligned_scene"})

    t("march", pipe_march, dem, p0)
    t("+geom", pipe_geom, dem, p0)
    t("+tb", pipe_tb, dem, p0)
    t("+ta", pipe_ta, dem, p0)
    t("full", fn, dem, p0)
    log("---- stage deltas ----")
    log(f"march     {res['march'] * 1e3:.3f} ms")
    log(f"geom      {(res['+geom'] - res['march']) * 1e3:.3f} ms")
    log(f"tb        {(res['+tb'] - res['+geom']) * 1e3:.3f} ms")
    log(f"ta        {(res['+ta'] - res['+tb']) * 1e3:.3f} ms")
    log(f"pass2     {(res['full'] - res['+ta']) * 1e3:.3f} ms (by residue)")


if __name__ == "__main__":
    main()
