"""Stage split of the viewshed contraction raster (BASELINE config 7).

``viewshed_grid(method="contract", full_circle=True)`` measures ~1.1 ms at
the 800^2 config-7 shape. Before spending complexity on a blocked pass 2
(the CLAUDE.md future-work estimate: contract over ~32 columns instead of
~190 per cell), pin where the time actually goes:

  march      the raw polar window march (tanel, d) alone
  cellangle  per-cell geometry: az/xc/dist/mask + the 4-slice bilinear
             cell elevation + t_cell
  pass1      T_A (per row chunk) + T_B masked-max contractions over the
             full-circle arcs
  pass2      the one-hot column contraction th[a,b] = T[.., xc[a,b]]
             given precomputed T_A/T_B
  full       viewshed_grid itself (cross-check: stages should sum close)

Stages replicate ops/viewshed._grid_contract's code (same shapes, same
arc slicing) -- they are a measurement mirror, not the implementation.

Run on the TPU:  python benchmarks/profile_viewshed_pass2.py
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
    harden_cache()
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
    hw, W, rc = 400, 720, 100
    DEG = math.pi / 180.0
    NEG = jnp.float32(-3.0e38)
    P2 = 2 * hw
    kw = dict(width=W, nsteps=nsteps, cells_per_deg=1200,
              sampler="window", lat_hint_deg=34.3, znear_hint_m=50.0,
              aligned_scene=None)

    def perturb(a, i):
        return tuple(x._replace(viewer_cell_i=x.viewer_cell_i + i)
                     if hasattr(x, "viewer_cell_i") else x for x in a)

    rtt = measure_rtt()
    log(f"rtt {rtt * 1e3:.1f} ms")

    def t(name, fn, *args, reps=64):
        t0 = time.time()
        sec = device_time_chain(fn, *args, perturb=perturb, reps=reps,
                                iters=5, rtt=rtt)
        log(f"{name:10s} {sec * 1e3:.3f} ms  "
            f"(wall incl compile {time.time() - t0:.0f} s)")
        return sec

    # --- stage 1: the raw polar march alone
    def march(d_, p):
        tanel, d, half, az, _ = _raw_polar(d_, p, surface="bilinear", **kw)
        return tanel, d, half, az
    t("march", march, dem, p0)

    # --- shared cell geometry, replicated from _grid_contract
    def cell_geom(p):
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
        return nn, ee, xc, in_az & in_r, dist, az_center

    def cellangle(d_, p):
        nn, ee, xc, m, dist, _ = cell_geom(p)
        n0, n1 = d_.shape
        dj = nn / (geometry.EARTH_RADIUS_M * DEG / 1200)
        di = ee / (geometry.EARTH_RADIUS_M * DEG / 1200 * p.cos_viewer_lat)
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
        return t_cell, xc, m
    t("cellangle", cellangle, dem, p0)

    # --- arcs (full_circle) -- replicated
    SA = min(W, W // 4 + 8)

    def arcs_of(p, tanel, d, half_step, az_center):
        az_cols = (az_center - math.pi
                   + 2.0 * math.pi * (jnp.arange(W) + 0.5) / W)
        cosx = jnp.cos(az_cols)
        sinx = jnp.sin(az_cols)
        xids = jnp.arange(W, dtype=jnp.int32)
        col2 = lambda a: jax.lax.optimization_barrier(
            jnp.concatenate([a, a], axis=0))
        cos2, sin2, half2 = col2(cosx), col2(sinx), col2(half_step)
        tan2, d2 = col2(tanel), col2(d)
        xid2 = col2(xids)
        K = tanel.shape[1]

        def arc(theta0):
            xf = ((theta0 - az_center + math.pi) * W / (2.0 * math.pi) - 0.5)
            s = jnp.mod(jnp.floor(xf) - 2.0, W).astype(jnp.int32)
            return dict(
                cos=jax.lax.dynamic_slice(cos2, (s,), (SA,)),
                sin=jax.lax.dynamic_slice(sin2, (s,), (SA,)),
                half=jax.lax.dynamic_slice(half2, (s,), (SA,)),
                tan=jax.lax.dynamic_slice(tan2, (s, 0), (SA, K)),
                dd=jax.lax.dynamic_slice(d2, (s, 0), (SA, K)),
                xid=jax.lax.dynamic_slice(xid2, (s,), (SA,)))

        def cat(arcs_):
            return {k: jnp.concatenate([a[k] for a in arcs_], axis=0)
                    for k in arcs_[0]}
        qa = math.pi / 4.0
        A = cat([arc(-qa), arc(math.pi - qa)])
        B = cat([arc(math.pi / 2 - qa), arc(-math.pi / 2 - qa)])
        return A, B

    npad = (-P2) % rc
    nc = (P2 + npad) // rc

    # --- pass 1 alone: TA (all chunks) + TB
    def pass1(d_, p):
        tanel, d, half, az, _ = _raw_polar(d_, p, surface="bilinear", **kw)
        nn, ee, _, _, _, az_center = cell_geom(p)
        A, B = arcs_of(p, tanel, d, half, az_center)
        nn_p = jnp.pad(nn, (0, npad), constant_values=1.0)
        ee_p = jnp.pad(ee, (0, npad), constant_values=1.0)

        def tb_chunk(ee_c):
            r = ee_c[:, None] / B["sin"][None, :] - B["half"][None, :]
            msk = B["dd"][None] < r[:, :, None]
            return jnp.max(jnp.where(msk, B["tan"][None], NEG), axis=-1)
        TB = jax.lax.map(tb_chunk, ee_p.reshape(nc, rc))

        def ta_chunk(nn_c):
            r = nn_c[:, None] / A["cos"][None, :] - A["half"][None, :]
            return jnp.max(jnp.where(A["dd"][None] < r[:, :, None],
                                     A["tan"][None], NEG), axis=-1)
        TA = jax.lax.map(ta_chunk, nn_p.reshape(nc, rc))
        return TA, TB
    t("march+p1", pass1, dem, p0)

    # --- pass 2 alone, on precomputed TA/TB/xc (materialized once)
    tanel0, d0, half0, az0, _ = _raw_polar(dem, p0, surface="bilinear", **kw)
    nn0, ee0, xc0, m0, _, azc0 = cell_geom(p0)
    A0, B0 = arcs_of(p0, tanel0, d0, half0, azc0)
    TA0, TB0 = jax.block_until_ready(pass1(dem, p0))
    ra0 = jnp.abs(nn0)[:, None] >= jnp.abs(ee0)[None, :]
    t0c, _, _ = cellangle(dem, p0)
    xc_p = jnp.pad(xc0, ((0, npad), (0, 0)))
    ra_p = jnp.pad(ra0, ((0, npad), (0, 0)))
    t_p = jnp.pad(t0c, ((0, npad), (0, 0)))
    m_p = jnp.pad(m0, ((0, npad), (0, 0)))
    chunked = {"xc": xc_p.reshape(nc, rc, P2), "ra": ra_p.reshape(nc, rc, P2),
               "t": t_p.reshape(nc, rc, P2), "m": m_p.reshape(nc, rc, P2),
               "TA": TA0.reshape(nc, rc, -1)}
    xidA, xidB = A0["xid"], B0["xid"]
    TB_r = TB0.reshape(-1, TB0.shape[-1])[:P2]

    def pass2(chunked_, TB_, eps):
        def rows(c):
            eqA = c["xc"][:, :, None] == xidA[None, None, :]
            thA = jnp.max(jnp.where(eqA, c["TA"][:, None, :], NEG), axis=-1)
            eqB = c["xc"][:, :, None] == xidB[None, None, :]
            thB = jnp.max(jnp.where(eqB, TB_[None, :, :], NEG), axis=-1)
            th = jnp.where(c["ra"], thA, thB)
            return (c["t"] + eps >= th) & c["m"]
        return jax.lax.map(rows, chunked_)

    def pass2_args(ch, TB_, p):
        # perturb flows through eps (a traced scalar) so XLA can't CSE
        return pass2(ch, TB_, p.viewer_cell_i * 1e-12)
    t("pass2", pass2_args, chunked, TB_r, p0)

    # --- the real op, for cross-checking the split
    fn = functools.partial(viewshed_grid, method="contract", row_chunk=rc,
                           full_circle=True, out_halfwidth=hw,
                           **{k: v for k, v in kw.items()
                              if k != "aligned_scene"})
    t("full", fn, dem, p0)


if __name__ == "__main__":
    main()
