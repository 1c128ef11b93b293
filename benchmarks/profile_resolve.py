"""Stage-level timing of the headline render on the real TPU.

Times nested prefixes of the pipeline (march -> row map -> merge -> scans ->
pack -> butterfly -> image) with the same chained-dispatch methodology as
bench.py, so stage costs = differences of adjacent prefixes. Diagnostics for
kernel work; not part of the benchmark suite.
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 4096, 1024
ZFAR = 40000.0
CPD = 1200
LAT = 34.3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench import make_mosaic_dem
    from horizonator_tpu import geometry
    from horizonator_tpu.render import RenderParams, render_panorama
    from horizonator_tpu.render import raymarch as rm
    from horizonator_tpu.render.crossing import k_cross_for
    from horizonator_tpu.render import window as win

    dem = make_mosaic_dem()
    n = dem.shape[0]
    nsteps = k_cross_for(ZFAR, CPD, LAT, n=n)
    f = jnp.float32
    params = RenderParams(
        viewer_cell_i=f(n / 2), viewer_cell_j=f(n / 2), viewer_z=f(900.0),
        cos_viewer_lat=f(math.cos(math.radians(LAT))),
        az_rad0=f(math.radians(-180.0)), az_rad1=f(math.radians(180.0)),
        znear=f(100.0), zfar=f(ZFAR),
        znear_color=f(100.0), zfar_color=f(ZFAR))

    def march(p):
        return win.march_window(dem, p, width=WIDTH, k_cross=nsteps,
                                cells_per_deg=CPD, lat_hint_deg=LAT)

    def y_of(p):
        tanel, run_max, dists, az = march(p)
        _, _, az_ndc_per_rad = geometry.az_window_rad(p.az_rad0, p.az_rad1)
        aspect = WIDTH / HEIGHT
        el_k = jnp.arctan(run_max)
        y_k = (1.0 - el_k * (az_ndc_per_rad * aspect)) * (HEIGHT * 0.5) - 0.5
        return y_k

    def keys_of(p):
        y_k = y_of(p)
        w, k = y_k.shape
        h = HEIGHT
        yq = jnp.clip(jnp.round(y_k * rm._ROWQ), -2.0 ** 30, 2.0 ** 30)
        yq = jnp.clip(yq.astype(jnp.int32), -(2 ** 30) + 1, 2 ** 30 - 1)
        key_s = yq << 1
        thr = jnp.arange(h, dtype=jnp.int32)
        key_t = jnp.broadcast_to(((thr * jnp.int32(rm._ROWQ)) << 1) | 1,
                                 (w, h))
        n_tot = k + h
        n_pow2 = 1 << (n_tot - 1).bit_length()
        pad = jnp.full((w, n_pow2 - n_tot), jnp.int32(2 ** 31 - 1), jnp.int32)
        keys_all = jnp.concatenate([key_s, key_t, pad], axis=1)
        return keys_all, n_pow2, k, h, n_tot

    stages = {}

    def stage_march(p):
        tanel, run_max, _, _ = march(p)
        return jnp.sum(run_max)
    stages["A_march(run_max)"] = stage_march

    def stage_y(p):
        return jnp.sum(y_of(p))
    stages["B_+rowmap(arctan)"] = stage_y

    def stage_merge(p):
        keys_all, n_pow2, k, h, n_tot = keys_of(p)
        sk = rm._bitonic_merge_valley(keys_all, n_pow2)[:, :n_tot]
        return jnp.sum(sk.astype(jnp.float32))
    stages["C_+merge"] = stage_merge

    def stage_scans(p):
        keys_all, n_pow2, k, h, n_tot = keys_of(p)
        sk = rm._bitonic_merge_valley(keys_all, n_pow2)[:, :n_tot]
        w = sk.shape[0]
        big = jnp.int32(2 ** 30)
        is_thr = (sk & 1) == 1
        pos = jax.lax.broadcasted_iota(jnp.int32, (w, n_tot), 1)
        rank = jnp.cumsum(is_thr.astype(jnp.int32), axis=1) - 1
        idxv = (k - pos + rank).astype(jnp.int32)
        skey = sk >> 1
        y_cur = jax.lax.cummax(jnp.where(is_thr, -big, skey), axis=1)
        y_prev = jax.lax.cummin(jnp.where(is_thr, big, skey), axis=1,
                                reverse=True)
        return (jnp.sum(idxv.astype(jnp.float32))
                + jnp.sum((y_cur + y_prev).astype(jnp.float32)))
    stages["D_+scans(cumsum+max+min)"] = stage_scans

    def stage_resolve(p):
        y_k = y_of(p)
        idx, alpha, ok = rm._resolve_rows(y_k, HEIGHT)
        return (jnp.sum(idx.astype(jnp.float32)) + jnp.sum(alpha)
                + jnp.sum(ok.astype(jnp.float32)))
    stages["E_full_resolve(+butterfly)"] = stage_resolve

    def stage_render(p):
        img, rng_ = render_panorama(
            dem, p, width=WIDTH, height=HEIGHT, nsteps=nsteps,
            cells_per_deg=CPD, sampler="window", lat_hint_deg=LAT)
        return jnp.sum(rng_) + jnp.sum(img[..., 2].astype(jnp.float32))
    stages["F_full_render"] = stage_render

    R = 16

    def chain(fn):
        @jax.jit
        def run(p0):
            def one(i):
                p = p0._replace(viewer_cell_i=p0.viewer_cell_i + i,
                                viewer_cell_j=p0.viewer_cell_j - i)
                return fn(p)
            return jax.lax.map(one, jnp.arange(R, dtype=jnp.float32)).sum()
        return run

    # warm up + RTT
    s = chain(stages["A_march(run_max)"])(params)
    float(s)
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(jnp.float32(1.0) + s * 0)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.min(rtts))
    log(f"RTT min {rtt*1e3:.2f} ms")

    results = {}
    for name, fn in stages.items():
        run = chain(fn)
        t0 = time.perf_counter()
        float(run(params))
        log(f"{name}: first call {time.perf_counter()-t0:.1f} s")
        times = []
        for i in range(5):
            p = params._replace(viewer_cell_i=f(n / 2 + i))
            t0 = time.perf_counter()
            float(run(p))
            times.append(time.perf_counter() - t0)
        ms = 1e3 * max(1e-9, float(np.median(times)) - rtt) / R
        results[name] = ms
        log(f"{name}: {ms:.3f} ms")

    log("\n=== per-viewpoint stage prefix times ===")
    prev = 0.0
    for name, ms in results.items():
        log(f"{name:32s} {ms:7.3f} ms   (delta {ms - prev:+.3f})")
        prev = ms


if __name__ == "__main__":
    main()
