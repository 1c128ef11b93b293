"""Stage-level timing of the headline render on the real TPU.

Times nested prefixes of the pipeline (march -> row map -> fused resolve
kernel -> decode/shade/transpose tail) with the same chained-dispatch
methodology as bench.py, so stage costs = differences of adjacent prefixes.
Diagnostics for kernel work; not part of the benchmark suite.
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
    from horizonator_tpu.render.crossing import k_cross_for
    from horizonator_tpu.render import window as win
    from horizonator_tpu.render.resolve_window import resolve_window

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
        tanel, _, dists, az = march(p)
        _, _, az_ndc_per_rad = geometry.az_window_rad(p.az_rad0, p.az_rad1)
        aspect = WIDTH / HEIGHT
        el_k = jnp.arctan(tanel)
        return (1.0 - el_k * (az_ndc_per_rad * aspect)) * (HEIGHT * 0.5) - 0.5

    stages = {}

    def stage_march(p):
        tanel, _, _, _ = march(p)
        return jnp.sum(tanel)
    stages["A_march(tanel)"] = stage_march

    def stage_y(p):
        return jnp.sum(y_of(p))
    stages["B_+rowmap(arctan)"] = stage_y

    def stage_kernel(p):
        idx, alpha, ok = resolve_window(y_of(p), HEIGHT, monotone=False)
        return (jnp.sum(idx.astype(jnp.float32)) + jnp.sum(alpha)
                + jnp.sum(ok.astype(jnp.float32)))
    stages["C_+resolve_kernel"] = stage_kernel

    def stage_render(p):
        img, rng_ = render_panorama(
            dem, p, width=WIDTH, height=HEIGHT, nsteps=nsteps,
            cells_per_deg=CPD, sampler="window", lat_hint_deg=LAT)
        return jnp.sum(rng_) + jnp.sum(img[..., 2].astype(jnp.float32))
    stages["D_full_render(+shade/T)"] = stage_render

    R = 48

    def chain(fn):
        @jax.jit
        def run(p0):
            def one(i):
                p = p0._replace(viewer_cell_i=p0.viewer_cell_i + i,
                                viewer_cell_j=p0.viewer_cell_j - i)
                return fn(p)
            return jax.lax.map(one, jnp.arange(R, dtype=jnp.float32)).sum()
        return run

    s = chain(stages["A_march(tanel)"])(params)
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
        for i in range(8):
            p = params._replace(viewer_cell_i=f(n / 2 + i))
            t0 = time.perf_counter()
            float(run(p))
            times.append(time.perf_counter() - t0)
        # MIN wall: RTT jitter is strictly positive, so the min chain wall
        # is the honest estimate (median mixes in multi-ms tunnel spikes)
        ms = 1e3 * max(1e-9, float(np.min(times)) - rtt) / R
        results[name] = ms
        log(f"{name}: {ms:.3f} ms  (walls ms: "
            + str([round(1e3 * t, 1) for t in times]) + ")")

    log("\n=== per-viewpoint stage prefix times ===")
    prev = 0.0
    for name, ms in results.items():
        log(f"{name:28s} {ms:7.3f} ms   (delta {ms - prev:+.3f})")
        prev = ms


if __name__ == "__main__":
    main()
