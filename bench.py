"""Headline benchmark: panorama ms/viewpoint at 4096x1024 from a 3x3 SRTM3
mosaic on one TPU chip (BASELINE.md north-star; target < 10 ms/viewpoint).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = baseline_target_ms / measured_ms (>1 means faster than the
10 ms target; the reference publishes no numbers of its own, BASELINE.md).

Extra diagnostics go to stderr. Run with the default platform (real TPU).
"""

import json
import os
import math
import sys
import time

import numpy as np

BASELINE_TARGET_MS = 10.0
WIDTH, HEIGHT = 4096, 1024
ZFAR = 40000.0
CPD = 1200             # SRTM3
LAT = 34.3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_mosaic_dem(radius_cells=1700, seed=7):
    """Synthetic 3x3-SRTM3-mosaic-sized DEM window: (2*1700)^2 cells spans
    ~2.8 degrees, the size class of a 3x3 tile load."""
    import jax.numpy as jnp
    n = 2 * radius_cells
    rng = np.random.default_rng(seed)
    jj, ii = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32), indexing="ij")
    z = (600.0
         + 500.0 * np.sin(ii / 223.0) * np.cos(jj / 181.0)
         + 200.0 * np.sin(ii / 37.0 + 1.3) * np.cos(jj / 53.0)
         + 30.0 * rng.standard_normal((n, n), dtype=np.float32))
    return jnp.asarray(np.maximum(z, 0.0), jnp.float32)


def main():
    import jax
    # Persistent compilation cache: TPU compiles of the sort-heavy render
    # graph are expensive (minutes through a remote-compile service); cache
    # them across runs.
    from horizonator_tpu.compile_cache import harden_cache
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/jax_bench_cache2")
    harden_cache(cache_dir)   # atomic puts + zlib + era sweep
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from horizonator_tpu.render import RenderParams, render_panorama
    from horizonator_tpu.render.crossing import k_cross_for

    dev = jax.devices()[0]
    log(f"device: {dev}")

    dem = jax.device_put(make_mosaic_dem(), dev)
    n = dem.shape[0]
    nsteps = k_cross_for(ZFAR, CPD, LAT, n=n)
    log(f"grid {n}x{n}, crossing steps {nsteps}")
    f = jnp.float32
    params = RenderParams(
        viewer_cell_i=f(n / 2), viewer_cell_j=f(n / 2), viewer_z=f(900.0),
        cos_viewer_lat=f(math.cos(math.radians(LAT))),
        az_rad0=f(math.radians(-180.0)), az_rad1=f(math.radians(180.0)),
        znear=f(100.0), zfar=f(ZFAR),
        znear_color=f(100.0), zfar_color=f(ZFAR))

    kw = dict(width=WIDTH, height=HEIGHT, nsteps=nsteps, cells_per_deg=CPD,
              sampler="window", lat_hint_deg=LAT)

    # camera-independent prebuilt crossing tables (window.AlignedScene):
    # built once per scene, exactly as api.horizonator does on first render
    from horizonator_tpu.render.window import prepare_aligned_scene
    scene = prepare_aligned_scene(dem, nsteps)
    jax.block_until_ready(scene.elev)

    # NOTE on timing: under the axon dev tunnel, dispatch is asynchronous and
    # block_until_ready alone under-reports; we force completion by reducing
    # to a scalar on device and pulling it (the reduction itself is
    # negligible). Large D2H transfers are avoided entirely (the tunnel is
    # ~25 kB/s; real hosts move the 16 MB outputs over PCIe for free).
    import functools

    R = 48   # camera-moved renders chained per dispatch: amortizes the
    #          tunnel RTT noise (+-3 ms per pull) and the fixed
    #          per-dispatch host overhead (~10 ms beyond the scalar-pull
    #          RTT under the tunnel; measured by comparing 16- vs
    #          48-chains) out of the per-viewpoint metric

    @jax.jit
    def render_reduced(dem, scene, p):
        img, rng_ = render_panorama(dem, p, aligned_scene=scene, **kw)
        return (jnp.sum(rng_) + jnp.sum(img[..., 2].astype(jnp.float32)),
                (rng_ > 0).mean())

    @jax.jit
    def render_chain(dem, scene, p0):
        def one(i):
            p = p0._replace(viewer_cell_i=p0.viewer_cell_i + i,
                            viewer_cell_j=p0.viewer_cell_j - i)
            s, _ = render_reduced(dem, scene, p)
            return s
        return jax.lax.map(one, jnp.arange(R, dtype=jnp.float32)).sum()

    t0 = time.perf_counter()
    s, vis = render_reduced(dem, scene, params)
    s.block_until_ready()
    log(f"first call (compile + run): {time.perf_counter() - t0:.2f} s")
    log(f"visible fraction: {float(vis):.3f}")
    float(render_chain(dem, scene, params))   # compile the chain

    # RTT of a bare scalar pull, to subtract from per-iter timings. Use the
    # MINIMUM: transport jitter only ever inflates a sample, so the min is
    # the true floor and subtracting it is the conservative direction (the
    # metric can only overestimate the render cost). Sampled BEFORE and
    # AFTER the timed chains: the tunnel's floor itself drifts by several
    # ms across minutes (observed 27-36 ms session minima), and a floor
    # estimated only up front can misattribute that drift to the render.
    def measure_rtt(k=12):
        rtts = []
        for _ in range(k):
            t0 = time.perf_counter()
            float(jnp.float32(1.0) + s * 0)
            rtts.append(time.perf_counter() - t0)
        return rtts

    rtts = measure_rtt()
    log(f"scalar-pull RTT: min {1e3 * min(rtts):.2f} ms "
        f"(median {1e3 * float(np.median(rtts)):.2f})")

    iters = 6
    times = []
    for i in range(iters):
        p = params._replace(viewer_cell_i=f(n / 2 + i))
        t0 = time.perf_counter()
        float(render_chain(dem, scene, p))
        times.append(time.perf_counter() - t0)
    rtts += measure_rtt()
    rtt = float(np.min(rtts))
    # MIN chain wall, same rationale as the min RTT: transport jitter only
    # inflates a sample, so the fastest chain is the honest device estimate
    ms = 1e3 * max(1e-9, float(np.min(times)) - rtt) / R
    log(f"per-viewpoint latency over {R}-render chains: {ms:.3f} ms  "
        f"(chain walls ms: {[round(1e3 * t, 1) for t in times]})")

    print(json.dumps({
        "metric": "panorama_ms_per_viewpoint_4096x1024_3x3srtm3",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_TARGET_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
