"""A/B: gather-based viewshed_grid vs the separable contraction resampler.

The 800x800 raster (BASELINE config 7) was floored by its final
``visible[xc, kc]`` gather: 640k random-indexed elements at the measured
~100-190 M elem/s = 3.4-6.6 ms. ``viewshed_grid(method="contract")``
(ops/viewshed.py:_grid_contract) removes every gather with two separable
masked-max contractions; measured 6.60 -> ~2.0 ms on v5e (flat across
row_chunk 25..100), with ~4.6% boundary-cell disagreement on the noisy
synthetic terrain (0.4% on smooth terrain; the contract path measures
CLOSER to an exact per-cell ray oracle -- see tests/test_viewshed_contract).

Run on the TPU:  python benchmarks/profile_viewshed_contract.py [all|base|chunks]
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
    import jax.numpy as jnp
    from horizonator_tpu.compile_cache import harden_cache
    harden_cache()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from horizonator_tpu.ops import viewshed_grid
    from horizonator_tpu.render.crossing import k_cross_for
    from horizonator_tpu.profiling import device_time_chain, measure_rtt
    sys.path.insert(0, "benchmarks")
    from suite import synth_dem, make_params

    log(f"device: {jax.devices()[0]}")
    n = 1200
    dem = jax.device_put(synth_dem(n))
    p = make_params(n, znear=50.0, zfar=20000.0)
    nsteps = k_cross_for(20000.0, 1200, 34.3, n=n)
    hw = 400
    W = 720
    kw = dict(width=W, nsteps=nsteps, cells_per_deg=1200, out_halfwidth=hw,
              sampler="window", lat_hint_deg=34.3)

    def perturb(a, i):
        dem_, p_ = a
        return (dem_, p_._replace(viewer_cell_i=p_.viewer_cell_i + i))

    rtt = measure_rtt()
    log(f"rtt {rtt * 1e3:.1f} ms")

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "base"):
        fn = functools.partial(viewshed_grid, method="gather", **kw)
        t0 = time.time()
        sec = device_time_chain(fn, dem, p, perturb=perturb, reps=16,
                                iters=5, rtt=rtt)
        log(f"gather path: {sec * 1e3:.3f} ms/raster "
            f"(wall incl compile {time.time() - t0:.0f} s)")

    for rc, full in ([(100, False), (100, True)] if which != "chunks"
                     else [(25, True), (64, True), (100, True)]):
        fn = functools.partial(viewshed_grid, method="contract",
                               row_chunk=rc, full_circle=full, **kw)
        t0 = time.time()
        sec = device_time_chain(fn, dem, p, perturb=perturb, reps=16,
                                iters=5, rtt=rtt)
        log(f"contract (row_chunk={rc}, full_circle={full}): "
            f"{sec * 1e3:.3f} ms/raster "
            f"(wall incl compile {time.time() - t0:.0f} s)")

    vb = viewshed_grid(dem, p, method="gather", **kw)
    vc = viewshed_grid(dem, p, method="contract", **kw)
    mism = int(jnp.sum(vb != vc))
    log(f"mismatch: {mism}/{vb.size} = {mism / vb.size * 100:.3f}%  "
        f"(visible: gather {int(jnp.sum(vb))}, contract {int(jnp.sum(vc))})")


if __name__ == "__main__":
    main()
