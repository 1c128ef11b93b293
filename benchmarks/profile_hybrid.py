"""A/B: textured headline (config 6 geometry) grid2x vs hybrid near field.

The hybrid path adds window._exact_near_colors -- a viewer-patch tensor
contraction over the packed z12 atlas for the near band + first k_x
crossing steps. This measures its frame cost at the 4096x1024 headline.

Run on the real TPU:  python benchmarks/profile_hybrid.py
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
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    from horizonator_tpu.render.raymarch import render_panorama
    from horizonator_tpu.render.crossing import k_cross_for
    from horizonator_tpu.render.texture import (prepare_color_planes,
                                                AtlasParams)
    from horizonator_tpu.render.window import (prepare_aligned_scene,
                                               exact_near_sizes)

    n = 3400
    dem = jax.device_put(synth_dem(n))
    p = make_params(n)
    k = k_cross_for(40000.0, 1200, 34.3, n=n)
    rng = np.random.default_rng(3)
    colors = prepare_color_planes(jnp.asarray(
        rng.integers(0, 255, (3, 2 * n, 2 * n)).astype(np.float32)))
    scene = prepare_aligned_scene(dem, k, color_planes=colors)
    colors = jax.tree.map(jax.device_put, colors)

    # synthetic atlas: geometry chosen so the viewer's patch is interior
    # (timing only depends on the PATCH, not the atlas extent)
    ap = AtlasParams(origin_cell_lon_deg=-118.0, origin_cell_lat_deg=34.0,
                     osmtile_lowest_x=702, osmtile_lowest_y=1630,
                     ntiles_x=8, ntiles_y=8)
    atlas = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 24, (2048, 2048)).astype(np.int32)))

    base = functools.partial(render_panorama, width=4096, height=1024,
                             nsteps=k, cells_per_deg=1200, sampler="window",
                             lat_hint_deg=34.3, textured=True)

    def run(exact_near_m):
        fn = lambda dem, colors, scene, atlas, p: base(
            dem, p, color_planes=colors, aligned_scene=scene, atlas=atlas,
            atlas_params=ap, exact_near_m=exact_near_m)
        return timed_chain(fn, dem, colors, scene, atlas, p, iters=12)

    for e in (None, 600.0, 1200.0, 2500.0):
        if e is not None:
            k_x, p_at = exact_near_sizes(e, 1200, 34.3, 12)
            log(f"exact_near_m={e}: k_x={k_x} patch={p_at}")
        sec = run(e)
        print(f"exact_near_m={e}: {sec * 1e3:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
