"""Localize the on-chip LOD-crop vs uncropped mismatch (TPU smoke FAIL).

Runs march_lod cropped and uncropped on the default device, prints
per-segment mismatch stats + guard counters, and (optionally) saves the
tangent planes for a cross-backend diff:

    python benchmarks/repro_lod_crop.py [outdir]       # on the TPU
    JAX cpu run: tests/conftest.py-style cpu pin, same outdir, then diff.
"""

import math
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    if len(sys.argv) > 2 and sys.argv[2] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from horizonator_tpu.compile_cache import harden_cache
    harden_cache("/tmp/jax_bench_cache2")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache2")
    import jax.numpy as jnp
    import horizonator_tpu.render.lod as lod_mod
    from horizonator_tpu.render import RenderParams

    dev = jax.devices()[0]
    print(f"device: {dev}")

    n = 512
    rng = np.random.default_rng(3)
    jj, ii = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32), indexing="ij")
    z = (500.0 + 400.0 * np.sin(ii / 37.0) * np.cos(jj / 53.0)
         + 40.0 * rng.standard_normal((n, n), dtype=np.float32))
    dem = jax.device_put(jnp.asarray(np.maximum(z, 0.0), jnp.float32), dev)

    f = jnp.float32
    p = RenderParams(
        viewer_cell_i=f(255.3), viewer_cell_j=f(257.6), viewer_z=f(1100.0),
        cos_viewer_lat=f(math.cos(math.radians(34.0))),
        az_rad0=f(-math.pi), az_rad1=f(math.pi),
        znear=f(100.0), zfar=f(15000.0),
        znear_color=f(100.0), zfar_color=f(15000.0))

    plan = lod_mod.lod_plan(15000.0, 512, 1200, 34.0, n)
    print("plan:", [(s.level, int(s.d_lo), int(s.d_hi), s.k_lo, s.k_len)
                    for s in plan])
    for sp in plan:
        print(f"  level {sp.level}: crop "
              f"{lod_mod.level_crop_size(sp, 1200 / 2**sp.level, 34.0)} of "
              f"{-(-n // (2**sp.level))}")
    pyr = lod_mod.build_pyramid(dem, 1 + max(s.level for s in plan))

    def run(crop):
        orig = lod_mod.level_crop_size
        if not crop:
            lod_mod.level_crop_size = lambda *a: 10 ** 6
        try:
            tanel, _, dists, az = lod_mod.march_lod(
                pyr, p, width=512, plan=plan, cells_per_deg=1200,
                lat_hint_deg=34.0)
        finally:
            lod_mod.level_crop_size = orig
        return (np.asarray(tanel), int(dists.dropped),
                int(dists.truncated), dists)

    tc, drop_c, trunc_c, dc = run(True)
    tu, drop_u, trunc_u, du = run(False)
    print(f"guards: cropped dropped={drop_c} truncated={trunc_c}, "
          f"uncropped dropped={drop_u} truncated={trunc_u}")

    vc, vu = tc > -1e30, tu > -1e30
    print(f"mask agree: {np.mean(vc == vu):.6f}")
    both = vc & vu
    d = np.abs(tc - tu) * both
    print(f"max err {d.max():.6g} at {np.unravel_index(d.argmax(), d.shape)}")
    # segment boundaries: near band + per-level segments
    off = dc.n_near
    print(f"near band [0, {off}): max err {d[:, :off].max():.6g}, "
          f"{(d[:, :off] > 1e-4).sum()} lanes > 1e-4")
    for li, slen in enumerate(dc.seg_len):
        seg = d[:, off:off + slen]
        nbad = int((seg > 1e-4).sum())
        print(f"level seg {li} [{off}, {off + slen}): max "
              f"{seg.max():.6g}, {nbad} lanes > 1e-4", end="")
        if nbad:
            cols = np.unique(np.nonzero((seg > 1e-4))[0])
            print(f", cols {cols[:12]}{'...' if len(cols) > 12 else ''}"
                  f" ({len(cols)} cols)", end="")
        print()
        off += slen
    if len(sys.argv) > 1:
        import os
        os.makedirs(sys.argv[1], exist_ok=True)
        tag = dev.platform
        np.save(f"{sys.argv[1]}/tanel_crop_{tag}.npy", tc)
        np.save(f"{sys.argv[1]}/tanel_uncrop_{tag}.npy", tu)
        print(f"saved to {sys.argv[1]}/tanel_*_{tag}.npy")


if __name__ == "__main__":
    main()
