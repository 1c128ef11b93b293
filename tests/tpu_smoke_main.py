"""Real-TPU Mosaic smoke check (run in a fresh process, NOT under conftest's
CPU pin): compiles the window kernel with the Mosaic backend on the real
chip and compares it against the Pallas interpreter on the same device.

All regular tests run the kernel with interpret=True on CPU, so a
Mosaic-only regression (alignment, DMA bounds -- the exact constraint class
CLAUDE.md catalogs) would only surface as a bench crash; this is the
one-command guard. Invoked by tests/test_tpu_smoke.py (opt-in via
HORIZONATOR_TPU_SMOKE=1) and by the verify skill.

Prints TPU_SMOKE_OK on success; any mismatch or compile failure exits
nonzero.
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from horizonator_tpu.compile_cache import harden_cache
    harden_cache("/tmp/jax_bench_cache2")   # atomic puts + zlib + sweep
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache2")
    import jax.numpy as jnp
    from horizonator_tpu.render import RenderParams, render_panorama
    from horizonator_tpu.render.window import march_window
    from horizonator_tpu.render.crossing import k_cross_for

    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        print(f"TPU_SMOKE_SKIP: no TPU (default device {dev})")
        return 0

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
    k = k_cross_for(15000.0, 1200, 34.0, n=n)

    # march: Mosaic vs interpreter, same device, must agree bitwise for the
    # horizon and everywhere for the full tanel plane
    for tile_w in (64, 16):
        _, rm_mosaic, dists_m, _ = march_window(
            dem, p, width=512, k_cross=k, cells_per_deg=1200,
            lat_hint_deg=34.0, interpret=False, tile_w=tile_w)
        _, rm_interp, _, _ = march_window(
            dem, p, width=512, k_cross=k, cells_per_deg=1200,
            lat_hint_deg=34.0, interpret=True, tile_w=tile_w)
        if int(dists_m.dropped) != 0:
            print(f"TPU_SMOKE_FAIL: window guard reports "
                  f"{int(dists_m.dropped)} dropped tiles (tile_w={tile_w})")
            return 1
        a = np.asarray(rm_mosaic[:, -1])
        b = np.asarray(rm_interp[:, -1])
        vis = b > -1e30
        if not np.array_equal(a > -1e30, b > -1e30):
            print(f"TPU_SMOKE_FAIL: visibility mismatch (tile_w={tile_w})")
            return 1
        err = float(np.abs(a[vis] - b[vis]).max()) if vis.any() else 0.0
        if err > 1e-5:
            print(f"TPU_SMOKE_FAIL: horizon max err {err} (tile_w={tile_w})")
            return 1
        print(f"march tile_w={tile_w}: Mosaic == interpreter "
              f"(max err {err:.2e})", file=sys.stderr)

    # rectangular row bands (region sharding's local shape): 4 bands of
    # 128 rows + 1 halo row, marched with j_hi/j_offset on Mosaic; the
    # max-combined tanel must be BITWISE the unsharded Mosaic march's
    tan_full, _, _, _ = march_window(
        dem, p, width=512, k_cross=k, cells_per_deg=1200,
        lat_hint_deg=34.0, interpret=False)
    nb = n // 4
    comb = jnp.full_like(tan_full, -3.0e38)
    drop_band = 0
    for b in range(4):
        hi = min((b + 1) * nb + 1, n)
        band = dem[b * nb:hi]
        if band.shape[0] < nb + 1:            # fabricated last-band halo
            band = jnp.concatenate(
                [band, jnp.zeros((nb + 1 - band.shape[0], n), band.dtype)])
        j_hi = jnp.float32(nb - 1 if b == 3 else nb)
        tan_b, _, dists_b, _ = march_window(
            band, p, width=512, k_cross=k, cells_per_deg=1200,
            lat_hint_deg=34.0, interpret=False, j_hi=j_hi,
            j_offset=jnp.int32(b * nb))
        drop_band += int(dists_b.dropped)
        comb = jnp.maximum(comb, tan_b)
    if drop_band != 0:
        print(f"TPU_SMOKE_FAIL: banded march dropped {drop_band} tiles")
        return 1
    if not np.array_equal(np.asarray(comb), np.asarray(tan_full)):
        nbad = int((np.asarray(comb) != np.asarray(tan_full)).sum())
        print(f"TPU_SMOKE_FAIL: banded march != unsharded ({nbad} samples)")
        return 1
    print("banded march (4 row bands): Mosaic bitwise == unsharded",
          file=sys.stderr)

    # aligned-scene march: prebuilt padded tables with a camera-dependent
    # 128-aligned DMA lane base (cb_ref) + in-kernel lane-residual shift;
    # must be BITWISE the per-render-build Mosaic march, column-rolled by
    # the residual (compare through the resolved render below and the
    # run_max horizon here: max over lanes is roll-invariant)
    from horizonator_tpu.render.window import prepare_aligned_scene
    al_scene = prepare_aligned_scene(dem, k)
    tan_al, rm_al, dists_al, _ = march_window(
        dem, p, width=512, k_cross=k, cells_per_deg=1200,
        lat_hint_deg=34.0, interpret=False, scene=al_scene)
    if int(dists_al.dropped) != 0:
        print(f"TPU_SMOKE_FAIL: aligned march dropped "
              f"{int(dists_al.dropped)}")
        return 1
    h_al = np.asarray(jnp.max(tan_al, axis=1))
    h_full = np.asarray(jnp.max(tan_full, axis=1))
    if not np.array_equal(h_al, h_full):
        nbad = int((h_al != h_full).sum())
        print(f"TPU_SMOKE_FAIL: aligned-scene march != per-render build "
              f"({nbad} columns)")
        return 1
    print("aligned-scene march: Mosaic bitwise == per-render build",
          file=sys.stderr)

    # textured march, BOTH color-plane resolutions: the 2x path adds a
    # second strided DMA ((3, 2*win, TK) window at origin 2*o) that only
    # Mosaic exercises for real
    rngc = np.random.default_rng(7)
    for s in (1, 2):
        colors = jax.device_put(jnp.asarray(
            rngc.integers(0, 255, (3, s * n, s * n)).astype(np.float32)),
            dev)
        _, rm_m, _, _, tex_m = march_window(
            dem, p, width=512, k_cross=k, cells_per_deg=1200,
            lat_hint_deg=34.0, interpret=False, color_planes=colors)
        _, rm_i, _, _, tex_i = march_window(
            dem, p, width=512, k_cross=k, cells_per_deg=1200,
            lat_hint_deg=34.0, interpret=True, color_planes=colors)
        a, b = np.asarray(rm_m[:, -1]), np.asarray(rm_i[:, -1])
        vis = b > -1e30
        err = float(np.abs(a[vis] - b[vis]).max()) if vis.any() else 0.0
        tex_eq = np.array_equal(np.asarray(tex_m), np.asarray(tex_i))
        if err > 1e-5 or not tex_eq:
            print(f"TPU_SMOKE_FAIL: textured march s={s} "
                  f"(err {err}, tex_eq {tex_eq})")
            return 1
        print(f"textured march s={s}: Mosaic == interpreter", file=sys.stderr)
        if s == 1:
            # pre-packed (n, n) int32 planes (texture.pack_cell_colors,
            # the lod.build_color_pyramid level format): on-chip bitwise
            # vs the float-plane path, including the near-band fetches
            from horizonator_tpu.render.texture import pack_cell_colors
            cpk = jax.device_put(pack_cell_colors(colors), dev)
            _, rm_p, _, _, tex_p = march_window(
                dem, p, width=512, k_cross=k, cells_per_deg=1200,
                lat_hint_deg=34.0, interpret=False, color_planes=cpk)
            if not (np.array_equal(np.asarray(rm_p), np.asarray(rm_m))
                    and np.array_equal(np.asarray(tex_p),
                                       np.asarray(tex_m))):
                print("TPU_SMOKE_FAIL: pre-packed s=1 march != float path")
                return 1
            print("pre-packed s=1 march: Mosaic bitwise == float planes",
                  file=sys.stderr)
        if s == 2:
            # textured aligned scene: the 2x color window DMA now uses the
            # dynamic 128-aligned lane base too
            from horizonator_tpu.render.texture import prepare_color_planes
            cp2 = prepare_color_planes(colors)
            sc2 = prepare_aligned_scene(dem, k, color_planes=cp2)
            tan_a, _, d_a, _, tex_a = march_window(
                dem, p, width=512, k_cross=k, cells_per_deg=1200,
                lat_hint_deg=34.0, interpret=False, color_planes=cp2,
                scene=sc2)
            tan_b, _, _, _, tex_b = march_window(
                dem, p, width=512, k_cross=k, cells_per_deg=1200,
                lat_hint_deg=34.0, interpret=False, color_planes=cp2)
            r0 = np.asarray(d_a.lane0).astype(int)
            ta, tb = np.asarray(tan_a), np.asarray(tan_b)
            xa, xb = np.asarray(tex_a), np.asarray(tex_b)
            from horizonator_tpu.render.crossing import N_NEAR
            kkb = tb.shape[1] - N_NEAR
            for w in range(0, 512, 17):
                sl = slice(N_NEAR + r0[w], N_NEAR + r0[w] + kkb)
                visb = tb[w, N_NEAR:] > -1e30
                if (not np.array_equal(ta[w, sl], tb[w, N_NEAR:])
                        or not np.array_equal(xa[w, sl][visb],
                                              xb[w, N_NEAR:][visb])):
                    print(f"TPU_SMOKE_FAIL: textured aligned scene "
                          f"mismatch at column {w}")
                    return 1
            print("textured aligned-scene march: Mosaic bitwise == "
                  "per-render build", file=sys.stderr)

    # fused resolve kernel: Mosaic vs interpreter must agree BITWISE
    # (idx, quantized alpha, ok) on identical input rows
    from horizonator_tpu.render.resolve_window import (resolve_fits,
                                                       resolve_window)
    rng2 = np.random.default_rng(5)
    y = np.minimum.accumulate(
        (rng2.normal(size=(512, 200)) * 40 + 60).astype(np.float32), axis=1)
    yd = jax.device_put(jnp.asarray(y), dev)
    assert resolve_fits(200, 128)
    for monotone in (True, False):
        outs_m = resolve_window(yd, 128, monotone=monotone, interpret=False)
        outs_i = resolve_window(yd, 128, monotone=monotone, interpret=True)
        for name, a, b in zip(("idx", "alpha", "ok"), outs_m, outs_i):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                print(f"TPU_SMOKE_FAIL: resolve {name} mismatch "
                      f"(monotone={monotone})")
                return 1
    print("resolve kernel: Mosaic == interpreter (bitwise)", file=sys.stderr)

    # textured resolve: color payload through merge + fill + route
    tex = jnp.asarray(
        rng2.integers(0, 1 << 24, size=(512, 200)).astype(np.int32))
    texd = jax.device_put(tex, dev)
    outs_m = resolve_window(yd, 128, tex=texd, monotone=False,
                            interpret=False)
    outs_i = resolve_window(yd, 128, tex=texd, monotone=False,
                            interpret=True)
    for name, a, b in zip(("idx", "alpha", "ok", "tex"), outs_m, outs_i):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            print(f"TPU_SMOKE_FAIL: textured resolve {name} mismatch")
            return 1
    print("textured resolve kernel: Mosaic == interpreter (bitwise)",
          file=sys.stderr)

    # full render (exercises the resolve's butterfly route on-chip)
    img, rngs = render_panorama(dem, p, width=512, height=128, nsteps=k,
                                cells_per_deg=1200, sampler="window",
                                lat_hint_deg=34.0)
    vis_frac = float((rngs > 0).mean())
    if not (0.05 < vis_frac < 0.95):
        print(f"TPU_SMOKE_FAIL: degenerate visible fraction {vis_frac}")
        return 1
    print(f"render visible fraction {vis_frac:.3f}", file=sys.stderr)

    # absolute-accuracy oracle on a planar DEM: z = z0 + a*i + b*j is
    # reproduced exactly by bilinear/hat sampling, so every valid sample
    # has the closed-form tangent g(az) - dz0/d. This catches precision
    # corruption that CORRELATED comparisons (Mosaic vs interpreter,
    # cropped vs uncropped, sharded vs unsharded) cannot: both sides of
    # those share each dot/fusion. It pins the DEFAULT-precision bf16 MXU
    # einsum bug this smoke caught in round 5 (~5 m error on km-scale
    # near-band elevations, tanel off ~0.02-0.05) at >10x the tolerance.
    from horizonator_tpu import geometry
    z0, a_sl, b_sl = 1200.0, 0.6, -0.35
    demp = jax.device_put(jnp.asarray(z0 + a_sl * ii + b_sl * jj,
                                      jnp.float32), dev)
    dz0 = 25.0
    pp = p._replace(viewer_z=f(z0 + a_sl * 255.3 + b_sl * 257.6 + dz0),
                    zfar=f(6000.0))
    kp = k_cross_for(6000.0, 1200, 34.0, n=n)
    tanp, _, dists_p, az_p = march_window(
        demp, pp, width=512, k_cross=kp, cells_per_deg=1200,
        lat_hint_deg=34.0, interpret=False)
    cell_n_m = geometry.EARTH_RADIUS_M * math.pi / 180.0 / 1200.0
    cell_e_m = cell_n_m * math.cos(math.radians(34.0))
    az_np = np.asarray(az_p)
    g = (a_sl * np.sin(az_np) / cell_e_m + b_sl * np.cos(az_np) / cell_n_m)
    L = tanp.shape[1]
    idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (512, L))
    d_np = np.asarray(dists_p.d_of(idx))
    t_np = np.asarray(tanp)
    valid = (t_np > -1e30) & (d_np >= 100.0)
    ana = g[:, None] - dz0 / np.maximum(d_np, 1.0)
    err_p = float(np.abs((t_np - ana) * valid).max())
    # 4e-3 budget: the near patch rounds elevations to the 0.5 m class
    # (0.25 m / znear=100 m = 2.5e-3) + f32 slack; the bf16 corruption
    # mode measures 0.02-0.05
    if err_p > 4e-3:
        print(f"TPU_SMOKE_FAIL: planar-DEM analytic tangent err {err_p}")
        return 1
    print(f"planar-DEM analytic oracle: max tangent err {err_p:.2e}",
          file=sys.stderr)

    # ---- on-chip regression wall for the pure-XLA paths (VERDICT r4
    # missing #1): these only ever ran on real hardware via hand-run
    # benches before; the reference's GL pipeline is hardware-exercised
    # on every invocation (horizonator-lib.c:887-899) ------------------

    # viewshed contraction, all three modes. The quadrant paths contain
    # the optimization_barrier workaround for a REAL XLA TPU miscompile
    # (dynamic_slice of concatenate([x,x]) across the seam fused into a
    # lax.map consumer reads garbage; ops/viewshed.py). A silent
    # XLA/libtpu bump reintroducing it breaks the BITWISE equalities here
    # loudly -- the full-width contraction takes no dynamic arc slices.
    from horizonator_tpu.ops import viewshed_grid
    kwv = dict(width=512, nsteps=k, cells_per_deg=1200, out_halfwidth=128,
               sampler="window", lat_hint_deg=34.0, method="contract")
    for label, extra in (("viewer-centered quadrant", {}),
                         ("fixed-frame quadrant",
                          {"out_center_ij": (290.25, 231.5)})):
        full = viewshed_grid(dem, p, full_circle=False, **kwv, **extra)
        quad, vdrop = viewshed_grid(dem, p, full_circle=True,
                                    with_dropped=True, **kwv, **extra)
        nbad = int(np.sum(np.asarray(full) != np.asarray(quad)))
        if nbad or int(vdrop) != 0:
            print(f"TPU_SMOKE_FAIL: viewshed {label} != full-width "
                  f"({nbad} cells, guard {int(vdrop)}) -- check the "
                  f"optimization_barrier miscompile workaround")
            return 1
        print(f"viewshed contract {label}: bitwise == full-width",
              file=sys.stderr)
    # gather-path sanity on a SMOOTH twin of the scene: the two methods
    # differ by design on visibility-EDGE cells (az rounding + half-step
    # band), and this scene's 40 m noise makes 65% of all cells edges
    # (measured 10.2% disagreement there, 89% of it on edges -- expected,
    # not a break). The smooth twin keeps the edge fraction low so a real
    # break (a miscompile reads ~50% garbage) stands out: measured 3.3%.
    z_s = (500.0 + 400.0 * np.sin(ii / 37.0) * np.cos(jj / 53.0))
    dem_s = jax.device_put(jnp.asarray(np.maximum(z_s, 0.0), jnp.float32),
                           dev)
    vg = viewshed_grid(dem_s, p, method="gather", width=512, nsteps=k,
                       cells_per_deg=1200, out_halfwidth=128,
                       sampler="window", lat_hint_deg=34.0)
    vc = viewshed_grid(dem_s, p, full_circle=True, **kwv)
    frac = float(np.mean(np.asarray(vg) != np.asarray(vc)))
    if frac > 0.06:
        print(f"TPU_SMOKE_FAIL: contract vs gather disagree on "
              f"{frac:.1%} of smooth-scene cells")
        return 1
    print(f"viewshed contract vs gather (smooth twin): {frac:.2%} "
          f"boundary cells", file=sys.stderr)

    # hybrid exact-near texture path (the same dynamic-slice-into-consumer
    # fusion family as the miscompile): Mosaic vs interpreter on a
    # synthetic z12 atlas registered to this DEM's geometry
    from horizonator_tpu.render.texture import (
        AtlasParams, pack_atlas, tile_xy_from_latlon, atlas_to_grid_colors,
        prepare_color_planes)
    lat0, lon0 = 34.0, -118.0
    span = n / 1200.0
    x_lo, y_lo = tile_xy_from_latlon(lat0 + span, lon0, 12)
    x_hi, y_hi = tile_xy_from_latlon(lat0, lon0 + span, 12)
    x_lo, y_lo, x_hi, y_hi = x_lo - 1, y_lo - 1, x_hi + 1, y_hi + 1
    ap = AtlasParams(origin_cell_lon_deg=lon0, origin_cell_lat_deg=lat0,
                     osmtile_lowest_x=x_lo, osmtile_lowest_y=y_lo,
                     ntiles_x=x_hi - x_lo + 1, ntiles_y=y_hi - y_lo + 1)
    atl = rngc.integers(0, 256, (ap.ntiles_y * 256, ap.ntiles_x * 256, 3))
    atlas = jax.device_put(pack_atlas(jnp.asarray(atl.astype(np.uint8))),
                           dev)
    cp2 = prepare_color_planes(
        atlas_to_grid_colors(atlas, ap, n, 1200, scale=2))
    hyb = dict(width=512, k_cross=k, cells_per_deg=1200, lat_hint_deg=34.0,
               color_planes=cp2, atlas=atlas, atlas_params=ap,
               exact_near_m=1200.0)
    _, rm_hm, _, _, tex_hm = march_window(dem, p, interpret=False, **hyb)
    _, rm_hi, _, _, tex_hi = march_window(dem, p, interpret=True, **hyb)
    a, b = np.asarray(rm_hm[:, -1]), np.asarray(rm_hi[:, -1])
    vis = b > -1e30
    err = float(np.abs(a[vis] - b[vis]).max()) if vis.any() else 0.0
    tex_eq = np.array_equal(np.asarray(tex_hm), np.asarray(tex_hi))
    if err > 1e-5 or not tex_eq:
        print(f"TPU_SMOKE_FAIL: hybrid exact-near march "
              f"(err {err}, tex_eq {tex_eq})")
        return 1
    print("hybrid exact-near march: Mosaic == interpreter",
          file=sys.stderr)

    # shard_map o Mosaic composition on the real chip (1-device meshes):
    # the multi-chip code paths only ever ran with interpret=True on the
    # CPU test mesh before. Both the batch/az renderer and the
    # region-sharded renderer must reproduce the unsharded render BITWISE.
    from jax.sharding import Mesh
    from horizonator_tpu.parallel.sharding import make_sharded_renderer
    from horizonator_tpu.parallel.regions import make_region_sharded_renderer
    mesh_ba = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                   ("batch", "az"))
    sfn = make_sharded_renderer(mesh_ba, width=512, height=128, nsteps=k,
                                cells_per_deg=1200, sampler="window",
                                lat_hint_deg=34.0)
    pb = jax.tree.map(lambda x: jnp.asarray(x)[None], p)
    imgs_s, rngs_s = sfn(dem, pb)
    if not (np.array_equal(np.asarray(imgs_s[0]), np.asarray(img))
            and np.array_equal(np.asarray(rngs_s[0]), np.asarray(rngs))):
        print("TPU_SMOKE_FAIL: shard_map batch/az render != unsharded")
        return 1
    print("shard_map batch/az render: bitwise == unsharded",
          file=sys.stderr)
    mesh_r = Mesh(np.array(jax.devices()[:1]), ("region",))
    rfn = make_region_sharded_renderer(
        mesh_r, width=512, height=128, k_cross=k, cells_per_deg=1200,
        sampler="window", lat_hint_deg=34.0, with_guard=True)
    img_r, rng_r, guard_r = rfn(dem, p)
    if not (np.array_equal(np.asarray(img_r), np.asarray(img))
            and np.array_equal(np.asarray(rng_r), np.asarray(rngs))
            and int(np.asarray(guard_r).sum()) == 0):
        print("TPU_SMOKE_FAIL: region-sharded render != unsharded")
        return 1
    print("region-sharded render: bitwise == unsharded", file=sys.stderr)

    # LOD viewer-centered crop on the real chip: the crop is a
    # dynamic_slice feeding the table builds / Pallas windows -- the same
    # fusion family as the documented XLA TPU miscompile
    # (ops/viewshed.py's dynamic_slice-of-concatenate). Cropped vs
    # uncropped march_lod must agree: crossing distances bitwise, masks
    # equal except ulp-boundary flips, tangents to add-rounding ulps.
    import horizonator_tpu.render.lod as lod_mod
    plan = lod_mod.lod_plan(15000.0, 512, 1200, 34.0, n)
    c0 = lod_mod.level_crop_size(plan[0], 1200, 34.0)
    if c0 < n:
        pyr = lod_mod.build_pyramid(dem, 1 + max(s.level for s in plan))
        out_c = lod_mod.march_lod(pyr, p, width=512, plan=plan,
                                  cells_per_deg=1200, lat_hint_deg=34.0,
                                  interpret=False)
        orig_crop = lod_mod.level_crop_size
        lod_mod.level_crop_size = lambda *a: 10 ** 6
        try:
            out_u = lod_mod.march_lod(pyr, p, width=512, plan=plan,
                                      cells_per_deg=1200,
                                      lat_hint_deg=34.0, interpret=False)
        finally:
            lod_mod.level_crop_size = orig_crop
        tc, tu = np.asarray(out_c[0]), np.asarray(out_u[0])
        vc, vu = tc > -1e30, tu > -1e30
        both = vc & vu
        err = float(np.abs(tc[both] - tu[both]).max()) if both.any() else 0.0
        e_eq = np.array_equal(np.asarray(out_c[2].e), np.asarray(out_u[2].e))
        s_eq = np.array_equal(np.asarray(out_c[2].scale),
                              np.asarray(out_u[2].scale))
        if (np.mean(vc == vu) < 0.9999 or err > 1e-4
                or not e_eq or not s_eq):
            print(f"TPU_SMOKE_FAIL: LOD crop != uncropped (mask agree "
                  f"{np.mean(vc == vu):.5f}, err {err}, e_eq {e_eq}, "
                  f"s_eq {s_eq})")
            return 1
        print(f"LOD viewer crop (c={c0} of {n}): == uncropped on-chip",
              file=sys.stderr)
    else:
        print("TPU_SMOKE_WARN: LOD crop section vacuous (crop >= grid)",
              file=sys.stderr)

    print("TPU_SMOKE_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
