"""Pallas window kernel vs the gather-based crossing sampler (its oracle).

Both implement the same supercover-DDA geometry (crossing.CrossingGeom);
the kernel must agree everywhere up to the crossing path's 0.5 m int16
elevation quantization. Runs on the CPU backend (Pallas CPU lowering)."""

import functools
import math

import numpy as np
import jax.numpy as jnp
import pytest

from horizonator_tpu.render import render_panorama
from horizonator_tpu.render.crossing import (pack_scene, march_crossing,
                                             k_cross_for)
from horizonator_tpu.render.window import march_window, window_size
from tests.test_crossing import make_dem, params_for, CPD


# jitted march wrappers: eagerly these dispatch ~180 per-op XLA:CPU
# compiles per shape (~7 s); jitted it is ONE compile per shape, shared
# through the persistent cache across tests and runs (suite-time diet)
import jax as _jax


@functools.partial(_jax.jit, static_argnames=("width", "k"))
def _march_c(scene, p, width, k):
    return march_crossing(scene, p, width=width, k_cross=k,
                          cells_per_deg=CPD)[1][:, -1]


@functools.partial(_jax.jit, static_argnames=("width", "k"))
def _march_w(dem, p, width, k):
    return march_window(dem, p, width=width, k_cross=k,
                        cells_per_deg=CPD, lat_hint_deg=34.0)[1][:, -1]


def _horizons(dem, p, width, k):
    scene = pack_scene(dem)
    return (np.asarray(_march_c(scene, p, width, k)),
            np.asarray(_march_w(dem, p, width, k)))


class TestWindowKernel:
    @pytest.mark.parametrize("viewer", [(128.3, 127.6), (6.2, 250.0),
                                        (128.0, 128.0)])
    def test_matches_crossing_sampler(self, viewer):
        dem = make_dem(256)
        d_np = np.asarray(dem)
        vz = float(d_np[int(viewer[1]):int(viewer[1]) + 2,
                        int(viewer[0]):int(viewer[0]) + 2].max()) + 2.0
        p = params_for(dem, *viewer, vz)
        k = k_cross_for(15000.0, CPD, 34.0, n=256)
        hc, hw = _horizons(dem, p, 512, k)
        agree = (hc > -1e30) == (hw > -1e30)
        assert agree.mean() == 1.0
        vis = hc > -1e30
        # 0.5 m quantization of the crossing path over >= 100 m distances
        assert np.abs(hc[vis] - hw[vis]).max() < 6e-3

    @pytest.mark.parametrize("width", [800, 100, 48])
    def test_non_power_of_two_widths(self, width):
        # Regression: pick_tile_w(800) once returned 50 (not a multiple of
        # 8) and Mosaic rejected the output block. Any width must pick an
        # aligned tile and agree with the oracle; results must also be
        # tile_w-invariant.
        from horizonator_tpu.render.window import pick_tile_w
        assert pick_tile_w(width) % 8 == 0
        dem = make_dem(256)
        d_np = np.asarray(dem)
        vz = float(d_np[127:129, 128:130].max()) + 2.0
        p = params_for(dem, 128.3, 127.6, vz)
        k = k_cross_for(15000.0, CPD, 34.0, n=256)
        hc, hw = _horizons(dem, p, width, k)
        assert np.mean((hc > -1e30) == (hw > -1e30)) == 1.0
        vis = hc > -1e30
        assert np.abs(hc[vis] - hw[vis]).max() < 6e-3
        _, rm8, _, _ = march_window(dem, p, width=width, k_cross=k,
                                    cells_per_deg=CPD, lat_hint_deg=34.0,
                                    tile_w=8)
        np.testing.assert_array_equal(np.asarray(rm8[:, -1]), hw)

    def test_narrow_window_and_wrap(self):
        dem = make_dem(256, rough=8.0)
        d_np = np.asarray(dem)
        vz = float(d_np[127:129, 128:130].max()) + 2.0
        k = k_cross_for(12000.0, CPD, 34.0, n=256)
        for az0, az1 in [(170.0, 190.0), (-30.0, -29.0), (359.0, 361.0)]:
            p = params_for(dem, 128.3, 127.6, vz, az0=az0, az1=az1,
                           zfar=12000.0)
            hc, hw = _horizons(dem, p, 256, k)
            vis = hc > -1e30
            assert np.mean((hc > -1e30) == (hw > -1e30)) == 1.0
            if vis.any():
                assert np.abs(hc[vis] - hw[vis]).max() < 6e-3

    def test_tiny_dem_padding(self):
        dem = make_dem(96, rough=4.0)
        d_np = np.asarray(dem)
        vz = float(d_np[47:49, 48:50].max()) + 2.0
        p = params_for(dem, 48.2, 47.7, vz, zfar=6000.0)
        k = k_cross_for(6000.0, CPD, 34.0, n=96)
        hc, hw = _horizons(dem, p, 128, k)
        vis = hc > -1e30
        assert np.mean((hc > -1e30) == (hw > -1e30)) == 1.0
        assert np.abs(hc[vis] - hw[vis]).max() < 6e-3

    def test_full_render_via_sampler_arg(self):
        dem = make_dem(256, rough=5.0)
        d_np = np.asarray(dem)
        vz = float(d_np[127:129, 128:130].max()) + 2.0
        p = params_for(dem, 128.3, 127.6, vz, zfar=10000.0)
        k = k_cross_for(10000.0, CPD, 34.0, n=256)
        img_w, rng_w = render_panorama(dem, p, width=360, height=180,
                                       nsteps=k, cells_per_deg=CPD,
                                       sampler="window", lat_hint_deg=34.0)
        img_c, rng_c = render_panorama(pack_scene(dem), p, width=360,
                                       height=180, nsteps=k,
                                       cells_per_deg=CPD, sampler="crossing")
        rw, rc = np.asarray(rng_w), np.asarray(rng_c)
        assert np.mean((rw < 0) == (rc < 0)) > 0.999
        both = (rw > 0) & (rc > 0)
        assert np.median(np.abs(rw[both] - rc[both])) < 2.0

    def test_window_size_static(self):
        # static in (width, K, n, lat bucket) only
        assert window_size(4096, 576, 3400, 34.3) == window_size(
            4096, 576, 3400, 34.3)
        assert window_size(1024, 576, 3400, 34.3) > window_size(
            4096, 576, 3400, 34.3)

    def test_textured_render_through_window(self):
        import jax.numpy as jnp
        from horizonator_tpu.render.texture import AtlasParams
        dem = make_dem(192, rough=4.0)
        d = np.asarray(dem)
        vz = float(d[95:97, 96:98].max()) + 10.0
        p = params_for(dem, 96.3, 95.7, vz, zfar=8000.0)
        k = k_cross_for(8000.0, CPD, 34.0, n=192)
        ap = AtlasParams(origin_cell_lon_deg=-118.0, origin_cell_lat_deg=34.0,
                         osmtile_lowest_x=705, osmtile_lowest_y=1635,
                         ntiles_x=2, ntiles_y=2, zoom=12)
        atlas = jnp.asarray(np.random.default_rng(0).integers(
            0, 255, (512, 512, 3), dtype=np.uint8))
        img, rng = render_panorama(dem, p, width=256, height=128, nsteps=k,
                                   cells_per_deg=CPD, sampler="window",
                                   lat_hint_deg=34.0, textured=True,
                                   atlas=atlas, atlas_params=ap)
        im, r = np.asarray(img), np.asarray(rng)
        vis = r > 0
        assert vis.any()
        # texture (not just red ramp): green channel non-zero on terrain
        assert im[vis][:, 1].astype(int).sum() > 0
        # sky stays pure blue
        assert np.all(im[~vis] == np.array([255, 0, 0], np.uint8))


    def test_textured_2x_planes_constant_matches_1x(self):
        # half-cell planes: constant colors must round-trip identically to
        # the cell-resolution path (bilinear of a constant), and geometry
        # must be untouched
        import jax.numpy as jnp
        n = 192
        dem = make_dem(n, rough=4.0)
        vz = float(np.asarray(dem)[95:97, 96:98].max()) + 5.0
        p = params_for(dem, 96.3, 95.7, vz, zfar=8000.0)
        k = k_cross_for(8000.0, CPD, 34.0, n=n)
        c1 = jnp.full((3, n, n), 77.0, jnp.float32)
        c2 = jnp.full((3, 2 * n, 2 * n), 77.0, jnp.float32)
        t1, _, _, _, tex1 = march_window(dem, p, width=256, k_cross=k,
                                         cells_per_deg=CPD,
                                         lat_hint_deg=34.0, color_planes=c1)
        t2, _, _, _, tex2 = march_window(dem, p, width=256, k_cross=k,
                                         cells_per_deg=CPD,
                                         lat_hint_deg=34.0, color_planes=c2)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        vis = np.asarray(t1) > -1e30
        assert (np.asarray(tex1)[vis] == 0x4D4D4D).all()
        assert (np.asarray(tex2)[vis] == 0x4D4D4D).all()

    def test_packed_cell_planes_bitwise(self):
        # pre-packed (n, n) int32 cell-res planes (texture.pack_cell_colors,
        # what lod.build_color_pyramid now emits) must be BITWISE the
        # (3, n, n) float path -- both through the patch-contraction near
        # band (default znear hint) and the bilinear fallback
        # (znear_hint_m=None), the two branches that fetch s=1 colors
        import jax.numpy as jnp
        from horizonator_tpu.render.texture import pack_cell_colors
        n = 192
        dem = make_dem(n, rough=4.0)
        vz = float(np.asarray(dem)[95:97, 96:98].max()) + 5.0
        p = params_for(dem, 96.3, 95.7, vz, zfar=8000.0)
        k = k_cross_for(8000.0, CPD, 34.0, n=n)
        rng = np.random.default_rng(3)
        c1 = jnp.asarray(rng.integers(0, 256, (3, n, n)).astype(np.float32))
        cpk = pack_cell_colors(c1)
        assert cpk.shape == (n, n) and cpk.dtype == jnp.int32
        for hint in (100.0, None):
            tf, _, _, _, texf = march_window(
                dem, p, width=256, k_cross=k, cells_per_deg=CPD,
                lat_hint_deg=34.0, color_planes=c1, znear_hint_m=hint)
            tp, _, _, _, texp = march_window(
                dem, p, width=256, k_cross=k, cells_per_deg=CPD,
                lat_hint_deg=34.0, color_planes=cpk, znear_hint_m=hint)
            np.testing.assert_array_equal(np.asarray(tf), np.asarray(tp))
            np.testing.assert_array_equal(np.asarray(texf),
                                          np.asarray(texp))
        with pytest.raises(ValueError, match="packed int32"):
            march_window(dem, p, width=256, k_cross=k, cells_per_deg=CPD,
                         lat_hint_deg=34.0,
                         color_planes=cpk.astype(jnp.float32))

    def test_textured_2x_resolves_finer_detail(self):
        # a half-cell checker on the color planes: the 2x path must carry
        # both phases of the pattern; the 1x plane cannot even represent it
        import jax.numpy as jnp
        n = 192
        dem = jnp.zeros((n, n), jnp.float32)
        p = params_for(dem, 96.3, 95.7, 30.0, zfar=6000.0)
        k = k_cross_for(6000.0, CPD, 34.0, n=n)
        jj2, ii2 = np.meshgrid(np.arange(2 * n), np.arange(2 * n),
                               indexing="ij")
        chk = (((ii2 + jj2) % 2) * 255).astype(np.float32)
        c2 = jnp.asarray(np.stack([chk, chk, chk]))
        _, _, _, _, tex2 = march_window(dem, p, width=256, k_cross=k,
                                        cells_per_deg=CPD,
                                        lat_hint_deg=34.0, color_planes=c2)
        t2 = np.asarray(tex2)
        b = t2 & 0xff
        # crossing samples land ON grid lines where the half-cell checker
        # alternates along the line: both dark and bright survive
        assert (b > 180).any() and (b < 75).any()


class TestWindowGuard:
    """The static-VMEM-window self-guard (dists.dropped)."""

    @staticmethod
    @functools.partial(_jax.jit, static_argnames=("width", "k", "hint"))
    def _march_jit(dem, p, width, k, hint):
        _, rm, dists, _ = march_window(dem, p, width=width, k_cross=k,
                                       cells_per_deg=CPD, lat_hint_deg=hint)
        return rm[:, -1], dists.dropped

    def _march(self, dem, p, width, k, hint):
        rm, dropped = self._march_jit(dem, p, width, k, hint)
        return np.asarray(rm), int(dropped)

    def test_correct_hint_drops_nothing(self):
        dem = make_dem(256)
        vz = float(np.asarray(dem)[127:129, 128:130].max()) + 2.0
        p = params_for(dem, 128.3, 127.6, vz)
        k = k_cross_for(15000.0, CPD, 34.0, n=256)
        _, dropped = self._march(dem, p, 512, k, 34.0)
        assert dropped == 0

    def test_wrong_lat_hint_fails_loudly(self):
        # Viewer at latitude 85 with a step budget k sized for the equator
        # (k_cross_for(lat=0)): near the row-dominance boundary the N
        # crossing table's t swings across [-1, 1] within the one 64-column
        # tile centered on north (az window shifted so north is mid-tile),
        # so far samples span ~2 * zfar/cell_n positions -- beyond the
        # lat-0-sized window. The guard must report dropped tiles instead
        # of silently lowering horizons. A tall ridge is planted inside the
        # dropped position range (az ~4 deg, d ~21 km).
        n = 512
        dem_np = np.array(make_dem(n, rough=4.0))
        jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        dem_np += 2500.0 * np.exp(-((ii - 437) ** 2 + (jj - 482) ** 2)
                                  / (2 * 6.0 ** 2)).astype(np.float32)
        dem = jnp.asarray(dem_np)
        vz = float(dem_np[255:257, 256:258].max()) + 2.0
        p = params_for(dem, 256.3, 255.6, vz, az0=-168.75, az1=191.25,
                       zfar=23000.0, lat=85.0)
        k = k_cross_for(23000.0, CPD, 0.0, n=n)   # deliberately lat-0 budget
        h_bad, dropped_bad = self._march(dem, p, 1024, k, 0.0)
        assert dropped_bad > 0

        # the correct hint covers everything and matches the gather oracle
        h_good, dropped_good = self._march(dem, p, 1024, k, 85.0)
        assert dropped_good == 0
        hc = np.asarray(_march_c(pack_scene(dem), p, 1024, k))
        vis = hc > -1e30
        assert ((hc > -1e30) == (h_good > -1e30)).all()
        assert np.abs(hc[vis] - h_good[vis]).max() < 6e-3
        # and the undersized window really did lower horizons: the ridge
        # vanishes from the wrong-hint march (the failure the guard
        # exists to catch)
        assert (h_bad < h_good - 1e-3).any()


class TestNearPatch:
    """Gather-free near band: static viewer patch + hat contraction
    (window.near_patch_size). Same 0.5 m quantization class as the gather
    path; a wrong znear hint must fail loudly, an oversized one must fall
    back to gathers."""

    def _h(self, dem, p, k, **kw):
        _, rm, dists, _ = march_window(dem, p, width=512, k_cross=k,
                                       cells_per_deg=CPD, lat_hint_deg=34.0,
                                       **kw)
        return np.asarray(rm[:, -1]), int(dists.dropped)

    def test_patch_matches_gather_path(self):
        dem = make_dem(256)
        vz = float(np.asarray(dem)[127:129, 128:130].max()) + 2.0
        p = params_for(dem, 128.3, 127.6, vz)
        k = k_cross_for(15000.0, CPD, 34.0, n=256)
        hp, dp = self._h(dem, p, k)                     # default hint 100 m
        hg, dg = self._h(dem, p, k, znear_hint_m=None)  # gather path
        assert dp == 0 and dg == 0
        assert ((hp > -1e30) == (hg > -1e30)).all()
        vis = hg > -1e30
        # both paths bilinearly interpolate the SAME 0.5 m-quantized
        # elevations; only the contraction order differs (one rounding each)
        assert np.abs(hp[vis] - hg[vis]).max() < 1e-6

    def test_undersized_hint_fails_loudly(self):
        # true znear 600 m with the default 100 m hint: near-band samples
        # fall outside the static patch -> counted AND masked, never a
        # garbage elevation
        dem = make_dem(256)
        vz = float(np.asarray(dem)[127:129, 128:130].max()) + 2.0
        p = params_for(dem, 128.3, 127.6, vz, znear=600.0)
        k = k_cross_for(15000.0, CPD, 34.0, n=256)
        hp, dp = self._h(dem, p, k, znear_hint_m=100.0)
        assert dp > 0
        hg, dg = self._h(dem, p, k, znear_hint_m=600.0)
        assert dg == 0
        # masking only LOWERS horizons (bounded failure, window-guard class)
        vis = hg > -1e30
        assert (hp[vis] <= hg[vis] + 1e-6).all()

    def test_oversized_hint_falls_back_to_gathers(self):
        # znear 6 km needs a patch beyond NEAR_PATCH_CAP: march_window must
        # use the gather path (dropped == 0, oracle agreement), not drop
        from horizonator_tpu.render.window import (NEAR_PATCH_CAP,
                                                   near_patch_size)
        assert near_patch_size(6000.0, CPD, 34.0) > NEAR_PATCH_CAP
        dem = make_dem(256)
        vz = float(np.asarray(dem)[127:129, 128:130].max()) + 2.0
        p = params_for(dem, 128.3, 127.6, vz, znear=6000.0)
        k = k_cross_for(15000.0, CPD, 34.0, n=256)
        hp, dp = self._h(dem, p, k, znear_hint_m=6000.0)
        hg, dg = self._h(dem, p, k, znear_hint_m=None)
        assert dp == 0 and dg == 0
        np.testing.assert_array_equal(hp, hg)


class TestAlignedScene:
    """Prebuilt camera-independent crossing tables (window.AlignedScene):
    the kernel DMAs from padded DEM views at 128-aligned lane offsets and
    subtracts the sub-128 start residual from the lane index in-kernel --
    samples must be BITWISE the per-render-build march's, column-rolled by
    the residual, and the resolved (image, ranges) bitwise the unaligned
    render's."""

    def _march(self, dem, p, k, **kw):
        return march_window(dem, p, width=256, k_cross=k,
                            cells_per_deg=CPD, lat_hint_deg=34.0, **kw)

    @staticmethod
    def _compare_rolled(base, al, extra_base=None, extra_al=None):
        from horizonator_tpu.render.crossing import N_NEAR
        t0, t1 = np.asarray(base[0]), np.asarray(al[0])
        assert int(base[2].dropped) == 0 and int(al[2].dropped) == 0
        assert base[2].lane0 is None and al[2].lane0 is not None
        r = np.asarray(al[2].lane0).astype(int)
        kk = t0.shape[1] - N_NEAR
        # near band is untouched by the table alignment
        np.testing.assert_array_equal(t0[:, :N_NEAR], t1[:, :N_NEAR])
        for w in range(t0.shape[0]):
            sl = slice(N_NEAR + r[w], N_NEAR + r[w] + kk)
            np.testing.assert_array_equal(t1[w, sl], t0[w, N_NEAR:],
                                          err_msg=f"column {w} (r={r[w]})")
            # residual-gap lanes carry inert copies of the near-band top
            # (the resolve's refine-bracket fill); tail lanes are empty
            assert (t1[w, N_NEAR:N_NEAR + r[w]] == t1[w, N_NEAR - 1]).all()
            assert (t1[w, N_NEAR + r[w] + kk:] <= -1e30).all()
            if extra_al is not None:
                vis = t0[w, N_NEAR:] > -1e30
                np.testing.assert_array_equal(
                    np.asarray(extra_al)[w, sl][vis],
                    np.asarray(extra_base)[w, N_NEAR:][vis],
                    err_msg=f"tex column {w}")

    def test_bitwise_parity(self):
        from horizonator_tpu.render.window import prepare_aligned_scene
        dem = make_dem(257)
        vz = float(np.asarray(dem)[120:122, 131:133].max()) + 2.0
        p = params_for(dem, 131.3, 120.7, vz, zfar=9000.0)
        k = k_cross_for(9000.0, CPD, 34.0, n=257)
        base = self._march(dem, p, k)
        scene = prepare_aligned_scene(dem, k)
        al = self._march(dem, p, k, scene=scene)
        self._compare_rolled(base, al)

    def test_textured_bitwise_parity(self):
        from horizonator_tpu.render.window import prepare_aligned_scene
        from horizonator_tpu.render.texture import prepare_color_planes
        n = 257
        dem = make_dem(n)
        rng = np.random.default_rng(1)
        cp = prepare_color_planes(jnp.asarray(
            rng.integers(0, 256, (3, 2 * n, 2 * n)).astype(np.float32)))
        vz = float(np.asarray(dem)[120:122, 131:133].max()) + 2.0
        p = params_for(dem, 131.3, 120.7, vz, zfar=9000.0)
        k = k_cross_for(9000.0, CPD, 34.0, n=n)
        base = self._march(dem, p, k, color_planes=cp)
        scene = prepare_aligned_scene(dem, k, color_planes=cp)
        al = self._march(dem, p, k, color_planes=cp, scene=scene)
        self._compare_rolled(base, al, extra_base=base[4], extra_al=al[4])

    def test_hybrid_near_field_bitwise_parity(self):
        """The hybrid exact-near color merge (atlas-patch contraction,
        roll-placed into the aligned path's shifted lanes by direction
        residual) must keep the aligned contract: same rolled-lane colors
        as the unaligned hybrid march -- and it must actually REPLACE the
        near colors (differ from the plain grid2x march)."""
        from horizonator_tpu.render.crossing import N_NEAR
        from horizonator_tpu.render.window import prepare_aligned_scene
        from horizonator_tpu.render.texture import (
            prepare_color_planes, AtlasParams, tile_xy_from_latlon)
        n = 257
        dem = make_dem(n)
        rng = np.random.default_rng(5)
        cp = prepare_color_planes(jnp.asarray(
            rng.integers(0, 256, (3, 2 * n, 2 * n)).astype(np.float32)))
        olon, olat = -118.0, 34.0
        tx, ty = tile_xy_from_latlon(olat + 120.7 / CPD, olon + 131.3 / CPD,
                                     12)
        ap = AtlasParams(olon, olat, tx - 1, ty - 1, 4, 4)
        atlas = jnp.asarray(
            rng.integers(0, 1 << 24, (1024, 1024)).astype(np.int32))
        vz = float(np.asarray(dem)[120:122, 131:133].max()) + 2.0
        p = params_for(dem, 131.3, 120.7, vz, zfar=9000.0)
        k = k_cross_for(9000.0, CPD, 34.0, n=n)
        kw = dict(color_planes=cp, atlas=atlas, atlas_params=ap,
                  exact_near_m=1500.0)
        base = self._march(dem, p, k, **kw)
        scene = prepare_aligned_scene(dem, k, color_planes=cp)
        al = self._march(dem, p, k, scene=scene, **kw)
        self._compare_rolled(base, al, extra_base=base[4], extra_al=al[4])
        plain = self._march(dem, p, k, color_planes=cp)
        t_p, t_h = np.asarray(plain[4]), np.asarray(base[4])
        assert (t_p[:, :N_NEAR + 4] != t_h[:, :N_NEAR + 4]).any()

    def test_render_bitwise_parity(self):
        # the full (image, ranges) contract through render_panorama: d_of
        # consumes dists.lane0, the resolve sees column-rolled rows --
        # output must be bitwise the unaligned render's
        from horizonator_tpu.render.window import prepare_aligned_scene
        dem = make_dem(257)
        vz = float(np.asarray(dem)[120:122, 131:133].max()) + 2.0
        p = params_for(dem, 131.3, 120.7, vz, zfar=9000.0)
        k = k_cross_for(9000.0, CPD, 34.0, n=257)
        img0, rng0 = render_panorama(dem, p, width=256, height=128,
                                     nsteps=k, cells_per_deg=CPD,
                                     sampler="window", lat_hint_deg=34.0)
        scene = prepare_aligned_scene(dem, k)
        img1, rng1 = render_panorama(dem, p, width=256, height=128,
                                     nsteps=k, cells_per_deg=CPD,
                                     sampler="window", lat_hint_deg=34.0,
                                     aligned_scene=scene)
        np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
        np.testing.assert_array_equal(np.asarray(rng0), np.asarray(rng1))

    def test_undersized_scene_raises(self):
        from horizonator_tpu.render.window import prepare_aligned_scene
        dem = make_dem(257)
        vz = float(np.asarray(dem)[120:122, 131:133].max()) + 2.0
        p = params_for(dem, 131.3, 120.7, vz)
        scene = prepare_aligned_scene(dem, 128)   # one TILE_K of budget
        with pytest.raises(ValueError, match="re-prepare"):
            self._march(dem, p, 256, scene=scene)

    def test_banded_grid_ignores_scene(self):
        # region-sharded band grids keep the per-render build: passing a
        # scene must silently fall back (lane0 None), not corrupt output
        from horizonator_tpu.render.window import prepare_aligned_scene
        dem = make_dem(257)
        vz = float(np.asarray(dem)[120:122, 131:133].max()) + 2.0
        p = params_for(dem, 131.3, 120.7, vz, zfar=9000.0)
        k = k_cross_for(9000.0, CPD, 34.0, n=257)
        scene = prepare_aligned_scene(dem, k)
        base = self._march(dem, p, k, j_hi=200)
        al = self._march(dem, p, k, j_hi=200, scene=scene)
        assert al[2].lane0 is None
        np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(al[0]))


def test_far_edge_crossings_not_truncated():
    """Regression: the grid cap on k_kernel must round UP, not down. A
    viewer near the south edge of a 200-cell grid with terrain in the last
    rows: the old (n // 128) * 128 = 128-step cap silently dropped the
    ridge (steps 128..199) with dropped == 0."""
    import jax.numpy as jnp
    n = 200
    dem = np.zeros((n, n), np.float32)
    dem[180:185, :] = 2500.0                    # ridge near the north edge
    dem = jnp.asarray(dem)
    p = params_for(dem, 100.0, 0.5, 30.0, az0=-20.0, az1=20.0, zfar=20000.0)
    k = k_cross_for(20000.0, CPD, 34.0, n=n)
    hc, hw = _horizons(dem, p, 64, k)
    vis_c, vis_w = hc > -1e30, hw > -1e30
    assert (vis_c == vis_w).all()
    assert np.abs(hc[vis_c] - hw[vis_c]).max() < 6e-3
    # the ridge must actually be in the horizon (guards the oracle too)
    assert hc[vis_c].max() > 0.1


@pytest.mark.slow
def test_fuzz_window_vs_crossing_oracle():
    """Randomized differential test: the Pallas window march must agree
    with the gather-based crossing oracle (visibility exactly, tangents to
    the 0.5 m quantization class) over random terrain, viewer placements
    (including grid edges), azimuth windows (including wrap), and clip
    ranges. This is the net that catches silent-masking bug classes like
    the k_kernel round-down (test_far_edge_crossings_not_truncated).

    The trials' per-shape compiles go through the persistent cache like
    everything else: conftest hardens the cache (compile_cache.py --
    ATOMIC entry publishes + zlib). The intermittent segfaults this burst
    of large put/get calls used to trigger were torn reads of entries
    concurrently written by another cache sharer (jax's unlocked
    non-atomic put), first misattributed to the zstandard serializer
    whose C frames sat on the crash stacks. Caching the one-shot shapes
    also cuts the suite's cold-cache wall time.
    """
    _fuzz_trials()


def _fuzz_trials():
    rng = np.random.default_rng(20260818)
    for trial in range(6):
        n = int(rng.integers(150, 320))
        rough = float(rng.uniform(2.0, 40.0))
        dem = make_dem(n, rough=rough)
        d_np = np.asarray(dem)
        # viewers: interior, near an edge, near a corner
        vi = float(rng.uniform(2.0, n - 3.0))
        vj = float(np.choose(trial % 3,
                             [rng.uniform(2.0, n - 3.0),
                              rng.uniform(0.3, 6.0),
                              rng.uniform(n - 7.0, n - 2.0)]))
        vz = float(d_np[int(vj):int(vj) + 2, int(vi):int(vi) + 2].max()) \
            + float(rng.uniform(1.0, 60.0))
        az_c = float(rng.uniform(-360.0, 360.0))
        az_r = float(rng.uniform(4.0, 180.0))
        zfar = float(rng.uniform(3000.0, 25000.0))
        width = int(rng.integers(24, 160))
        p = params_for(dem, vi, vj, vz, az0=az_c - az_r, az1=az_c + az_r,
                       zfar=zfar)
        k = k_cross_for(zfar, CPD, 34.0, n=n)
        hc, hw = _horizons(dem, p, width, k)
        vis_c, vis_w = hc > -1e30, hw > -1e30
        ctx = (f"trial {trial}: n={n} viewer=({vi:.1f},{vj:.1f}) "
               f"az={az_c:.0f}+-{az_r:.0f} zfar={zfar:.0f} w={width}")
        assert (vis_c == vis_w).all(), ctx
        if vis_c.any():
            assert np.abs(hc[vis_c] - hw[vis_c]).max() < 6e-3, ctx


@pytest.mark.slow
@pytest.mark.parametrize("viewer", [(3.4, 128.6), (252.2, 4.3),
                                    (128.0, 252.5)])
def test_textured_render_parity_edge_viewers(viewer):
    """Full textured (image, ranges) aligned-vs-unaligned parity at GRID
    EDGE viewers: the residuals r_d take extreme values there (cbase
    clipping), exercising the gap fill + d_of lane0 + resolve color
    routing end to end. Must be bitwise."""
    from horizonator_tpu.render.window import prepare_aligned_scene
    from horizonator_tpu.render.texture import prepare_color_planes
    n = 257
    dem = make_dem(n)
    rng = np.random.default_rng(2)
    cp = prepare_color_planes(jnp.asarray(
        rng.integers(0, 256, (3, 2 * n, 2 * n)).astype(np.float32)))
    vi, vj = viewer
    d_np = np.asarray(dem)
    vz = float(d_np[int(vj):int(vj) + 2, int(vi):int(vi) + 2].max()) + 2.0
    p = params_for(dem, vi, vj, vz, zfar=7000.0)
    k = k_cross_for(7000.0, CPD, 34.0, n=n)
    kw = dict(width=192, height=96, nsteps=k, cells_per_deg=CPD,
              sampler="window", lat_hint_deg=34.0, textured=True,
              color_planes=cp)
    img0, rng0 = render_panorama(dem, p, **kw)
    scene = prepare_aligned_scene(dem, k, color_planes=cp)
    img1, rng1 = render_panorama(dem, p, aligned_scene=scene, **kw)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(rng0), np.asarray(rng1))
