import sys; sys.path.insert(0, ".")
import math, functools
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from horizonator_tpu.render import RenderParams
from horizonator_tpu.render.window import march_window, _build_tables_multi
from horizonator_tpu.render.crossing import k_cross_for
from horizonator_tpu.profiling import device_time_chain

n = 3400
rng = np.random.default_rng(7)
jj, ii = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
z = (600.0 + 500.0*np.sin(ii/223.0)*np.cos(jj/181.0) + 30.0*rng.standard_normal((n,n),dtype=np.float32))
dem = jax.device_put(jnp.asarray(np.maximum(z,0.0), jnp.float32))
f = jnp.float32
LAT = 34.3
p = RenderParams(f(n/2), f(n/2), f(900.0), f(math.cos(math.radians(LAT))),
                 f(-math.pi), f(math.pi), f(100.0), f(40000.0), f(100.0), f(40000.0))
k = k_cross_for(40000.0, 1200, LAT, n=n)
def perturb(a, i):
    *rest, pp = a
    return (*rest, pp._replace(viewer_cell_i=pp.viewer_cell_i + i))
def t(name, fn, *args):
    sec = device_time_chain(fn, *args, perturb=perturb, reps=48, iters=6)
    print(f"{name}: {sec*1e3:.3f} ms", file=sys.stderr)

mw = functools.partial(march_window, width=4096, k_cross=k, cells_per_deg=1200, lat_hint_deg=LAT)
t("march full", lambda d, pp: mw(d, pp)[0].sum(), dem, p)
t("march n_near=0 (no near band)", lambda d, pp: march_window(d, pp, width=4096, k_cross=k, cells_per_deg=1200, lat_hint_deg=LAT, n_near=0)[0].sum(), dem, p)
kk = max(128, min(k, (n//128)*128)); kk = -(-kk//128)*128
t("elev table build", lambda d, pp: _build_tables_multi(d[None], pp, kk)[:,0].sum(), dem, p)

# XLA-side prep alone (origins/actives/posq over (W, K)): approximate by the
# full march minus the kernel -- measured here as the table build + the
# pos/axis/valid min-max reductions, reconstructed inline
from horizonator_tpu.render.crossing import crossing_geometry
from horizonator_tpu.render.window import _dir_id, pick_tile_w, TILE_K, window_size

def prep_only(d, pp):
    geo = crossing_geometry(pp, width=4096, cells_per_deg=1200)
    dirid = _dir_id(geo)
    m = jnp.arange(kk, dtype=jnp.float32)[None, :]
    pos = geo.a[:, None] + m * geo.t[:, None]
    axis_m = geo.axis0.astype(jnp.float32)[:, None] + m * geo.sign.astype(jnp.float32)[:, None]
    d_all = (m + geo.e[:, None]) * geo.scale[:, None]
    valid = ((axis_m >= 0) & (axis_m <= n - 1) & (pos >= 0) & (pos <= n - 1)
             & (d_all >= pp.znear) & (d_all <= pp.zfar))
    posq = jnp.where(valid, pos, jnp.inf)
    tile_w = pick_tile_w(4096)
    n_wt, n_kt = 4096 // tile_w, kk // TILE_K
    post = posq.reshape(n_wt, tile_w, n_kt, TILE_K).transpose(0, 2, 1, 3)
    dir_t = jnp.broadcast_to(dirid.reshape(n_wt, 1, tile_w, 1), post.shape)
    s = jnp.float32(0)
    for d4 in range(4):
        sel = jnp.where(dir_t == d4, post, jnp.inf)
        mn = jnp.min(sel, axis=(2, 3))
        mx = jnp.max(jnp.where(jnp.isfinite(sel), sel, -jnp.inf), axis=(2, 3))
        s = s + jnp.sum(jnp.where(jnp.isfinite(mn), mn, 0.0)) + jnp.sum(jnp.where(jnp.isfinite(mx), mx, 0.0))
    return s
t("origins/actives prep only", prep_only, dem, p)

# aligned-scene march (prebuilt tables): full march minus the table builds
from horizonator_tpu.render.window import prepare_aligned_scene
al = prepare_aligned_scene(dem, k)
jax.block_until_ready(al.elev)
t("march aligned (prebuilt tables)",
  lambda d, pp: mw(d, pp, scene=al)[0].sum(), dem, p)

# resolve + arctan tail alone: reuse one march's tanel as input
from horizonator_tpu.render.raymarch import resolve_to_image
tanel, run_max, dists, az = jax.block_until_ready(mw(dem, p, scene=al))

def tail(tn, rm, pp):
    img, rngs = resolve_to_image(tn, rm, dists.d_of, az, pp, width=4096,
                                 height=1024, cells_per_deg=1200)
    return jnp.sum(rngs) + jnp.sum(img[..., 2].astype(jnp.float32))

def perturb_first(a, i):
    tn, rm, pp = a
    return (tn + i * 1e-9, rm, pp)
sec = device_time_chain(tail, tanel, run_max, p, perturb=perturb_first,
                        reps=48, iters=6)
print(f"resolve tail (arctan+kernel+assembly): {sec*1e3:.3f} ms",
      file=sys.stderr)

# arctan+rowmap alone
def rowmap(tn, pp):
    el = jnp.arctan(tn)
    y = (1.0 - el * 1.2732395) * 512.0 - 0.5
    return jnp.sum(y)
sec = device_time_chain(rowmap, tanel, p, perturb=lambda a, i: (a[0] + i*1e-9, a[1]),
                        reps=48, iters=6)
print(f"arctan+rowmap alone: {sec*1e3:.3f} ms", file=sys.stderr)
