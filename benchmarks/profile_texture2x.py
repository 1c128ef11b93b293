import sys; sys.path.insert(0, ".")
import math, sys, functools
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from horizonator_tpu.render import RenderParams
from horizonator_tpu.render.window import (march_window,
                                           _build_color_tables_2x,
                                           _build_tables_multi)
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
c1 = jax.device_put(jnp.asarray(rng.integers(0,255,(3,n,n)).astype(np.float32)))
c2 = jax.device_put(jnp.asarray(rng.integers(0,255,(3,2*n,2*n)).astype(np.float32)))

def perturb(a, i):
    *rest, pp = a
    return (*rest, pp._replace(viewer_cell_i=pp.viewer_cell_i + i))

def t(name, fn, *args):
    sec = device_time_chain(fn, *args, perturb=perturb, reps=48, iters=6)
    print(f"{name}: {sec*1e3:.3f} ms", file=sys.stderr)

mw = functools.partial(march_window, width=4096, k_cross=k, cells_per_deg=1200, lat_hint_deg=LAT)
t("march untextured", lambda d, pp: mw(d, pp)[0].sum(), dem, p)
t("march textured s1", lambda d, c, pp: mw(d, pp, color_planes=c)[0].sum() , dem, c1, p)
t("march textured s2", lambda d, c, pp: mw(d, pp, color_planes=c)[0].sum(), dem, c2, p)
kk = max(128, min(k, (n//128)*128)); kk = -(-kk//128)*128
from horizonator_tpu.render.texture import prepare_color_planes
cp2 = jax.tree.map(jax.device_put, prepare_color_planes(c2))
t("march textured s2 prestrided", lambda d, c, pp: mw(d, pp, color_planes=c)[0].sum(), dem, cp2, p)
t("color tables 2x build (prestrided bf16)", lambda c, pp: _build_color_tables_2x(c, pp, kk, n).astype(jnp.float32).sum(), cp2, p)
from horizonator_tpu.render.raymarch import render_panorama
import functools as ft
rp = ft.partial(render_panorama, width=4096, height=1024, nsteps=k, cells_per_deg=1200, sampler="window", lat_hint_deg=LAT)
t("frame untextured", lambda d, pp: rp(d, pp)[1].sum(), dem, p)
t("frame textured s2 prestrided", lambda d, c, pp: rp(d, pp, textured=True, color_planes=c)[1].sum(), dem, cp2, p)
t("elev+1x tables build", lambda d, c, pp: _build_tables_multi(jnp.concatenate([d[None], c]), pp, kk).sum(), dem, c1, p)
