import sys; sys.path.insert(0, ".")
import math, functools
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from horizonator_tpu.render import RenderParams
from horizonator_tpu.render.window import march_window
from horizonator_tpu.render.resolve_window import resolve_window
from horizonator_tpu.render.crossing import k_cross_for
from horizonator_tpu.render.texture import prepare_color_planes
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
cp2 = jax.tree.map(jax.device_put, prepare_color_planes(jnp.asarray(
    rng.integers(0,255,(3,2*n,2*n)).astype(np.float32))))

mw = functools.partial(march_window, width=4096, k_cross=k, cells_per_deg=1200, lat_hint_deg=LAT)

def perturb(a, i):
    *rest, pp = a
    return (*rest, pp._replace(viewer_cell_i=pp.viewer_cell_i + i))
def t(name, fn, *args):
    sec = device_time_chain(fn, *args, perturb=perturb, reps=48, iters=6)
    print(f"{name}: {sec*1e3:.3f} ms", file=sys.stderr)

t("march tanel-only", lambda d, c, pp: mw(d, pp, color_planes=c)[0].sum(), dem, cp2, p)
t("march tanel+tex", lambda d, c, pp: (lambda o: o[0].sum() + o[4].sum())(mw(d, pp, color_planes=c)), dem, cp2, p)

def march_resolve(d, c, pp):
    tanel, _, dists, az, tex = mw(d, pp, color_planes=c)
    y = (1.0 - jnp.arctan(tanel) * 1.0) * 512.0 - 0.5
    idx, alpha, ok, tex_hw = resolve_window(y, 1024, tex=tex, monotone=False)
    return idx.sum() + tex_hw.sum()
t("march+arctan+resolve", march_resolve, dem, cp2, p)

mw0 = functools.partial(march_window, width=4096, k_cross=k, cells_per_deg=1200, lat_hint_deg=LAT, n_near=0)
t("march tanel+tex NO near band", lambda d, c, pp: (lambda o: o[0].sum() + o[4].sum())(mw0(d, pp, color_planes=c)), dem, cp2, p)
t("march tex-only", lambda d, c, pp: mw(d, pp, color_planes=c)[4].sum(), dem, cp2, p)
