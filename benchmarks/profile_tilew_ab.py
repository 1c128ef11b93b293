"""A/B: resolve tile_w 64 vs 128/256, march tile_w 64 vs 128 (headline shape)."""
import sys; sys.path.insert(0, ".")
import math
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from horizonator_tpu.render import RenderParams
from horizonator_tpu.render.window import march_window, prepare_aligned_scene
from horizonator_tpu.render.crossing import k_cross_for
from horizonator_tpu.render.resolve_window import resolve_window
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
W, H = 4096, 1024
al = prepare_aligned_scene(dem, k)

def t(name, fn, *args, pidx=0):
    def perturb(a, i):
        a = list(a); a[pidx] = a[pidx] + i * 1e-9
        return tuple(a)
    sec = device_time_chain(fn, *args, perturb=perturb, reps=48, iters=6)
    print(f"{name}: {sec*1e3:.3f} ms", file=sys.stderr)

tanel, run_max, dists, az = jax.block_until_ready(
    march_window(dem, p, width=W, k_cross=k, cells_per_deg=1200, lat_hint_deg=LAT, scene=al))
c = 1.2732395
y_k = jax.block_until_ready((1.0 - jnp.arctan(tanel) * c) * (H * 0.5) - 0.5)
print("y_k", y_k.shape, file=sys.stderr)
for tw in (32, 64, 128, 256):
    def res(y, tw=tw):
        idx, alpha, ok = resolve_window(y, H, monotone=False, tile_w=tw)
        return jnp.sum(idx) + jnp.sum(alpha) + jnp.sum(ok)
    t(f"resolve tile_w={tw}", res, y_k)

def perturbp(a, i):
    *rest, pp = a
    return (*rest, pp._replace(viewer_cell_i=pp.viewer_cell_i + i))
for tw in (64, 128):
    def mfn(dem, al, pp, tw=tw):
        return march_window(dem, pp, width=W, k_cross=k, cells_per_deg=1200,
                            lat_hint_deg=LAT, scene=al, tile_w=tw)[0].sum()
    sec = device_time_chain(mfn, dem, al, p, perturb=perturbp, reps=48, iters=6)
    print(f"march tile_w={tw}: {sec*1e3:.3f} ms", file=sys.stderr)
