"""Split the render tail: arctan+rowmap / resolve kernel / image assembly."""
import sys; sys.path.insert(0, ".")
import math, functools
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
tanel, run_max, dists, az = jax.block_until_ready(
    march_window(dem, p, width=W, k_cross=k, cells_per_deg=1200, lat_hint_deg=LAT, scene=al))
print("tanel", tanel.shape, file=sys.stderr)

def t(name, fn, *args, pidx=0):
    def perturb(a, i):
        a = list(a)
        a[pidx] = a[pidx] + i * 1e-9
        return tuple(a)
    sec = device_time_chain(fn, *args, perturb=perturb, reps=48, iters=6)
    print(f"{name}: {sec*1e3:.3f} ms", file=sys.stderr)

c = 1.2732395
# 1. arctan + row map alone (force full materialization via sum of y*y)
t("arctan+rowmap", lambda tn: jnp.sum(jnp.square(
    (1.0 - jnp.arctan(tn) * c) * (H * 0.5) - 0.5)), tanel)

# 2. resolve kernel alone on precomputed rows
y_k = jax.block_until_ready((1.0 - jnp.arctan(tanel) * c) * (H * 0.5) - 0.5)
def res(y):
    idx, alpha, ok = resolve_window(y, H, monotone=False)
    return jnp.sum(idx) + jnp.sum(alpha) + jnp.sum(ok)
t("resolve kernel", res, y_k)

# 3. assembly alone: idx/alpha/ok -> ranges + image
idx, alpha, ok = jax.block_until_ready(resolve_window(y_k, H, monotone=False))
ktotal = tanel.shape[1]
el = jnp.asarray(np.linspace(0.4, -0.4, H), jnp.float32)
def assemble(alpha, idx, ok):
    sky = idx >= ktotal
    idxc = jnp.minimum(idx, ktotal - 1)
    d_hit = dists.d_of(idxc)
    okr = ok & (idxc > 0) & ~sky
    d_prev = dists.d_of(jnp.maximum(idxc - 1, 0))
    d_hit = jnp.where(okr, d_prev + alpha * (d_hit - d_prev), d_hit)
    d_hit = jnp.clip(d_hit, p.znear, p.zfar)
    ranges_wh = d_hit / jnp.cos(el)[None, :]
    ranges_wh = jnp.where(sky, -1.0, ranges_wh)
    red = jnp.clip((d_hit - p.znear_color) / (p.zfar_color - p.znear_color), 0.0, 1.0)
    r8 = jnp.round(red * 255.0).astype(jnp.uint8)
    zeros = jnp.zeros_like(r8)
    sky_u8 = sky.astype(jnp.uint8)
    b = sky_u8 * 255
    g = zeros
    r = jnp.where(sky, 0, r8).astype(jnp.uint8)
    image_wh3 = jnp.stack([b, g, r], axis=-1)
    return jnp.sum(ranges_wh) + jnp.sum(image_wh3[..., 2].astype(jnp.float32))
t("assembly (d_of/refine/ranges/image)", assemble, alpha, idx, ok)
