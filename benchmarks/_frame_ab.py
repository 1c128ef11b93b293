import sys; sys.path.insert(0, ".")
import math, functools
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
import jax.numpy as jnp
from horizonator_tpu.render import RenderParams
from horizonator_tpu.render.raymarch import render_panorama
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
rp = functools.partial(render_panorama, width=4096, height=1024, nsteps=k, cells_per_deg=1200, sampler="window", lat_hint_deg=LAT)
for rep in range(3):
    sec = device_time_chain(lambda d, pp: rp(d, pp)[1].sum(), dem, p, perturb=perturb, reps=16, iters=5)
    print(f"frame untextured rep{rep}: {sec*1e3:.3f} ms", file=sys.stderr)
