import sys; sys.path.insert(0, ".")
import math, functools
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from horizonator_tpu.profiling import device_time_chain

W, K, H = 4096, 580, 1024
rng = np.random.default_rng(0)
y = np.cumsum(np.abs(rng.normal(size=(W, K)).astype(np.float32)), axis=1)[:, ::-1]  # decreasing rows
y = jnp.asarray(1024.0 - y / y.max() * 900.0)
tex = jnp.asarray(rng.integers(0, 1 << 24, size=(W, K)).astype(np.int32))
tanel = jnp.asarray(rng.normal(size=(W, K)).astype(np.float32) * 0.1)

def perturb(a, i):
    return tuple(x + (i * 0 if x.dtype == jnp.int32 else i * 1e-6) for x in a)

def t(name, fn, *args):
    sec = device_time_chain(fn, *args, perturb=perturb, reps=8, iters=4)
    print(f"{name}: {sec*1e3:.3f} ms", file=sys.stderr)

from horizonator_tpu.render.resolve_window import resolve_window
t("arctan (W,K)", lambda a: jnp.arctan(a).sum(), tanel)
t("resolve untextured", lambda yy: resolve_window(yy, H, monotone=False)[0].sum(), y)
t("resolve textured", lambda yy, tx: resolve_window(yy, H, tex=tx, monotone=False)[3].sum(), y, tex)
