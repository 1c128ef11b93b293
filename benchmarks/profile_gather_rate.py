import sys; sys.path.insert(0, ".")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
import jax.numpy as jnp
from horizonator_tpu.profiling import device_time_chain

rng = np.random.default_rng(0)
idx = jax.device_put(jnp.asarray(rng.integers(0, 10_000_000, size=(16384,)).astype(np.int32)))

def t(name, fn, *args):
    def perturb(a, i): return (a[0], a[1] + jnp.asarray(i, jnp.int32))
    sec = device_time_chain(lambda src, ix: fn(src, ix), *args, perturb=perturb, reps=16, iters=4)
    print(f"{name}: {sec*1e3:.3f} ms", file=sys.stderr)

for sz, dt in [(10_000_000, np.float32), (92_000_000, np.float32),
               (92_000_000, np.int32), (46_000_000, np.float32)]:
    src = jax.device_put(jnp.asarray(np.zeros(sz, dt)))
    name = f"take 16k from {sz/1e6:.0f}M {np.dtype(dt).name}"
    t(name, lambda s, ix: jnp.take(s, ix % s.shape[0]).astype(jnp.float32).sum(), src, idx)
src = jax.device_put(jnp.asarray(np.zeros(92_000_000, np.float32)).astype(jnp.bfloat16))
t("take 16k from 92M bf16", lambda s, ix: jnp.take(s, ix % s.shape[0]).astype(jnp.float32).sum(), src, idx)
# 12 takes like the near band
src = jax.device_put(jnp.asarray(np.zeros(92_000_000, np.float32)).astype(jnp.bfloat16))
def twelve(s, ix):
    acc = 0.0
    for o in range(12):
        acc = acc + jnp.take(s, (ix + o) % s.shape[0]).astype(jnp.float32).sum()
    return acc
t("12x take 16k from 92M bf16", twelve, src, idx)
