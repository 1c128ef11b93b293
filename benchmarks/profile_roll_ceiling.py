"""Per-stage ceiling microbench for the fused resolve kernel (VERDICT r3).

The textured-resolve-is-structural argument (DESIGN.md section 4) rests on
the claim that the resolve kernel already runs near the hardware's
per-stage ceiling, so its cost is stage COUNT, not implementation slack.
This measures that ceiling in isolation: S synthetic stages of
lane-axis ``pltpu.roll`` + ALU over a VMEM-resident block shaped exactly
like the resolve's working set (64-column blocks, m = kp + hp int32
lanes), with per-stage varying shifts so nothing folds.

Two stage flavors:
- ``minmax``: one roll + min + max per stage = the bitonic-merge /
  bracket-scan regime (the untextured pipeline);
- ``kv``: two arrays (key + color), two rolls + compare + two selects =
  the textured merge's compare-exchange regime.

Prints G elem-stages/s for each (elem = one lane of one row of ONE array;
the kv flavor therefore counts 2x the elements per stage), plus the
implied floor for the real kernels' stage counts, to compare against the
measured resolve times (CLAUDE.md: ~0.80 ms untextured, ~1.4 ms textured
at the 4096x1024 headline).

Run on the TPU:  python benchmarks/profile_roll_ceiling.py [m] [stages]
"""

import functools
import math
import sys
import time

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_minmax(m, stages, tile_w):
    """One bitonic compare-exchange stage, exactly the real merge's shape:
    fwd + bwd rolls of the SAME array, then a lane-mask select between the
    min (low partner) and max (high partner) -- 2 rolls + min + max +
    mask-compare + select per element per stage."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_w, m), 1)
        for s in range(stages):
            d = 1 << (s % 10)
            fwd = pltpu.roll(x, shift=(m - d % m) % m, axis=1)
            bwd = pltpu.roll(x, shift=d % m, axis=1)
            low = (lane & d) == 0
            x = jnp.where(low, jnp.minimum(x, fwd), jnp.maximum(x, bwd))
        o_ref[:] = x

    return kernel


def make_kv(m, stages, tile_w):
    """The textured merge's stage: the same compare-exchange on the key
    array PLUS a value array that rides the identical routing -- 4 rolls +
    the key compare + 2 selects (the value's select reuses the key's
    comparison, as the real kernel's compare-exchange does)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(k_ref, v_ref, ok_ref, ov_ref):
        k = k_ref[:]
        v = v_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_w, m), 1)
        for s in range(stages):
            d = 1 << (s % 10)
            fk = pltpu.roll(k, shift=(m - d % m) % m, axis=1)
            bk = pltpu.roll(k, shift=d % m, axis=1)
            fv = pltpu.roll(v, shift=(m - d % m) % m, axis=1)
            bv = pltpu.roll(v, shift=d % m, axis=1)
            low = (lane & d) == 0
            # selects stay on int32 (Mosaic rejects bool-valued where
            # operands: "Unsupported target bitwidth for truncation")
            k_other = jnp.where(low, fk, bk)
            v_other = jnp.where(low, fv, bv)
            k_new = jnp.where(low, jnp.minimum(k, k_other),
                              jnp.maximum(k, k_other))
            v = jnp.where(k_new != k, v_other, v)
            k = k_new
        ok_ref[:] = k
        ov_ref[:] = v

    return kernel


def run(flavor, W, m, stages, tile_w=64):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from horizonator_tpu.profiling import device_time_chain, measure_rtt

    interpret = jax.default_backend() == "cpu"
    nb = W // tile_w
    spec = pl.BlockSpec((tile_w, m), lambda b: (b, 0))
    if flavor == "minmax":
        kern = make_minmax(m, stages, tile_w)
        f = pl.pallas_call(
            kern, grid=(nb,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((W, m), jnp.int32),
            interpret=interpret)
        arrs = 1
        call = lambda x: f(x)
    else:
        kern = make_kv(m, stages, tile_w)
        f = pl.pallas_call(
            kern, grid=(nb,), in_specs=[spec, spec],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((W, m), jnp.int32),
                       jax.ShapeDtypeStruct((W, m), jnp.int32)),
            interpret=interpret)
        arrs = 2
        call = lambda x: f(x, x + 1)

    x = jnp.arange(W * m, dtype=jnp.int32).reshape(W, m) % (1 << 20)
    rtt = measure_rtt()
    sec = device_time_chain(call, x, perturb=lambda a, i:
                            (a[0] + i.astype(jnp.int32),), reps=16,
                            iters=5, rtt=rtt)
    eps = W * m * stages * arrs / sec
    log(f"{flavor:7s} W={W} m={m} S={stages}: {sec * 1e3:.3f} ms "
        f"-> {eps / 1e9:.0f} G elem-stages/s")
    return eps


def main():
    import jax
    from horizonator_tpu.compile_cache import harden_cache
    harden_cache()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"device: {jax.devices()[0]}")

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1664
    stages = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    W = 4096
    e1 = run("minmax", W, m, stages)
    e2 = run("kv", W, m, stages)
    # headline resolve regime: ~45 logical stages at m lanes (stages 2-7),
    # router tail widening toward n2 ignored here (9 of 11 run at m)
    for name, eps, nstage, narr in (("untextured", e1, 45, 1),
                                    ("textured", e2, 45, 2)):
        floor_ms = W * m * nstage * narr / eps * 1e3
        log(f"implied {name} resolve floor at {nstage} stages: "
            f"{floor_ms:.3f} ms")


if __name__ == "__main__":
    main()
