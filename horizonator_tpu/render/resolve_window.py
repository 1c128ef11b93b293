"""Pallas TPU kernel for the resolve: the whole first-crossing search in VMEM.

The resolve (raymarch._resolve_rows) is ~45 shuffle stages over (W, K+H)
int32 arrays -- a bitonic valley merge, two bracket scans, and a butterfly
unsort. In XLA every few stages round-trip HBM: measured ~1.9 ms at the
4096x1024 headline for ~0.1 ms of ideal traffic, and a VMEM-resident
roll+minmax stage measures ~560 G elem-stages/s (see
benchmarks/profile_resolve.py + git history), putting the fused cost at
~0.9 ms. This kernel runs the complete pipeline per 64-column block with
every intermediate in VMEM:

  1. quantize horizon rows to 1/256 px int keys (samples: LSB 0);
  2. (optionally) running-min over the step axis = run_max in row space;
  3. merge with the implicit threshold keys (rows 0..H-1, LSB 1) by
     Batcher's bitonic-valley merge -- log2(N) roll/min/max stages;
  4. brackets by forward-cummax / reverse-cummin shift scans; idx and the
     threshold's own row fall out of its key (rank = key >> 9);
  5. pack (rank | idx | alpha | ok) into one int32 and self-route every
     threshold to its pixel row with the LSB-first inverse butterfly
     (dense rank destinations -- the proven Nassimi-Sahni regime).

Textured renders additionally carry each sample's packed 0xRRGGBB color
through the merge (key-value compare-exchange), deliver it to thresholds
with a forward fill (the sample immediately preceding a threshold in
merged order IS its first-crossing sample), and route it alongside the
packed result. The running min carries the ARGMIN's color (ties -> the
earlier sample), so every plateau member holds the true first-crossing
sample's color and equal-key tie order in the merge cannot deliver an
occluded sample's color.

Output decode matches raymarch._resolve_rows' packed branch (idx/ok
bit-identical; alpha equal up to the two paths' spare-bit quantization
budgets), so the kernel and the XLA resolve are interchangeable;
tests/test_resolve.py asserts equality and the TPU smoke test compares
Mosaic against the interpreter bitwise on the real chip.

Mosaic notes (CLAUDE.md): lane-axis shuffles use pltpu.roll with positive
static shifts only (shift n-s for a left roll); scan stages mask the
wrapped lanes every stage (values at the array ends are not scan
identities after stage 1); lane padding of the sample axis must go on the
LEFT (the merge needs the valley shape) with threshold parity (the scans
must skip pads); the row axis pads to a 128-multiple with inert extra
bottom thresholds, so any image height is exact.

Lane-count economics: stages 2-4 and 6-7 run at m = kp + hp physical
lanes (a 128-multiple), NOT the power-of-two n2 -- the pow-2 merge
network is evaluated with lanes [m, n2) virtual: they hold INT_MAX at
every stage (each compare leaves the max at the higher index), so a low
lane whose partner is virtual is simply left unchanged and the pad region
needs no storage, rolls, or compares. The butterfly router (stage 8) is
the one part that outgrows m -- a packet's mid-route lane interleaves its
own high bits with its destination's low bits -- but only progressively:
stage bi needs ((m-1) | (2^{bi+1}-1)) + 1 lanes, so the arrays widen
toward n2 only over the last stages (at the 4096x1024 headline 9 of 11
router stages run at m; at the 1920x480 fly-through shape, 7 of 11).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raymarch import _ROWQ_BITS

TILE_W = 64
_BIG = 2 ** 30
# alpha (refine fraction) bit budget: capped so the quantum is the same
# for every K that fits the budget (the headline's natural budget is 10)
_A_CAP = 10


def _plan(k: int, height: int):
    """(kp, hp, hb, kb, a_bits, n2, m) for the packed layout. The row axis
    is padded to a 128-multiple hp: the extra bottom thresholds sort after
    every real one, count no samples anyone else would, and are sliced
    off -- so any image height is exact. a_bits is CAPPED at _A_CAP so the
    alpha quantum is independent of K whenever the bit budget allows:
    without the cap, K landing in a different kb bucket (e.g. the aligned
    scene's +TILE_K lanes vs the per-render build) changes refined ranges
    by up to one alpha quantum, breaking aligned-vs-unaligned bitwise
    range parity.

    m = kp + hp is the PHYSICAL merged-lane count (a 128-multiple): the
    merge, bracket scans and fill run at m lanes, virtually padded to the
    power-of-two n2 by INT_MAX tail lanes that provably never move (see
    the stage notes in the module docstring); the butterfly router widens
    toward n2 progressively, one 128-lane granule at a time as its
    stage-bi packet-lane bound ((m-1) | (2^{bi+1}-1)) first exceeds the
    current width."""
    kp = -(-k // 128) * 128
    hp = max(-(-height // 128) * 128, 128)
    hb = max((hp - 1).bit_length(), 1)
    kb = max(kp.bit_length(), 1)
    a_bits = min(31 - hb - kb - 1, _A_CAP)
    m = kp + hp
    n2 = 1 << (m - 1).bit_length()
    return kp, hp, hb, kb, a_bits, n2, m


# The kernel holds ~6 live (TILE_W, n2) int32 buffers (keys, lane iota,
# roll temporaries, plus the textured payload); v5e VMEM is ~16 MB/core, so
# n2 is capped at 4096 (~6.3 MB live) -- beyond that Mosaic compilation can
# fail at render time. Oversized K/H (e.g. a user-forced huge --nsteps)
# falls back to the XLA resolve instead of crashing in the compiler.
_N2_MAX = 4096


def resolve_fits(k: int, height: int) -> bool:
    plan = _plan(k, height)
    return plan[4] >= 5 and plan[5] <= _N2_MAX


def _resolve_kernel(y_ref, *rest, kp, k_real, h, n2, m, kb, a_bits, monotone,
                    textured):
    if textured:
        tex_ref, out_ref, outtex_ref = rest
    else:
        (out_ref,) = rest
        tex_ref = outtex_ref = None
    tw = y_ref.shape[0]
    big = jnp.int32(_BIG)

    # 1. quantize rows (identical clips to _resolve_rows)
    yq = jnp.clip(jnp.round(y_ref[:] * float(1 << _ROWQ_BITS)),
                  -2.0 ** 30, 2.0 ** 30)
    yq = jnp.clip(yq.astype(jnp.int32), -(_BIG - 1), _BIG - 1)

    # 2. running min over k (= run_max in row space; skipped when the
    # caller already fed monotone rows). Lane padding is on the LEFT
    # (callers pad with +huge rows): the sample segment must stay
    # non-increasing for the valley merge below, and leading maximal pads
    # are also the running min's identity. Textured: the scan carries the
    # ARGMIN's color (ties -> the earlier sample = the true first
    # crossing), so every run-min plateau member holds the WINNING
    # sample's color -- without this, plateau members share one quantized
    # key and the merge's arbitrary tie order can hand a pixel an
    # OCCLUDED sample's color (found by review; regression-tested).
    texk = tex_ref[:] if textured else None
    if not monotone:
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (tw, kp), 1)
        d = 1
        while d < kp:
            r = pltpu.roll(yq, shift=d, axis=1)
            mask = lane_k >= d
            if textured:
                rt = pltpu.roll(texk, shift=d, axis=1)
                texk = jnp.where(mask & (r <= yq), rt, texk)
            yq = jnp.where(mask, jnp.minimum(yq, r), yq)
            d <<= 1

    # 3. merged valley: [samples desc | thresholds asc | pads MAX]
    key_s = yq << 1
    if kp != k_real:
        # leading pad lanes get threshold parity (key 2^31-1, like the
        # tail pads): the bracket scans skip them -- as real samples they
        # would fake a bracketing value for top thresholds -- and their
        # huge rank keeps them off the router
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (tw, kp), 1)
        key_s = jnp.where(lane_k >= kp - k_real, key_s, key_s | 1)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (tw, h), 1)
    key_t = (lane_t << (_ROWQ_BITS + 1)) | 1
    parts = [key_s, key_t]
    pad_cnt = m - kp - h
    if pad_cnt:
        # pads are threshold-parity (odd) so the bracket scans skip them
        # and their huge rank routes them to the sentinel
        parts.append(jnp.full((tw, pad_cnt), jnp.int32(2 ** 31 - 1),
                              jnp.int32))
    v = jnp.concatenate(parts, axis=1)
    if textured:
        texm = jnp.concatenate(
            [texk, jnp.zeros((tw, m - kp), jnp.int32)], axis=1)
    else:
        texm = None

    lane = jax.lax.broadcasted_iota(jnp.int32, (tw, m), 1)

    # 4. bitonic merge of the valley at m physical lanes (key-value when
    # carrying colors). The network is the pow-2 n2 XOR-partner merge with
    # lanes [m, n2) VIRTUAL: they hold INT_MAX forever (max with the top
    # lane of a compare keeps INT_MAX there; min with a lower lane returns
    # the real key), so a physical low lane whose partner lane+s >= m is
    # simply left unchanged -- no physical storage or rolls over the pad
    # region. Only low lanes can have virtual partners (a high lane's
    # partner lane-s is physical because lane & s != 0 implies lane >= s).
    s = n2 // 2
    while s >= 1:
        fwd = pltpu.roll(v, shift=(m - s) % m, axis=1)  # v[i+s] -> i
        bwd = pltpu.roll(v, shift=s % m, axis=1)        # v[i-s] -> i
        low = (lane & s) == 0
        # a LOW lane whose partner lane+s is virtual stays frozen (its
        # partner holds INT_MAX: min is a no-op); a high lane's partner
        # lane-s is always physical (lane & s != 0 implies lane >= s)
        frozen = low & (lane + s >= m)
        part = jnp.where(low, fwd, bwd)
        if textured:
            # ties keep self on both ends, so (key, tex) pairs stay paired
            # (boolean algebra, not where: Mosaic cannot select between
            # i1 vectors -- "Unsupported target bitwidth for truncation")
            took = (~frozen) & ((low & (part < v)) | (~low & (part > v)))
            tpart = jnp.where(low, pltpu.roll(texm, shift=(m - s) % m,
                                              axis=1),
                              pltpu.roll(texm, shift=s % m, axis=1))
            texm = jnp.where(took, tpart, texm)
        cex = jnp.where(low, jnp.minimum(v, part), jnp.maximum(v, part))
        v = jnp.where(frozen, v, cex)
        s //= 2

    # 5. rank (= a threshold's destination row, read off its own key),
    # idx by position arithmetic
    is_thr = (v & 1) == 1
    skey = v >> 1
    rank = skey >> _ROWQ_BITS
    idxv = k_real - lane + rank

    # 6. bracket scans; wrapped lanes masked every stage (after stage 1
    # the array ends hold running values, not scan identities)
    x = jnp.where(is_thr, -big, skey)
    d = 1
    while d < m:
        r = pltpu.roll(x, shift=d, axis=1)
        x = jnp.maximum(x, jnp.where(lane >= d, r, -big))
        d <<= 1
    y_cur = x
    x = jnp.where(is_thr, big, skey)
    d = 1
    while d < m:
        r = pltpu.roll(x, shift=m - d, axis=1)
        x = jnp.minimum(x, jnp.where(lane < m - d, r, big))
        d <<= 1
    y_prev = x

    if textured:
        # deliver each threshold the nearest sample's color at or before
        # it in merged order (= its first-crossing sample, up to adjacent
        # equal-key ties): forward fill of sample colors
        t = jnp.where(is_thr, jnp.int32(-1), texm)
        d = 1
        while d < m:
            r = pltpu.roll(t, shift=d, axis=1)
            t = jnp.where(t < 0, jnp.where(lane >= d, r, jnp.int32(-1)), t)
            d <<= 1
        tex_thr = jnp.maximum(t, 0)

    # 7. alpha + single-int32 packing (y_thr = skey at thresholds)
    denom = (y_prev - y_cur).astype(jnp.float32)
    okv = (y_cur > -big) & (y_prev < big) & (denom > 0)
    alpha = jnp.clip((y_prev - skey).astype(jnp.float32)
                     / jnp.where(denom > 0, denom, 1.0), 0.0, 1.0)
    amax = (1 << a_bits) - 1
    aq = jnp.round(alpha * amax).astype(jnp.int32)
    idxc = jnp.clip(idxv, 0, (1 << kb) - 1)
    dshift = kb + a_bits + 1
    packed = jnp.where(is_thr & (rank < h),
                       (rank << dshift) | (idxc << (a_bits + 1))
                       | (aq << 1) | okv.astype(jnp.int32),
                       jnp.int32(-1))

    # 8. LSB-first inverse-butterfly concentration to dense rank dests.
    # The router is the one part that outgrows m (a packet's mid-route
    # lane interleaves its own high bits with its destination's low bits),
    # but only PROGRESSIVELY: before stage bi a real packet sits at
    # lane = (own & ~(2^bi-1)) | (dest & (2^bi-1)) <= (m-1) | (2^bi - 1),
    # so stage bi only needs ((m-1) | (2^{bi+1}-1)) + 1 lanes (a 2^{bi+1}
    # multiple by construction; rounded up to the 128-lane granule). The
    # arrays widen with sentinel pads exactly when a stage's bound first
    # exceeds the current width -- at the headline (m=1792, n2=2048) 9 of
    # 11 stages run at 1792 lanes, at the fly-through shape (m=1152) 7 of
    # 11 run at 1152.
    cur = m
    for bi in range((n2 - 1).bit_length()):
        s = 1 << bi
        need = ((m - 1) | (2 * s - 1)) + 1
        need = min(n2, -(-need // 128) * 128)
        if need > cur:
            padw = jnp.full((tw, need - cur), jnp.int32(-1))
            packed = jnp.concatenate([packed, padw], axis=1)
            if textured:
                tex_thr = jnp.concatenate(
                    [tex_thr, jnp.zeros((tw, need - cur), jnp.int32)],
                    axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (tw, need), 1)
            cur = need
        # cur is a multiple of 2s, so XOR-partner pairs never straddle the
        # wrap and the (cur - s)/(s) roll pair is exact
        fwd = pltpu.roll(packed, shift=cur - s, axis=1)
        bwd = pltpu.roll(packed, shift=s % cur, axis=1)
        low = (lane & s) == 0
        part = jnp.where(low, fwd, bwd)
        av = jnp.where(low, packed, part)
        bv = jnp.where(low, part, packed)
        if dshift + bi <= 30:
            a_hi = (av >= 0) & (((av >> (dshift + bi)) & 1) == 1)
            b_lo = (bv >= 0) & (((bv >> (dshift + bi)) & 1) == 0)
            swap = a_hi | b_lo
        else:
            swap = bv >= 0          # dest bit bi is 0 for every real dest
        packed = jnp.where(swap, part, packed)
        if textured:
            tp = jnp.where(low, pltpu.roll(tex_thr, shift=cur - s, axis=1),
                           pltpu.roll(tex_thr, shift=s % cur, axis=1))
            tex_thr = jnp.where(swap, tp, tex_thr)

    out_ref[:] = packed[:, :h]
    if textured:
        outtex_ref[:] = tex_thr[:, :h]


@functools.partial(jax.jit, static_argnames=("height", "monotone",
                                             "interpret", "tile_w"))
def resolve_window(y_k, height, *, tex=None, monotone=True, interpret=None,
                   tile_w=None):
    """Fused-resolve entry: y_k (W, K) f32 horizon rows (non-increasing
    along k when monotone=True, raw otherwise) -> (idx, alpha, ok), each
    (W, H), matching raymarch._resolve_rows' packed branch (idx/ok
    bit-identical). With ``tex`` (W, K) int32 per-sample packed colors, a
    fourth (W, H) int32 output routes each pixel's winning sample color.
    Check resolve_fits(K, H) first.

    ``tile_w=None`` picks 128 columns per block when n2 <= 2048 (measured
    0.86 -> 0.80 ms at the 4096x1024 headline -- fewer grid instances,
    same per-element work) and falls back to 64 above (the _N2_MAX VMEM
    budget assumes <= ~6.3 MB of live (tile_w, n2) buffers). Outputs are
    bitwise tile_w-invariant: columns are independent."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w, k = y_k.shape
    kp, hp, hb, kb, a_bits, n2, m = _plan(k, height)
    if tile_w is None:
        tile_w = 2 * TILE_W if n2 <= 2048 else TILE_W
    if a_bits < 5:
        raise ValueError("resolve_window bit budget exceeded; use "
                         "_resolve_rows")
    textured = tex is not None
    if kp != k:
        # LEFT pad with below-everything rows: keeps the sample segment
        # non-increasing (a right pad would break the merge's valley) and
        # the pads' maximal keys sort to the merged tail, counted by no
        # threshold.
        y_k = jnp.pad(y_k, ((0, 0), (kp - k, 0)),
                      constant_values=3.0e38)
        if textured:
            tex = jnp.pad(tex.astype(jnp.int32), ((0, 0), (kp - k, 0)))
    w_pad = -(-w // tile_w) * tile_w
    if w_pad != w:
        y_k = jnp.pad(y_k, ((0, w_pad - w), (0, 0)),
                      constant_values=3.0e38)
        if textured:
            tex = jnp.pad(tex, ((0, w_pad - w), (0, 0)))

    kern = functools.partial(_resolve_kernel, kp=kp, k_real=k, h=hp,
                             n2=n2, m=m, kb=kb, a_bits=a_bits,
                             monotone=monotone, textured=textured)
    in_spec = pl.BlockSpec((tile_w, kp), lambda wt: (wt, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_w, hp), lambda wt: (wt, 0),
                            memory_space=pltpu.VMEM)
    # NOTE: under shard_map, wrap with check_vma=False (as parallel/
    # sharding.py does) -- pallas_call bodies don't propagate the
    # varying-mesh-axes annotations jax 0.9's checker wants
    out_shape = jax.ShapeDtypeStruct((w_pad, hp), jnp.int32)
    call = pl.pallas_call(
        kern,
        grid=(w_pad // tile_w,),
        in_specs=[in_spec] * (2 if textured else 1),
        out_specs=(out_spec, out_spec) if textured else out_spec,
        out_shape=(out_shape, out_shape) if textured else out_shape,
        interpret=interpret,
    )
    if textured:
        pu, ptex = call(y_k, tex.astype(jnp.int32))
        tex_out = ptex[:w, :height]
    else:
        pu = call(y_k)
    pu = pu[:w, :height]

    amax = (1 << a_bits) - 1
    idx = (pu >> (a_bits + 1)) & ((1 << kb) - 1)
    alpha = ((pu >> 1) & amax).astype(jnp.float32) / amax
    ok = (pu & 1) == 1
    if textured:
        return idx, alpha, ok, tex_out
    return idx, alpha, ok
