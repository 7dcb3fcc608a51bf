"""Pippenger multi-scalar multiplication on TPU (jnp).

Net-new proving-path engine (SURVEY.md §2.3, BASELINE config 4): the Groth16
commitment bottleneck.

TPU-first formulation — bucket accumulation is a scatter on GPUs; a sort +
segmented reduction is the classic SIMD answer, but on TPU (and under XLA's
compile model) the cheapest shape is **lane-parallel scatter-accumulate**:

  1. all 256/c windows' c-bit digits are extracted at once (one shift/mask
     over the 16-bit limb array) — digits[w, i];
  2. the point stream is folded into per-(window, lane) bucket arrays by a
     single ``lax.scan`` over rows whose body is ONE wide batched complete
     EC add + gather/scatter at unique indices.  Each of the `lanes` lanes
     owns a private 2^c-bucket array, so there are no index collisions and
     no sort — and the scan body is tiny, so XLA compile time stays flat
     regardless of n;
  3. per-lane buckets are combined by one scan over lanes (each step a
     (W, 2^c)-wide batched add — full VPU width, single HLO add instance);
  4. the bucket-weighted sum Σ j·B_j runs as a windows-batched suffix scan;
  5. window results combine under a c-doubling Horner scan.

Everything is branchless complete-formula arithmetic, so identity points,
repeated points, and zero digits need no special cases (bucket 0 absorbs
zero digits and is never read).  Multi-chip sharding (points split per
chip, per-chip partials combined over ICI) lives in parallel/msm_dist.py.

The generic segmented/plain prefix-scan machinery below is kept for the
distributed reducers and as a tested building block.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _tree_map(fn, pt):
    return tuple(fn(leaf) for leaf in pt)


# ---------------------------------------------------------------------------
# Generic chunked segmented scan (EC prefix sums)
# ---------------------------------------------------------------------------

class _SegOps:
    """Segmented-scan combiner over (point-pytree, flag) pairs."""

    def __init__(self, curve):
        self.curve = curve

    def combine(self, a, b):
        (pa, fa), (pb, fb) = a, b
        p = self.curve.select(fb, pb, self.curve.add(pa, pb))
        return (p, fa | fb)


def segmented_scan(curve, points, flags, chunk: int = 512):
    """Inclusive segmented prefix 'EC sum' along axis 0.

    points: pytree of arrays [n, ...]; flags: bool[n] (True = segment start).
    Returns (scan_points, seen_start_flags) of the same shapes.  n must be a
    power of two."""
    ops = _SegOps(curve)
    n = flags.shape[0]
    if n <= chunk:
        init = (curve.identity_like(points[0][0]), jnp.zeros((), bool))

        def body(carry, x):
            out = ops.combine(carry, x)
            return out, out

        _, (outs, outf) = jax.lax.scan(body, init, (points, flags))
        return outs, outf

    lanes = n // chunk
    # (n,) -> (lanes, chunk): lane k owns the contiguous slice [k*chunk, ...)
    pts_l = _tree_map(lambda a: a.reshape((lanes, chunk) + a.shape[1:]), points)
    flg_l = flags.reshape(lanes, chunk)
    # level 1: scan along the chunk axis; carry is per-lane (batched add)
    init = (curve.identity_like(pts_l[0][:, 0]), jnp.zeros((lanes,), bool))

    def body(carry, x):
        out = ops.combine(carry, x)
        return out, out

    pts_t = _tree_map(lambda a: jnp.moveaxis(a, 1, 0), pts_l)  # (chunk, lanes, ...)
    flg_t = jnp.moveaxis(flg_l, 1, 0)
    (last_p, last_f), (outs, outf) = jax.lax.scan(body, init, (pts_t, flg_t))
    # level 2: recurse on per-lane carries, then apply exclusive prefixes
    inc_p, inc_f = segmented_scan(curve, last_p, last_f, chunk)
    # exclusive shift: prepend identity, drop last
    ident = curve.identity_like(inc_p[0][0])
    exc_p = tuple(
        jnp.concatenate([jnp.expand_dims(jnp.broadcast_to(iz, a.shape[1:]), 0), a[:-1]])
        for a, iz in zip(inc_p, ident)
    )
    exc_f = jnp.concatenate([jnp.zeros((1,), bool), inc_f[:-1]])
    # out[k, t] = combine(exc[k], out1[k, t]): flag of out1 decides
    fixed = curve.select(outf, outs, curve.add(_tree_map(lambda a: a[None], exc_p), outs))
    outf = outf | exc_f[None, :]
    outs = _tree_map(lambda a: jnp.moveaxis(a, 0, 1).reshape((n,) + a.shape[2:]), fixed)
    outf = jnp.moveaxis(outf, 0, 1).reshape(n)
    return outs, outf


def plain_scan(curve, points, chunk: int = 512):
    """Inclusive (non-segmented) EC prefix scan along axis 0."""
    flags = jnp.zeros((points[0].shape[0],), bool)
    outs, _ = segmented_scan(curve, points, flags, chunk)
    return outs


# ---------------------------------------------------------------------------
# Pippenger MSM
# ---------------------------------------------------------------------------

def window_digits(scalars, c: int, n_bits: int = 256):
    """All window digits at once: canonical 16-bit-limb scalars
    uint32[n, L] -> int32[n_windows, n] with digits[w] = (s >> w·c) & (2^c-1).
    c must divide 16."""
    assert 16 % c == 0
    n_windows = (n_bits + c - 1) // c
    per_limb = 16 // c
    w = np.arange(n_windows)
    limb_idx = jnp.asarray(w // per_limb, jnp.int32)
    shifts = jnp.asarray((w % per_limb) * c, jnp.uint32)
    limbs = jnp.take(scalars, limb_idx, axis=1)          # (n, n_windows)
    digits = (limbs >> shifts[None, :]) & jnp.uint32((1 << c) - 1)
    return jnp.moveaxis(digits, 1, 0).astype(jnp.int32)  # (n_windows, n)


def sum_scan(curve, pts, axis: int = 0):
    """EC sum along `axis` as ONE lax.scan (1 add in the HLO).

    Summing N point-arrays costs N-1 adds regardless of shape — a log-tree
    only reduces *depth*, at log₂N inlined add instances in the HLO.  When
    the per-step batch is already VPU-wide, the scan is the right trade:
    flat compile, same total work."""
    pts_t = _tree_map(lambda a: jnp.moveaxis(a, axis, 0), pts)
    init = _tree_map(lambda a: a[0], pts_t)
    rest = _tree_map(lambda a: a[1:], pts_t)

    def body(acc, x):
        return curve.add(acc, x), None

    acc, _ = jax.lax.scan(body, init, rest)
    return acc


def _weighted_sum(curve, buckets, ident1):
    """Σ_{j≥1} j·B_j along axis 1 of a (W, m, ...) bucket pytree, as a
    suffix scan with the running total folded into the same carry (so the
    HLO holds exactly two EC-add instances).  Returns (W, ...)."""
    n_windows = buckets[0].shape[0]
    bkt = _tree_map(lambda a: a[:, 1:][:, ::-1], buckets)    # j = m-1 .. 1
    bkt_t = _tree_map(lambda a: jnp.moveaxis(a, 1, 0), bkt)  # (m-1, W, ...)
    initw = _tree_map(
        lambda iz: jnp.broadcast_to(
            jnp.expand_dims(iz, 0), (n_windows,) + iz.shape), ident1)

    def sstep(carry, x):
        suf, tot = carry
        suf = curve.add(suf, x)
        tot = curve.add(tot, suf)
        return (suf, tot), None

    (_, wsum), _ = jax.lax.scan(sstep, (initw, initw), bkt_t)
    return wsum


# ---------------------------------------------------------------------------
# Large-n MSM: window-serial sorted formulation (HBM-safe, gather-light)
# ---------------------------------------------------------------------------
#
# The lane-private scan above needs W·lanes·2^c bucket points resident
# (1.6 GB at c=8/lanes=1024/W=32 — the round-2 HBM overrun at 2^22) and its
# scan body is gather+scatter bound.  The formulation below is shaped by
# measured v5e rates (sort 2^22 ≈ 30 ms, row-gather ≈ 59 ns/row, Pallas
# complete-add ≈ 18-32 M adds/s at 2^20 width):
#
#   * signed 16-bit windows: W = 16 windows over 254 bits, digit magnitudes
#     in [0, 2^15] (negation is a y-flip — free), so the total add count is
#     ~16n instead of 32n;
#   * per window (processed serially under one lax.scan — peak memory is
#     ONE window's working set): sort (digit, sign, index), gather the
#     points into sorted order once, then build a pairwise up-sweep tree
#     (log₂n levels of full-width batched complete adds — no scatter, no
#     long scans);
#   * bucket sums are never materialized: with S_e = sum of the first e
#     sorted points and e_j = #points with digit ≤ j, the window sum
#     telescopes to  Σ_j j·B_j = m·S_n − Σ_{j=0}^{m−1} S_{e_j}  (m = 2^15),
#     and each S_{e_j} is read off the up-sweep tree by binary decomposition
#     of e_j (22 batched conditional adds over all 2^15 boundaries at once);
#   * windows combine MSB-first under the same scan carry with c doublings
#     per step (Horner).
#
# Work: ~n adds per window for the tree + ~23·2^15 for boundary prefixes +
# 2^15 for the reduction — ≈ 5M adds/window at 2^22, all in wide batched
# Pallas calls.  Memory: gathered points + tree levels ≈ 2.4 GB transient.


def _signed_digits(scalars, c: int):
    """Canonical uint32[n, 16] (16-bit limbs) -> signed base-2^c digits.

    Returns (mag uint32[W, n] in [0, 2^(c-1)], sgn bool[W, n]),
    W = 256//c.  Works for scalars < 2^254 + small slack: BN254 r's top
    bits leave headroom, so the final carry never overflows the top
    window (asserted by the oracle gates at every c)."""
    digits = window_digits(scalars, c)                   # (W, n) int32

    def body(carry, d):
        t = d + carry
        big = t >= (1 << (c - 1))
        signed = t - jnp.where(big, 1 << c, 0)
        return big.astype(jnp.int32), (jnp.abs(signed).astype(jnp.uint32),
                                       signed < 0)

    _, (mag, sgn) = jax.lax.scan(body, jnp.zeros(digits.shape[1], jnp.int32),
                                 digits)
    return mag, sgn


def _flat_rows(pt):
    """Projective pytree with (n, ...) leaves -> (n, F) row matrix + split
    metadata (so ONE row gather moves a whole point)."""
    n = pt[0].shape[0]
    flats = [leaf.reshape(n, -1) for leaf in pt]
    widths = [f.shape[1] for f in flats]
    return jnp.concatenate(flats, axis=1), widths, [leaf.shape[1:] for leaf in pt]


def _unflat_rows(rows, widths, shapes):
    out, off = [], 0
    for w, s in zip(widths, shapes):
        out.append(rows[:, off:off + w].reshape((rows.shape[0],) + s))
        off += w
    return tuple(out)


def _shift_down_ident(curve, pts, k: int, ident):
    """pts rows shifted down k along axis 0, identity-filled at the top."""
    return tuple(
        jnp.concatenate(
            [jnp.broadcast_to(jnp.expand_dims(iz, 0), (k,) + iz.shape),
             a[:-k]])
        for a, iz in zip(pts, ident))


def _hs_exclusive_prefix(curve, pts):
    """EXCLUSIVE EC prefix along axis 0 in log₂C FULL-WIDTH adds
    (Hillis–Steele; the identity fill needs no masking under complete
    formulas).  Replaces the two-level chunk scans whose G single-point
    steps dominated msm_sorted's wall time: a width-1 composed-XLA
    complete add is ~700 serialized HLO micro-ops ≈ 1 ms of pure latency,
    and the old form ran 128 of them per window (round-5 probe — the
    missing ~3 s of the 6.2 s headline)."""
    C = pts[0].shape[0]
    ident = curve.identity_like(pts[0][0])
    cur = _shift_down_ident(curve, pts, 1, ident)
    k = 1
    while k < C:
        cur = curve.add(cur, _shift_down_ident(curve, cur, k, ident))
        k *= 2
    return cur


def total_sum_wide(curve, pts, wide: int = 1 << 14):
    """Σ of an (n, ...) point pytree in ~(n/wide + log₂wide) sequential
    steps, every one a full-`wide` batched add: fold n → wide with one
    fixed-shape scan, then an inclusive Hillis–Steele prefix whose last
    row is the total.  No single-point ops, no shrinking-width ladder."""
    n = pts[0].shape[0]
    wide = min(wide, n)
    if n > wide:
        seq = tuple(a.reshape((n // wide, wide) + a.shape[1:]) for a in pts)
        init = tuple(a[0] for a in seq)
        rest = tuple(a[1:] for a in seq)

        def body(acc, x):
            return curve.add(acc, x), None

        pts, _ = jax.lax.scan(body, init, rest)
    ident = curve.identity_like(pts[0][0])
    cur = pts
    k = 1
    while k < wide:
        cur = curve.add(cur, _shift_down_ident(curve, cur, k, ident))
        k *= 2
    return tuple(a[wide - 1] for a in cur)


def _prefix_chunk_scan(curve, rows_pt, Q, C, sgn=None):
    """Inclusive prefix sums of a length-n point sequence, chunked so every
    add instance is shape-uniform (ONE Mosaic kernel per distinct width —
    each distinct-shape Pallas instance costs ~25 s of compile through the
    tunnel and the TPU backend has no persistent compile cache).

    rows_pt: pytree with (n, ...) leaves in sequence order, n = C*Q with
    chunk c owning elements [c*Q, (c+1)*Q).  sgn: optional bool[n] — rows
    whose y is negated INSIDE the scan body (fused into the step's column
    slice; a standalone pre-pass select materialized an extra full-array
    read+write — 0.44 s of the round-5 2^22 headline).  Returns:
      P    — pytree (Q, C, ...): P[q, c] = sum of chunk c's elements 0..q
      EXC  — pytree (C, ...):    sum of all elements before chunk c
    so prefix(e) = EXC[e//Q] + (e%Q > 0 ? P[e%Q - 1, e//Q] : 0)."""
    # (n, ...) -> (Q, C, ...) with chunk-major order
    seq = tuple(
        jnp.moveaxis(a.reshape((C, Q) + a.shape[1:]), 1, 0) for a in rows_pt)
    ident_c = curve.identity_like(seq[0][0])
    K = curve.K

    if sgn is None:
        def step(acc, col):
            acc = curve.add(acc, col)
            return acc, acc

        xs = seq
    else:
        sgn_cols = jnp.moveaxis(sgn.reshape(C, Q), 1, 0)  # (Q, C)

        def step(acc, inp):
            x, y, z, s = inp
            y = K.select(s, K.neg(y), y)
            acc = curve.add(acc, (x, y, z))
            return acc, acc

        xs = (*seq, sgn_cols)

    totals, P = jax.lax.scan(step, ident_c, xs)       # (C, ...), (Q, C, ...)
    # exclusive prefix over the C chunk totals: log₂C full-width adds
    EXC = _hs_exclusive_prefix(curve, totals)
    return P, EXC, totals


def msm_sorted(curve, points, scalars, c: int | None = None,
               gather_pad: int | None = None):
    """Σ scalars[i]·points[i] for large n (the BASELINE config-4 engine).

    curve: Weierstrass ops (needs .neg); points: projective pytree [n, ...];
    scalars: canonical uint32[n, 16]; c: window bits (16 on TPU; tests use 8
    so the 2^(c-1) boundary batch stays CPU-sized); gather_pad: row width
    (u32 lanes) the point matrix is padded to for the big per-window gather —
    measured on v5e: a (2^22, 48) row gather runs at 3.3 GB/s but (2^22, 128)
    at 28 GB/s, so padding to the full 128-lane vreg width is a 3.5x win.
    n is padded to a power of two internally.  Returns one projective point.

    Per window: sort by |digit|, gather points into sorted order, compute
    chunked inclusive prefix sums (_prefix_chunk_scan — every add is one of
    ~4 fixed shapes, so Mosaic compile stays flat in n), then read the
    bucket structure off the prefixes via the boundary-telescoping identity
      Σ_j j·B_j = m·S_n − Σ_{j=0}^{m−1} S_{e_j},   e_j = #digits ≤ j,
    and fold windows MSB-first with c doublings (Horner)."""
    from ..config import settings

    cfg = settings()
    if c is None:
        c = cfg.msm_window_bits
    if gather_pad is None:
        gather_pad = cfg.msm_gather_pad
    K = curve.K
    n = scalars.shape[0]
    n2 = 1 << max(7, (n - 1).bit_length())
    ident1 = curve.identity_like(points[0][0])
    if n2 != n:
        pad = n2 - n
        points = tuple(
            jnp.concatenate(
                [a, jnp.broadcast_to(jnp.expand_dims(iz, 0), (pad,) + iz.shape)])
            for a, iz in zip(points, ident1))
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad,) + scalars.shape[1:], scalars.dtype)])
    n = n2
    m = 1 << (c - 1)
    # chunk geometry: C as wide as possible (VPU width), Q sequential steps
    C = min(cfg.msm_chunk_c, max(n // 4, 1))
    Q = n // C
    mag, sgn = _signed_digits(scalars, c)
    rows, widths, shapes = _flat_rows(points)
    fwidth = rows.shape[1]
    if fwidth < gather_pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((n, gather_pad - fwidth), rows.dtype)], axis=1)
    iota = jnp.arange(n, dtype=jnp.int32)
    boundary_j = jnp.arange(m, dtype=jnp.uint32)

    def split(rws):
        return _unflat_rows(rws[:, :fwidth], widths, shapes)

    def window_body(acc, inp):
        magw, sgnw = inp
        # --- sort by digit magnitude; carry sign + index as payload ---
        # sign rides bit 30 of the index payload so the sort moves TWO
        # arrays, not three (sort was 0.33 s of the 2^22 headline)
        packed = iota | (sgnw.astype(jnp.int32) << 30)
        skeys, spay = jax.lax.sort((magw, packed), num_keys=1)
        perm = spay & ((1 << 30) - 1)
        ssgn = spay >> 30
        g = jnp.take(rows, perm, axis=0)              # THE big gather
        x, y, z = split(g)
        # --- chunked prefix sums over the sorted sequence; the sign
        # negation fuses into the scan body's column slice (a standalone
        # full-array select cost 0.44 s of the 2^22 headline) ---
        P, EXC, totals = _prefix_chunk_scan(curve, (x, y, z), Q, C,
                                            sgn=ssgn != 0)
        # grand total via the exclusive prefix (ONE add — a log-tree
        # reduce here would reintroduce a ladder of distinct Pallas shapes)
        total = curve.add(tuple(a[C - 1] for a in EXC),
                          tuple(a[C - 1] for a in totals))
        # --- boundary positions e_j = #digits <= j, all buckets at once ---
        e = jnp.searchsorted(skeys, boundary_j, side="right").astype(jnp.int32)
        # S_{e_j} = EXC[e//Q] + (e%Q > 0 ? P[e%Q-1, e//Q] : identity)
        c_idx = jnp.clip(e // Q, 0, C - 1)
        r_idx = e - c_idx * Q                          # in [0, Q]
        exc_j = tuple(jnp.take(a, c_idx, axis=0) for a in EXC)
        flatP = tuple(a.reshape((Q * C,) + a.shape[2:]) for a in P)
        p_idx = jnp.clip(r_idx - 1, 0, Q - 1) * C + c_idx
        p_j = tuple(jnp.take(a, p_idx, axis=0) for a in flatP)
        with_p = curve.add(exc_j, p_j)
        s_j = curve.select(r_idx > 0, with_p, exc_j)   # (m, ...)
        # --- Σ_j S_{e_j}: wide fold + Hillis–Steele total (~16 full-width
        # steps; the old chunk-scan here burned 256 narrow steps + singles
        # per window) ---
        s_sum = total_sum_wide(curve, s_j, wide=min(1 << 14, m))
        # --- window = m·total − Σ_j S_{e_j}, folded into the Horner carry:
        #   2^c·acc + m·total − s_sum  =  2^(c-1)·(2·acc + total) − s_sum
        # (m = 2^(c-1)), merging the m·total doublings into the Horner's —
        # width-1 ops are ~1 ms of pure serialized-HLO latency each, so
        # halving the per-window single count matters (round-5 probe) ---
        t = curve.double(acc)
        t = curve.add(t, total)
        for _ in range(c - 1):
            t = curve.double(t)
        return curve.add(t, curve.neg(s_sum)), None

    from ..curves.weierstrass import pallas_min_rows

    with pallas_min_rows(cfg.msm_pallas_min):
        acc, _ = jax.lax.scan(window_body, ident1, (mag[::-1], sgn[::-1]))
    return acc


def msm(curve, points, scalars, c: int = 8, n_bits: int = 256,
        lanes: int = 1024):
    """Σ scalars[i] · points[i].

    curve: Weierstrass-like ops object; points: projective pytree [n, ...];
    scalars: canonical uint32[n, L] limbs.  Any n (padded internally to a
    multiple of `lanes` with identities).  Returns a single projective point.

    `lanes` trades HBM footprint (n_windows · lanes · 2^c bucket points)
    against scan depth (n / lanes sequential wide adds); c trades window
    count (256/c passes over the points) against bucket-combine work
    (lanes · 2^c adds).

    PRECONDITION at n ≥ 2^17: scalars must be canonical (< 2^254 + slack,
    as all reduced BN254 Fr scalars are) — large batches route to the
    window-serial sorted engine (msm_sorted), whose signed-digit recoding
    drops the final carry out of the top window; a general 256-bit scalar
    ≥ ~2^255 would be silently mis-summed there.  The precondition is
    checked concretely whenever values are available (eager calls); under
    jit tracing the caller owns it."""
    assert c in (2, 4, 8, 16)
    n = scalars.shape[0]
    if n >= (1 << 17) and hasattr(curve, "neg") and scalars.shape[-1] == 16:
        if not isinstance(scalars, jax.core.Tracer):
            top = int(np.asarray(scalars[..., 15]).max(initial=0))
            assert top < (1 << 15), (
                "msm at n>=2^17 requires canonical scalars (<2^254+slack); "
                f"top limb {top:#x} overflows the sorted engine's top window")
        return msm_sorted(curve, points, scalars)
    lanes = max(1, min(lanes, n))
    rows = (n + lanes - 1) // lanes
    n_pad = rows * lanes
    n_windows = (n_bits + c - 1) // c
    two_c = 1 << c

    ident1 = curve.identity_like(points[0][0])  # single-point identity
    if n_pad != n:
        pad = n_pad - n
        points = tuple(
            jnp.concatenate(
                [a, jnp.broadcast_to(jnp.expand_dims(iz, 0), (pad,) + iz.shape)])
            for a, iz in zip(points, ident1)
        )
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad,) + scalars.shape[1:], scalars.dtype)])

    digits = window_digits(scalars, c, n_bits)           # (W, n_pad)
    digits = digits.reshape(n_windows, rows, lanes)
    pts_rows = _tree_map(
        lambda a: a.reshape((rows, lanes) + a.shape[1:]), points)

    # --- 2. lane-private bucket accumulation: one tiny scan body ---
    wi = jnp.arange(n_windows, dtype=jnp.int32)[:, None]
    li = jnp.arange(lanes, dtype=jnp.int32)[None, :]
    buckets0 = tuple(
        jnp.broadcast_to(
            iz.reshape((1, 1, 1) + iz.shape),
            (n_windows, lanes, two_c) + iz.shape,
        )
        for iz in ident1
    )

    def step(buckets, inp):
        d, p = inp  # d: (W, lanes); p: pytree (lanes, ...)
        cur = _tree_map(lambda b: b[wi, li, d], buckets)          # (W, lanes, ...)
        pb = _tree_map(lambda a: jnp.broadcast_to(a[None], (n_windows,) + a.shape), p)
        new = curve.add(cur, pb)
        buckets = tuple(
            b.at[wi, li, d].set(nv) for b, nv in zip(buckets, new))
        return buckets, None

    digits_t = jnp.moveaxis(digits, 1, 0)                # (rows, W, lanes)
    buckets, _ = jax.lax.scan(step, buckets0, (digits_t, pts_rows))

    # --- 3. combine lanes: one scan over the lane axis (each step is a
    # (W, 2^c)-wide batched add — full VPU width, single HLO add) ---
    buckets = sum_scan(curve, buckets, axis=1)           # (W, 2^c, ...)

    # --- 4. bucket-weighted sum Σ_{j≥1} j·B_j per window ---
    if two_c <= 512:
        wsum = _weighted_sum(curve, buckets, ident1)     # (W, ...)
    else:
        # large windows: split j = hi·2^cl + lo so the suffix scans run
        # 2^(c/2) steps instead of 2^c (65k-step scans are unusable)
        ch = c // 2
        cl = c - ch
        rs = _tree_map(
            lambda a: a.reshape((n_windows, 1 << ch, 1 << cl) + a.shape[2:]),
            buckets)
        rowsum = sum_scan(curve, rs, axis=2)             # Σ_lo B[hi,·]
        colsum = sum_scan(curve, rs, axis=1)             # Σ_hi B[·,lo]
        whi = _weighted_sum(curve, rowsum, ident1)       # Σ hi·rowsum
        wlo = _weighted_sum(curve, colsum, ident1)       # Σ lo·colsum
        whi = jax.lax.fori_loop(0, cl, lambda _, a: curve.double(a), whi)
        wsum = curve.add(whi, wlo)

    # --- 5. Horner over windows, MSB-first (doubles as a fori_loop so the
    # HLO contains ONE double instance, not c) ---
    wsum_rev = _tree_map(lambda a: a[::-1], wsum)

    def hstep(acc, wv):
        acc = jax.lax.fori_loop(0, c, lambda _, a: curve.double(a), acc)
        return curve.add(acc, wv), None

    acc, _ = jax.lax.scan(hstep, ident1, wsum_rev)
    return acc


def pad_to_pow2(points, scalars, curve):
    """Host-side helper: pad (points, scalars) so n is a power of two.
    (msm() now pads internally; kept for callers that want static shapes.)"""
    n = scalars.shape[0]
    n2 = 1 << math.ceil(math.log2(max(n, 1)))
    if n2 == n:
        return points, scalars
    pad = n2 - n
    ident = curve.identity_like(jax.tree_util.tree_leaves(points)[0][0] * 0)
    pts = tuple(
        jnp.concatenate([a, jnp.broadcast_to(jnp.expand_dims(iz, 0),
                                             (pad,) + iz.shape)])
        for a, iz in zip(points, ident)
    )
    sc = jnp.concatenate([scalars, jnp.zeros((pad,) + scalars.shape[1:],
                                             scalars.dtype)])
    return pts, sc
