"""Pippenger multi-scalar multiplication on TPU (jnp).

Net-new proving-path engine (SURVEY.md §2.3, BASELINE config 4): the Groth16
commitment bottleneck.

TPU-first formulation — bucket accumulation is a scatter on GPUs; here it is
re-shaped into sort + *hierarchical segmented scan* so everything is a
fixed-shape vector op:

  1. per window: extract c-bit digits, argsort points by digit;
  2. segmented inclusive scan over the sorted run (chunked: a lax.scan down
     a (lanes, chunk) layout so every sequential step is a batched complete
     EC add across lanes, recursing on per-lane carries — log-depth overall
     with full VPU occupancy);
  3. segment totals scattered into the dense bucket array (unique indices);
  4. bucket-weighted sum Σ j·B_j via suffix prefix-scan + tree reduce;
  5. window results combined by a c-doubling Horner scan.

Everything is branchless complete-formula arithmetic, so identity points and
repeated points need no special cases.  Multi-chip sharding (points split
per chip, per-chip partials combined over ICI) lives in parallel/msm_dist.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _tree_map(fn, pt):
    return tuple(fn(leaf) for leaf in pt)


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
    # out[k, t] = combine(exc[k], out1[k, t]): flag of out1 decides
    fixed = curve.select(outf, outs, curve.add(_tree_map(lambda a: a[None], exc_p), outs))
    outs = _tree_map(lambda a: jnp.moveaxis(a, 0, 1).reshape((n,) + a.shape[2:]), fixed)
    outf = jnp.moveaxis(outf, 0, 1).reshape(n)
    return outs, outf


def plain_scan(curve, points, chunk: int = 512):
    """Inclusive (non-segmented) EC prefix scan along axis 0."""
    flags = jnp.zeros((points[0].shape[0],), bool)
    outs, _ = segmented_scan(curve, points, flags, chunk)
    return outs


def _extract_digits(scalars, w: int, c: int):
    """c-bit digit w of canonical 16-bit-limb scalars uint32[n, L]."""
    per_limb = 16 // c
    limb = scalars[:, w // per_limb]
    shift = (w % per_limb) * c
    return (limb >> shift) & ((1 << c) - 1)


def msm(curve, points, scalars, c: int = 16, n_bits: int = 256, chunk: int = 512):
    """Σ scalars[i] · points[i].

    curve: Weierstrass-like ops object; points: projective pytree [n, ...];
    scalars: canonical uint32[n, L] limbs.  n must be a power of two (pad
    with zero scalars otherwise).  Returns a single projective point."""
    assert c in (4, 8, 16)
    n = scalars.shape[0]
    n_windows = n_bits // c
    two_c = 1 << c

    # --- per-window bucket pipeline (traced once; scanned over windows) ---
    def window_sum(w):
        per_limb = 16 // c
        limb = jnp.take(scalars, w // per_limb, axis=1)
        shift = (w % per_limb) * c
        digits = (limb >> shift) & (two_c - 1)  # (n,)
        order = jnp.argsort(digits)
        d_sorted = jnp.take(digits, order, axis=0)
        pts_sorted = _tree_map(lambda a: jnp.take(a, order, axis=0), points)
        starts = jnp.concatenate(
            [jnp.ones((1,), bool), d_sorted[1:] != d_sorted[:-1]])
        scan_p, _ = segmented_scan(curve, pts_sorted, starts, chunk)
        ends = jnp.concatenate([starts[1:], jnp.ones((1,), bool)])
        # scatter segment totals into dense buckets (unique indices; all
        # non-end rows land in the dump slot two_c)
        idx = jnp.where(ends, d_sorted.astype(jnp.int32), two_c)
        ident = curve.identity_like(scan_p[0][0])
        buckets = tuple(
            jnp.broadcast_to(jnp.expand_dims(iz, 0), (two_c + 1,) + iz.shape)
            .at[idx].set(sp)
            for iz, sp in zip(ident, scan_p)
        )
        # weighted sum Σ_{j=1}^{2^c-1} j·B_j = Σ_k suffix_k: suffix sums via
        # reversed inclusive plain scan over buckets 1..2^c-1
        bkt = _tree_map(lambda a: a[1:two_c][::-1], buckets)
        # pad to power of two with identities for the chunked scan
        m = two_c - 1
        m_pad = 1 << (m - 1).bit_length()
        pad = m_pad - m
        bkt = tuple(
            jnp.concatenate([a, jnp.broadcast_to(jnp.expand_dims(iz, 0),
                                                 (pad,) + iz.shape)])
            for a, iz in zip(bkt, ident)
        )
        suffix = plain_scan(curve, bkt, chunk)
        return curve.sum_reduce(suffix)

    def scan_body(acc, w):
        for _ in range(c):
            acc = curve.double(acc)
        acc = curve.add(acc, window_sum(w))
        return acc, None

    acc0 = curve.identity_like(points[0][0])
    ws = jnp.arange(n_windows - 1, -1, -1)
    acc, _ = jax.lax.scan(scan_body, acc0, ws)
    return acc


def pad_to_pow2(points, scalars, curve):
    """Host-side helper: pad (points, scalars) so n is a power of two."""
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
