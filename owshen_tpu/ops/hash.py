"""Batched MiMC7 / Poseidon permutations over BN254 Fr (jnp, Montgomery domain).

These are the real algebraic hash kernels that replace the reference's
placeholder `hash(inp) = ∏ inp` (reference: babyjubjub/mod.rs:202-204).
Rounds run under ``lax.scan`` so the HLO stays compact; the batch axis
vectorizes across VPU lanes.

Constant provenance: MiMC7 round constants come from the circomlib keccak
chain (seed "mimc"); Poseidon constants from the Grain LFSR procedure of the
Poseidon reference parameter generator (GF(p), x^5, n=254) — the generator is
pinned by the FULL published poseidonperm_x5_254_3 permutation vector and by
circomlib hash vectors for every arity t=2..7 (tests/test_hash.py).
Evaluation schedule is the paper-canonical ark → S-box → MDS mix per round.
Bit-exactness vs the Python oracle is the hard gate for every batch shape.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import FR, Field, ints_to_array
from .constants import mimc7_constants, poseidon_params, POSEIDON_RF, POSEIDON_RP


# ---------------------------------------------------------------------------
# MiMC7
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _mimc_consts_mont() -> np.ndarray:
    cts = mimc7_constants()
    return ints_to_array([FR.to_mont_int(c) for c in cts], FR.L)


def _pow7(F: Field, x):
    x2 = F.sqr(x)
    x4 = F.sqr(x2)
    x6 = F.mul(x4, x2)
    return F.mul(x6, x)


def mimc7(x, k):
    """circomlib MiMC7(x_in, k), batched. x, k: uint32[..., L] (Montgomery)."""
    F = FR
    cts = jnp.asarray(_mimc_consts_mont())  # (91, L) mont
    r = _pow7(F, F.add(x, k))

    def body(r, c):
        return _pow7(F, F.add(F.add(r, k), c)), None

    r, _ = jax.lax.scan(body, r, cts[1:])
    return F.add(r, k)


def mimc7_multi(inputs, key=None):
    """circomlib MultiMiMC7: r = k; for x in inputs: r += x + MiMC7(x, r)."""
    F = FR
    r = key if key is not None else jnp.zeros_like(inputs[0])
    for x in inputs:
        r = F.add(F.add(r, x), mimc7(x, r))
    return r


def mimc_hash2(left, right):
    """Merkle node hash used by the MiMC tree (key 0).

    On TPU, 1-D batches route to the fused Pallas kernel (see
    poseidon_hash2); bit-exactness of both paths is oracle-gated."""
    if _pallas_ok(left, right):
        from ..pallas.field_kernels import mimc_hash2_pallas

        from ..config import settings

        n = left.shape[0]
        blk = settings().hash_block
        block = blk if n >= blk else 128
        pad = (-n) % block
        if pad:
            zpad = jnp.zeros((pad, left.shape[1]), left.dtype)
            left = jnp.concatenate([left, zpad])
            right = jnp.concatenate([right, zpad])
        out = mimc_hash2_pallas(left, right, block_t=block)
        return out[:n] if pad else out
    return mimc7_multi([left, right])


# ---------------------------------------------------------------------------
# Poseidon
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _poseidon_consts_mont(t: int):
    C, M = poseidon_params(t)
    n_rounds = POSEIDON_RF + POSEIDON_RP[t - 2]
    C_arr = ints_to_array([FR.to_mont_int(c) for c in C], FR.L).reshape(n_rounds, t, FR.L)
    M_arr = ints_to_array(
        [FR.to_mont_int(M[i][j]) for i in range(t) for j in range(t)], FR.L
    ).reshape(t, t, FR.L)
    # lane mask: full rounds S-box every lane, partial rounds only lane 0
    half, r_p = POSEIDON_RF // 2, POSEIDON_RP[t - 2]
    mask = np.ones((n_rounds, t), bool)
    mask[half : half + r_p, 1:] = False
    return C_arr, M_arr, mask


def _pow5(F: Field, x):
    x2 = F.sqr(x)
    x4 = F.sqr(x2)
    return F.mul(x4, x)


def poseidon_permute(state):
    """Poseidon permutation on a list of t batched elements (Montgomery).

    state: list[t] of uint32[..., L]; returns same structure.

    TPU-first shape: the state lives stacked as uint32[t, ..., L] and each
    round is a handful of WIDE batched ops — one S-box over all lanes (the
    partial-round lanes masked off with a select rather than branched, so
    one code path serves all 65 rounds), and the MDS mix as a single
    broadcast multiply uint32[t, t, ..., L] + tree of field adds.  All
    rounds run in ONE lax.scan whose body is ~7 field ops, vs the naive
    per-lane formulation's ~21 — this (with the flat-carry field core) is
    what keeps both XLA compile time and CPU-backend dispatch overhead
    sane, and on TPU it turns the permutation into full-width VPU work."""
    F = FR
    t = len(state)
    C, M, mask = _poseidon_consts_mont(t)
    C, M = jnp.asarray(C), jnp.asarray(M)
    s = jnp.stack(state)                         # (t, ..., L)
    batch_ndim = s.ndim - 2
    # align constants against (t, ..., L)
    cshape = (t,) + (1,) * batch_ndim + (F.L,)
    mshape = (t, t) + (1,) * batch_ndim + (F.L,)

    def body(full):
        # `full` is STATIC (the schedule is fixed: R_F/2 full, R_P partial,
        # R_F/2 full), so partial rounds compile with ONE lane's S-box —
        # x^5 on s[0] alone — instead of all t masked: ~30% of the
        # permutation's muls dropped vs the single masked-scan form.
        def step(s, c):
            s = F.add(s, c.reshape(cshape))
            if full:
                s = _pow5(F, s)
            else:
                s = jnp.concatenate([_pow5(F, s[:1]), s[1:]])
            # MDS: out[i] = Σ_j M[i,j]·s[j] — broadcast mul, log-tree adds
            prod = F.mul(M.reshape(mshape), s[None])  # (t, t, ..., L)
            acc = prod[:, 0]
            for j in range(1, t):
                acc = F.add(acc, prod[:, j])
            return acc, None

        return step

    half, r_p = POSEIDON_RF // 2, POSEIDON_RP[t - 2]
    s, _ = jax.lax.scan(body(True), s, C[:half])
    s, _ = jax.lax.scan(body(False), s, C[half:half + r_p])
    s, _ = jax.lax.scan(body(True), s, C[half + r_p:])
    return [s[i] for i in range(t)]


def poseidon(inputs):
    """circomlib-parameterized Poseidon hash: state = [0, *inputs] -> state[0].

    inputs: list of uint32[..., L] (Montgomery), 1..16 elements."""
    t = len(inputs) + 1
    zero = jnp.zeros_like(inputs[0])
    state = [zero] + list(inputs)
    return poseidon_permute(state)[0]


def _pallas_ok(left, right) -> bool:
    from ..config import settings

    if settings().no_pallas:
        return False
    if jax.default_backend() != "tpu":
        return False  # interpret mode is for correctness tests only
    return (getattr(left, "ndim", 0) == 2 and right.shape == left.shape
            and left.shape[-1] == FR.L)


def poseidon_hash2(left, right):
    """Merkle node hash (t=3 Poseidon).

    On TPU, 1-D batches route to the fused Pallas kernel (all 65 rounds
    resident in VMEM — ~35x the composed-XLA path); everything else (odd
    ranks, CPU mesh) takes the jnp path.  Both are bit-exact vs the oracle."""
    if _pallas_ok(left, right):
        from ..pallas.field_kernels import poseidon_hash2_pallas

        from ..config import settings

        n = left.shape[0]
        blk = settings().hash_block
        block = blk if n >= blk else 128
        pad = (-n) % block
        if pad:
            zpad = jnp.zeros((pad, left.shape[1]), left.dtype)
            left = jnp.concatenate([left, zpad])
            right = jnp.concatenate([right, zpad])
        out = poseidon_hash2_pallas(left, right, block_t=block)
        return out[:n] if pad else out
    return poseidon([left, right])
