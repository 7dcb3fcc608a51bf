"""Batched MiMC7 / Poseidon permutations over BN254 Fr (jnp, Montgomery domain).

These are the real algebraic hash kernels that replace the reference's
placeholder `hash(inp) = ∏ inp` (reference: babyjubjub/mod.rs:202-204).
Rounds run under ``lax.scan`` so the HLO stays compact; the batch axis
vectorizes across VPU lanes.

Constant provenance: MiMC7 round constants come from the circomlib keccak
chain (seed "mimc"); Poseidon constants from the Grain LFSR procedure of the
Poseidon reference parameter generator (GF(p), x^5, n=254) — the generator is
pinned by exact 254-bit anchors C[0]=0x0ee9a592... and M[0][0]=0x109b7f41...
of the published poseidonperm_x5_254_3 instantiation (tests/test_hash.py).
Evaluation schedule is the paper-canonical ark → S-box → MDS mix per round.
Bit-exactness vs the Python oracle is the hard gate for every batch shape.
"""

from __future__ import annotations

import functools

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
    """Merkle node hash used by the MiMC tree (key 0)."""
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
    return C_arr, M_arr


def _pow5(F: Field, x):
    x2 = F.sqr(x)
    x4 = F.sqr(x2)
    return F.mul(x4, x)


def poseidon_permute(state):
    """Poseidon permutation on a list of t batched elements (Montgomery).

    state: list[t] of uint32[..., L]; returns same structure."""
    F = FR
    t = len(state)
    C, M = _poseidon_consts_mont(t)
    C, M = jnp.asarray(C), jnp.asarray(M)
    half = POSEIDON_RF // 2
    r_p = POSEIDON_RP[t - 2]

    def mix(s):
        out = []
        for i in range(t):
            acc = F.mul(M[i, 0], s[0])
            for j in range(1, t):
                acc = F.add(acc, F.mul(M[i, j], s[j]))
            out.append(acc)
        return out

    def full_round(s, c):
        s = [F.add(s[i], c[i]) for i in range(t)]
        s = [_pow5(F, a) for a in s]
        return mix(s)

    def partial_round(s, c):
        s = [F.add(s[i], c[i]) for i in range(t)]
        s[0] = _pow5(F, s[0])
        return mix(s)

    def scan_rounds(s, consts, fn):
        def body(s, c):
            return tuple(fn(list(s), c)), None
        s, _ = jax.lax.scan(body, tuple(s), consts)
        return list(s)

    state = scan_rounds(state, C[:half], full_round)
    state = scan_rounds(state, C[half : half + r_p], partial_round)
    state = scan_rounds(state, C[half + r_p :], full_round)
    return state


def poseidon(inputs):
    """circomlib-parameterized Poseidon hash: state = [0, *inputs] -> state[0].

    inputs: list of uint32[..., L] (Montgomery), 1..16 elements."""
    t = len(inputs) + 1
    zero = jnp.zeros_like(inputs[0])
    state = [zero] + list(inputs)
    return poseidon_permute(state)[0]


def poseidon_hash2(left, right):
    """Merkle node hash (t=3 Poseidon)."""
    return poseidon([left, right])
