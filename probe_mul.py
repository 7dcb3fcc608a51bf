"""A/B probe: Montgomery-mul kernel variants on the real chip.

Usage: OWSHEN_MUL_KERNEL=scratch python probe_mul.py
Times mont_mul_pallas and poseidon_hash2_pallas warm over a large batch.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from owshen_tpu.fields.field import FR
from owshen_tpu.pallas.field_kernels import (_MUL_KERNEL, mont_mul_pallas,
                                             poseidon_hash2_pallas)


def timeit(fn, x, y, reps=8):
    """Dependent chain + tiny to-host fetch: block_until_ready does NOT
    block through the axon tunnel, so sync via fetching one element of the
    final output (fetch overhead measured separately and subtracted)."""
    def sync(v):
        return np.asarray(jax.tree_util.tree_leaves(v)[0][:1, :1])

    x0 = fn(x, y)
    sync(x0)
    t0 = time.perf_counter()
    sync(x0)
    fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        x = fn(x, y)
    sync(x)
    return (time.perf_counter() - t0 - fetch) / reps


def main():
    print("backend:", jax.default_backend(), "kernel:", _MUL_KERNEL)
    rng = np.random.default_rng(0)
    n = 1 << 20
    av = [int.from_bytes(rng.bytes(31), "big") % FR.p for _ in range(1024)]
    a = jnp.asarray(np.tile(FR.encode(av), (n // 1024, 1)))
    b = jnp.asarray(np.tile(FR.encode(av[::-1]), (n // 1024, 1)))
    jit_mul = jax.jit(lambda a, b: mont_mul_pallas(a, b, block_t=1024))
    t = timeit(jit_mul, a, b)
    print(f"mont_mul 2^20: {t*1e3:.2f} ms -> {n/t/1e6:.1f} Mmul/s")
    # correctness spot check on device output
    got = FR.decode(np.asarray(jit_mul(a, b))[:4])
    want = [av[i] * av[1023 - i] % FR.p for i in range(4)]
    assert list(got) == want, "MISMATCH on chip!"
    m = 1 << 18
    l = jnp.asarray(np.tile(FR.encode(av), (m // 1024, 1)))
    r = jnp.asarray(np.tile(FR.encode(av[::-1]), (m // 1024, 1)))
    jit_pos = jax.jit(lambda l, r: poseidon_hash2_pallas(l, r, block_t=512))
    t = timeit(jit_pos, l, r)
    print(f"poseidon2 2^18: {t*1e3:.2f} ms -> {m/t/1e3:.0f} Khash/s")


if __name__ == "__main__":
    main()
