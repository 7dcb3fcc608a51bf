#!/usr/bin/env python
"""Benchmark harness (BASELINE.md configs) — run on the real TPU chip.

Prints exactly ONE JSON line on stdout (the headline metric: Pippenger G1
MSM throughput, BASELINE config 4, with vs_baseline = speedup over the
single-threaded host oracle).  All per-config metrics + device info are
logged to stderr and written to bench_results.json.

Baselines are measured, not assumed: the reference publishes no numbers
(BASELINE.md — "the baseline must be established"), so each kernel is
compared against the pure-Python single-threaded oracle that defines
bit-exact correctness, measured here at small n and scaled by the oracle's
known complexity (linear per hash/point; n·log n for NTT).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sync(out):
    """Force completion by reading ONE element back to host.

    jax.block_until_ready is a NO-OP through this environment's axon TPU
    tunnel (verified: a 5 s poseidon batch 'completes' in 0.2 ms under
    block_until_ready but takes the full 5 s under any host readback), so
    every timing must end with a readback.  A scalar slice keeps the
    transfer cost negligible while still forcing the whole computation."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timed(fn, *args, iters: int = 3):
    """Warm-up once (compile), then best of `iters` runs (readback-synced)."""
    _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    t_start = time.time()
    dev = jax.devices()[0]
    info = {"platform": dev.platform, "device": str(dev),
            "n_devices": len(jax.devices())}
    log(f"device: {info}")
    results = {"device": info}
    rng = np.random.RandomState(0)
    # warm the tunnel: the first host readback pays a large one-time
    # lazy-initialization cost; pay it before any timing
    t0 = time.time()
    _sync(jnp.zeros((8, 8), jnp.uint32) + 1)
    log(f"tunnel warmup: {time.time()-t0:.1f}s")

    from owshen_tpu.fields.field import FR, ints_to_array
    from owshen_tpu.ops import merkle
    from owshen_tpu.ops.hash import mimc_hash2, poseidon_hash2
    from owshen_tpu.ops.ntt import NttDomain
    from owshen_tpu.oracle import hash as ohash

    def rand_fr(n):
        return ints_to_array(
            [int.from_bytes(rng.bytes(31), "big") % FR.p for _ in range(n)])

    # ---- config 1/2: hash kernels ----------------------------------------
    for name, fn, ofn in (
        ("poseidon_hash2", jax.jit(poseidon_hash2),
         lambda a, b: ohash.poseidon([a, b])),
        ("mimc_hash2", jax.jit(mimc_hash2),
         lambda a, b: ohash.mimc7_multi([a, b])),
    ):
        n = 1 << 16
        x, y = jnp.asarray(rand_fr(n)), jnp.asarray(rand_fr(n))
        dt = timed(fn, x, y)
        rate = n / dt
        t0 = time.perf_counter()
        k = 20
        for i in range(k):
            ofn(i + 1, i + 2)
        orate = k / (time.perf_counter() - t0)
        results[name] = {"batch": n, "s": dt, "hashes_per_s": rate,
                         "oracle_hashes_per_s": orate,
                         "vs_baseline": rate / orate}
        log(f"{name}: {rate:,.0f} hashes/s (oracle {orate:,.0f}/s, "
            f"{rate/orate:,.0f}x)")

    # ---- config 1: 20-level dense MiMC Merkle root ------------------------
    n_leaves = 1 << 20
    leaves = jnp.asarray(rand_fr(1 << 14))
    leaves = jnp.tile(leaves, (1 << 6, 1))  # 2^20 leaves without host cost
    root_fn = jax.jit(lambda lv: merkle.merkle_root(lv, "mimc"))
    dt = timed(root_fn, leaves, iters=2)
    # oracle: one mimc_hash2 per internal node, sequential
    o_per_hash = results["mimc_hash2"]["oracle_hashes_per_s"]
    o_est = (n_leaves - 1) / o_per_hash
    results["mimc_merkle_root_2^20"] = {
        "s": dt, "leaves_per_s": n_leaves / dt, "oracle_est_s": o_est,
        "vs_baseline": o_est / dt}
    log(f"mimc 20-level dense root (2^20 leaves): {dt*1e3:.1f} ms "
        f"({o_est/dt:,.0f}x oracle est)")

    # ---- config 2: sparse-Merkle batch insert at 2^16 ---------------------
    smt = merkle.SparseMerkleTree(16, "poseidon")
    k_ins = 4096
    idxs = jnp.asarray(rng.choice(1 << 16, size=k_ins, replace=False)
                       .astype(np.int32))
    vals = jnp.asarray(rand_fr(k_ins))
    dt = timed(lambda nd, i, v: smt._insert_fn(nd, i, v),
               smt.nodes, idxs, vals)
    o_per_hash = results["poseidon_hash2"]["oracle_hashes_per_s"]
    o_est = k_ins * 16 / o_per_hash  # oracle: depth hashes per insert
    results["smt_2^16_batch_insert"] = {
        "batch": k_ins, "s": dt, "leaves_per_s": k_ins / dt,
        "oracle_est_s": o_est, "vs_baseline": o_est / dt}
    log(f"SMT depth-16 batch insert {k_ins}: {dt*1e3:.1f} ms -> "
        f"{k_ins/dt:,.0f} leaves/s ({o_est/dt:,.0f}x oracle est)")

    # ---- config 3: NTT 2^20 ------------------------------------------------
    from owshen_tpu.oracle import ntt as ontt

    log_n = 20
    dom = NttDomain(log_n)
    x = jnp.asarray(rand_fr(1 << log_n))
    ntt_fn = jax.jit(dom.ntt)
    dt = timed(ntt_fn, x, iters=2)
    # oracle at 2^10, scaled by n log n
    xs_small = [int(v) for v in rng.randint(0, 1 << 30, size=1 << 10)]
    om = pow(FR.generator, (FR.p - 1) >> 10, FR.p)
    t0 = time.perf_counter()
    ontt.ntt(xs_small, om)
    o_small = time.perf_counter() - t0
    scale = ((1 << log_n) * log_n) / ((1 << 10) * 10)
    o_est = o_small * scale
    results["ntt_2^20"] = {"s": dt, "oracle_est_s": o_est,
                           "vs_baseline": o_est / dt}
    log(f"NTT 2^20: {dt*1e3:.1f} ms ({o_est/dt:,.0f}x oracle est)")

    # ---- config 4: Pippenger MSM ------------------------------------------
    from owshen_tpu.curves import bn254
    from owshen_tpu.ops.msm import msm
    from owshen_tpu.oracle import curve as ocurve

    # oracle rate: double-and-add per point
    t0 = time.perf_counter()
    for i in range(4):
        ocurve.G1.mul(ocurve.G1_GEN, (0x55AA << 200) + i * 12345 + (1 << 253))
    o_pps = 4 / (time.perf_counter() - t0)
    log(f"oracle G1 scalar-mul: {o_pps:.0f} points/s")

    # config 5 runs BEFORE the largest MSM: a 2^22 attempt that overruns HBM
    # takes the worker down with it (observed), and proofs/s evidence matters
    # more than the last MSM size
    if os.environ.get("BENCH_SKIP_GROTH16") != "1":
        try:
            from owshen_tpu.circuits import pool
            from owshen_tpu.groth16 import groth16

            w = pool.DepositWitness(secret=12345, salt=67890, amount=1000)
            com = pool.commitment_of(w.secret, w.salt, w.amount)
            b = pool.deposit_circuit(w)
            t0 = time.perf_counter()
            pk, vk = groth16.setup(b)
            t_setup = time.perf_counter() - t0
            groth16.prove(pk, b, msm_lanes=256)  # compile
            t0 = time.perf_counter()
            proof = groth16.prove(pk, b, msm_lanes=256)
            t_prove = time.perf_counter() - t0
            ok = groth16.verify(vk, [com, w.amount], proof)
            m = b.num_vars
            o_est = (3 * m + pk.n_domain) / o_pps
            results["groth16_prove_deposit"] = {
                "constraints": len(b.constraints), "setup_s": t_setup,
                "prove_s": t_prove, "proofs_per_s": 1 / t_prove,
                "verify_ok": bool(ok), "oracle_est_s": o_est,
                "vs_baseline": o_est / t_prove}
            log(f"Groth16 deposit ({len(b.constraints)} constraints): "
                f"setup {t_setup:.1f}s, prove {t_prove:.2f}s "
                f"({1/t_prove:.2f} proofs/s, {o_est/t_prove:,.0f}x oracle "
                f"est), verify={ok}")
        except Exception as e:  # noqa: BLE001
            log(f"groth16 bench failed: {e}")

    msm_out = None
    for log_npts, lanes in ((20, 1024), (22, 1024)):
        n = 1 << log_npts
        base = bn254.g1_encode([bn254.G1_GEN] * (1 << 14))
        pts = tuple(jnp.tile(a, (n >> 14, 1) if a.ndim == 2 else (n >> 14,))
                    for a in base)
        sc = jnp.asarray(rand_fr(n))
        f = jax.jit(lambda p, s: msm(bn254.G1, p, s, c=8, lanes=lanes))
        try:
            dt = timed(f, pts, sc, iters=2)
        except Exception as e:  # noqa: BLE001 — record and continue
            log(f"msm 2^{log_npts} failed: {e}")
            continue
        mpps = n / dt / 1e6
        vsb = (n / o_pps) / dt
        results[f"msm_g1_2^{log_npts}"] = {
            "s": dt, "mpoints_per_s": mpps, "oracle_est_s": n / o_pps,
            "vs_baseline": vsb}
        log(f"MSM G1 2^{log_npts} (c=8, lanes={lanes}): {dt:.3f} s -> "
            f"{mpps:.2f} Mpoints/s ({vsb:,.0f}x oracle)")
        msm_out = {"metric": f"msm_g1_2^{log_npts}_mpoints_per_s",
                   "value": round(mpps, 3), "unit": "Mpoints/s",
                   "vs_baseline": round(vsb, 1)}

    results["total_bench_s"] = time.time() - t_start
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_results.json"), "w") as fh:
        json.dump(results, fh, indent=1, default=float)
    log(f"total bench time: {results['total_bench_s']:.0f}s")

    if msm_out is None:
        msm_out = {"metric": "msm_g1", "value": 0.0, "unit": "Mpoints/s",
                   "vs_baseline": 0.0}
    print(json.dumps(msm_out), flush=True)


if __name__ == "__main__":
    main()
