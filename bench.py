#!/usr/bin/env python
"""Benchmark harness (BASELINE.md configs) — run on the real TPU chip.

Prints exactly ONE JSON line on stdout (the headline metric: Pippenger G1
MSM throughput at 2^22, BASELINE config 4, with vs_baseline = speedup over
the single-threaded host oracle).  All per-config metrics + device info are
logged to stderr and written to bench_results.json.

Budget discipline (driver runs were killed at rc=124 in rounds 2 and 3;
the axon TPU backend has NO persistent compile cache, so compiles are paid
fresh every run): configs run MOST-VALUABLE-FIRST —
  1. MSM 2^22 (config 4, the headline; its stdout JSON prints immediately),
  2. NTT 2^20 (config 3 — never driver-captured in rounds 1-3),
  3. Groth16 withdraw-d16 prove (config 5 — the ≥10×-oracle gate circuit;
     the fixed-table prover engine keeps compile + warm time bounded),
  4. EdDSA batch verify, hash kernels, Merkle/SMT (configs 1-2),
  5. Groth16 deposit prove LAST (265 constraints: dispatch-bound through
     the 25 ms/dispatch tunnel, kept for completeness, not the story).
EVERY per-config failure is recorded as an "error" entry and
bench_results.json is checkpointed after each section, so a budget kill
mid-run loses only the unfinished section.

Baselines are measured, not assumed: the reference publishes no numbers
(BASELINE.md — "the baseline must be established"), so each kernel is
compared against the pure-Python single-threaded oracle that defines
bit-exact correctness, measured at small n in the same run and scaled by
known complexity.

BENCH_SECTIONS=comma,list limits the run to named sections (rehearsals).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tpu")
# NTT 2^20 takes the composed-XLA path in the bench: the Bailey Pallas
# kernel's Mosaic compile exceeded 24 min in the round-3 rehearsal (remote
# compile, no cache).  Measure the Pallas NTT separately with
# OWSHEN_NTT_PALLAS_MIN_LOGN unset.
os.environ.setdefault("OWSHEN_NTT_PALLAS_MIN_LOGN", "22")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("OWSHEN_PROVE_LOG", "1")  # per-jit compile milestones

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


def timed(fn, *args, iters: int = 2):
    """Warm-up once (compile), then best of `iters` runs (readback-synced)."""
    _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _save(results):
    """Incremental checkpoint of the results artifact: if the driver's
    budget kills the process mid-bench, everything measured so far is
    already on disk."""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_results.json"), "w") as fh:
        json.dump(results, fh, indent=1, default=float)


_ONLY = [s for s in os.environ.get("BENCH_SECTIONS", "").split(",") if s]


def _enabled(name: str) -> bool:
    return not _ONLY or any(name.startswith(p) for p in _ONLY)


def _section(results, name):
    """Context: run the block, record an 'error' entry on failure,
    checkpoint the artifact either way."""
    class _Ctx:
        def __enter__(self):
            self.t0 = time.time()
            log(f"--- {name} (t+{self.t0 - T_START:.0f}s)")
            return self

        def __exit__(self, et, ev, tb):
            if et is not None:
                results[name] = {"error": f"{et.__name__}: {ev}"}
                log(f"{name} FAILED: {et.__name__}: {ev}")
            if isinstance(results.get(name), dict):
                # provenance stamp: a BENCH_SECTIONS subset run merges with
                # the previous artifact, so each section records which run
                # actually measured it (round-4 advisor finding)
                results[name]["run"] = RUN_ID
            _save(results)
            return et is not None  # swallow but RECORD — failure is loud

    return _Ctx()


T_START = time.time()
RUN_ID = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime(T_START))


def rand_scalars_np(n, bits=252):
    """Canonical uint32[n, 16] scalars < 2^bits (numpy, host-cheap)."""
    import numpy as np

    rng = np.random.RandomState(7)
    limbs = rng.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
    top_bits = bits - 15 * 16
    limbs[:, 15] &= (1 << max(top_bits, 0)) - 1
    return limbs


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    info = {"platform": dev.platform, "device": str(dev),
            "n_devices": len(jax.devices())}
    log(f"device: {info}")
    # merge with the previous artifact so a BENCH_SECTIONS subset run (or
    # a section lost to a transient tunnel error) doesn't wipe the other
    # sections' numbers
    results = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_results.json")) as fh:
            results = json.load(fh)
    except Exception:
        pass
    results["device"] = info
    rng = np.random.RandomState(0)
    t0 = time.time()
    _sync(jnp.zeros((8, 8), jnp.uint32) + 1)
    log(f"tunnel warmup: {time.time()-t0:.1f}s")

    from owshen_tpu.fields.field import FR, ints_to_array
    from owshen_tpu.oracle import curve as ocurve
    from owshen_tpu.oracle import hash as ohash

    def rand_fr(n):
        return ints_to_array(
            [int.from_bytes(rng.bytes(31), "big") % FR.p for _ in range(n)])

    # oracle G1 rate (shared by configs 4/5) — the same-run measured
    # denominator for every vs_baseline below.  MEDIAN of 16 samples: the
    # round-4 artifact's 4-sample mean swung 80-157 pts/s run-to-run,
    # making the config-5 multiple ±2× (round-4 verdict weak #8)
    o_samples = []
    for i in range(16):
        t0 = time.perf_counter()
        ocurve.G1.mul(ocurve.G1_GEN, (0x55AA << 200) + i * 12345 + (1 << 253))
        o_samples.append(1 / (time.perf_counter() - t0))
    o_samples.sort()
    o_pps = o_samples[len(o_samples) // 2]
    results["oracle_g1"] = {
        "oracle_pps_median": round(o_pps, 1),
        "oracle_pps_spread": [round(o_samples[0], 1),
                              round(o_samples[-1], 1)],
        "samples": len(o_samples), "run": RUN_ID}
    log(f"oracle G1 scalar-mul: median {o_pps:.0f} points/s "
        f"(spread {o_samples[0]:.0f}-{o_samples[-1]:.0f}, n=16)")

    # ---- config 4 FIRST: Pippenger MSM 2^22 (the headline metric) --------
    from owshen_tpu.curves import bn254
    from owshen_tpu.ops.msm import msm

    msm_out = None
    if _enabled("msm"):
        for log_npts in (22,):
            name = f"msm_g1_2^{log_npts}"
            with _section(results, name):
                n = 1 << log_npts
                base = bn254.g1_encode([ocurve.G1.mul(ocurve.G1_GEN, k + 1)
                                        for k in range(1 << 10)])
                pts = tuple(
                    jnp.tile(a, (n >> 10, 1) if a.ndim == 2 else (n >> 10,))
                    for a in base)
                sc = jnp.asarray(rand_scalars_np(n))
                f = jax.jit(lambda p, s: msm(bn254.G1, p, s))
                dt = timed(f, pts, sc, iters=2)
                mpps = n / dt / 1e6
                vsb = (n / o_pps) / dt
                results[name] = {
                    "s": dt, "mpoints_per_s": mpps, "oracle_est_s": n / o_pps,
                    "vs_baseline": vsb}
                log(f"MSM G1 2^{log_npts}: {dt:.3f} s -> {mpps:.2f} Mpoints/s "
                    f"({vsb:,.0f}x oracle)")
                msm_out = {"metric": f"msm_g1_2^{log_npts}_mpoints_per_s",
                           "value": round(mpps, 3), "unit": "Mpoints/s",
                           "vs_baseline": round(vsb, 1)}
                del pts, sc
        if msm_out is not None:
            print(json.dumps(msm_out), flush=True)  # headline lands EARLY
        else:
            err = results.get("msm_g1_2^22", {}).get("error", "missing")
            print(json.dumps({"metric": "msm_g1", "value": 0.0,
                              "unit": "Mpoints/s", "vs_baseline": 0.0,
                              "error": err}), flush=True)

    # ---- config 3 SECOND: NTT 2^20 (zero driver-captured numbers after
    # three rounds — lands before any Groth16 compile can eat the budget) --
    if _enabled("ntt"):
        with _section(results, "ntt_2^20"):
            from owshen_tpu.oracle import ntt as ontt
            from owshen_tpu.ops.ntt import NttDomain

            log_n = 20
            dom = NttDomain(log_n)
            x = jnp.asarray(rand_fr(1 << 12))
            x = jnp.tile(x, (1 << 8, 1))
            ntt_fn = jax.jit(dom.ntt)
            dt = timed(ntt_fn, x, iters=2)
            xs_small = [int(v) for v in rng.randint(0, 1 << 30, size=1 << 10)]
            om = pow(FR.generator, (FR.p - 1) >> 10, FR.p)
            t0 = time.perf_counter()
            ontt.ntt(xs_small, om)
            o_small = time.perf_counter() - t0
            o_est = o_small * ((1 << log_n) * log_n) / ((1 << 10) * 10)
            results["ntt_2^20"] = {"s": dt, "oracle_est_s": o_est,
                                   "vs_baseline": o_est / dt}
            log(f"NTT 2^20: {dt*1e3:.1f} ms ({o_est/dt:,.0f}x oracle est)")

    # ---- config 5 THIRD: Groth16 withdraw-d16 prove (the ≥10× gate) ------
    if _enabled("groth16_withdraw") and os.environ.get(
            "BENCH_SKIP_GROTH16") != "1":
        with _section(results, "groth16_prove_withdraw_d16"):
            from owshen_tpu.circuits import pool
            from owshen_tpu.groth16 import groth16
            from owshen_tpu.ops.merkle import zero_hashes

            depth = 16
            secret, salt, amount, index = 111, 222, 999, 5
            com = pool.commitment_of(secret, salt, amount)
            zh = zero_hashes(depth, "poseidon")
            root = com
            sibs = []
            for lvl in range(depth):
                bit = (index >> lvl) & 1
                sib = zh[lvl]
                sibs.append(sib)
                root = (ohash.poseidon([sib, root]) if bit
                        else ohash.poseidon([root, sib]))
            wit = pool.WithdrawWitness(secret=secret, salt=salt, amount=amount,
                                       index=index, siblings=sibs)
            b = pool.withdraw_circuit(depth, wit, root=root, recipient=0xBEEF)
            t0 = time.perf_counter()
            pk, vk = groth16.setup(b)
            t_setup = time.perf_counter() - t0
            log(f"  setup {t_setup:.1f}s (t+{time.time()-T_START:.0f}s)")
            groth16.prove(pk, b)  # compile + fixed-table build
            log(f"  prove compiled (t+{time.time()-T_START:.0f}s)")
            t0 = time.perf_counter()
            proof = groth16.prove(pk, b)
            t_prove = time.perf_counter() - t0
            nul = pool.nullifier_of(secret, index)
            # publics: [root, nullifier, recipient, amount, token] — the
            # round-5 multi-token binding added `token` (native = 0)
            ok = groth16.verify(vk, [root, nul, 0xBEEF, amount, 0], proof)
            assert ok, "withdraw proof failed to verify"
            o_est = (3 * b.num_vars + pk.n_domain) / o_pps
            results["groth16_prove_withdraw_d16"] = {
                "constraints": len(b.constraints), "setup_s": t_setup,
                "prove_s": t_prove, "proofs_per_s": 1 / t_prove,
                "verify_ok": bool(ok), "oracle_est_s": o_est,
                "vs_baseline": o_est / t_prove}
            log(f"Groth16 withdraw d16 ({len(b.constraints)} constraints): "
                f"setup {t_setup:.1f}s, prove {t_prove:.2f}s "
                f"({1/t_prove:.2f} proofs/s, {o_est/t_prove:,.0f}x oracle est)")

    # ---- EdDSA batch verify (protocol hot path; never yet captured) ------
    if _enabled("eddsa"):
        with _section(results, "eddsa_batch_verify"):
            from owshen_tpu.curves import babyjubjub as jub
            from owshen_tpu.oracle import eddsa as oeddsa

            nv = 1 << 12
            sk = 987654321
            pkx, pky = oeddsa.to_pub(sk)
            R, s = oeddsa.sign(sk, 42, 1000)
            ax = jnp.tile(jnp.asarray(FR.encode([pkx])), (nv, 1))
            ay = jnp.tile(jnp.asarray(FR.encode([pky])), (nv, 1))
            rx = jnp.tile(jnp.asarray(FR.encode([R[0]])), (nv, 1))
            ry = jnp.tile(jnp.asarray(FR.encode([R[1]])), (nv, 1))
            msg = jnp.tile(jnp.asarray(FR.encode([1000])), (nv, 1))
            ss = jnp.tile(jnp.asarray(ints_to_array([s])), (nv, 1))
            vf = jax.jit(lambda *a: jub.eddsa_verify((a[0], a[1]), a[2],
                                                     (a[3], a[4]), a[5]))
            dt = timed(vf, ax, ay, msg, rx, ry, ss)
            t0 = time.perf_counter()
            for _ in range(3):
                oeddsa.verify((pkx, pky), 1000, R, s)
            orate = 3 / (time.perf_counter() - t0)
            results["eddsa_batch_verify"] = {
                "batch": nv, "s": dt, "verifies_per_s": nv / dt,
                "oracle_verifies_per_s": orate, "vs_baseline": nv / dt / orate}
            log(f"EdDSA batch verify {nv}: {dt*1e3:.1f} ms -> "
                f"{nv/dt:,.0f}/s ({nv/dt/orate:,.0f}x oracle)")

    # ---- configs 1/2: hash kernels + Merkle -------------------------------
    from owshen_tpu.ops import merkle
    from owshen_tpu.ops.hash import mimc_hash2, poseidon_hash2

    o_rates = {}
    if _enabled("hash"):
        for name, fn, ofn in (
            ("poseidon_hash2", jax.jit(poseidon_hash2),
             lambda a, b: ohash.poseidon([a, b])),
            ("mimc_hash2", jax.jit(mimc_hash2),
             lambda a, b: ohash.mimc7_multi([a, b])),
        ):
            with _section(results, name):
                # 2^20: at 2^16 the ~30-40 ms tunnel dispatch floor was
                # ~40% of the wall time (493K/s apparent vs 972K at 2^18,
                # 1.09M at 2^20) — this measures sustained throughput,
                # not dispatch latency
                n = 1 << 20
                x, y = jnp.asarray(rand_fr(256)), jnp.asarray(rand_fr(256))
                x = jnp.tile(x, (n >> 8, 1))
                y = jnp.tile(y, (n >> 8, 1))
                dt = timed(fn, x, y)
                rate = n / dt
                t0 = time.perf_counter()
                k = 20
                for i in range(k):
                    ofn(i + 1, i + 2)
                orate = k / (time.perf_counter() - t0)
                o_rates[name] = orate
                results[name] = {"batch": n, "s": dt, "hashes_per_s": rate,
                                 "oracle_hashes_per_s": orate,
                                 "vs_baseline": rate / orate}
                log(f"{name}: {rate:,.0f} hashes/s (oracle {orate:,.0f}/s, "
                    f"{rate/orate:,.0f}x)")

    if _enabled("merkle"):
        with _section(results, "mimc_merkle_root_2^20"):
            n_leaves = 1 << 20
            leaves = jnp.asarray(rand_fr(1 << 12))
            leaves = jnp.tile(leaves, (1 << 8, 1))
            root_fn = jax.jit(lambda lv: merkle.merkle_root(lv, "mimc"))
            dt = timed(root_fn, leaves, iters=1)
            o_est = (n_leaves - 1) / o_rates.get("mimc_hash2", 20.0)
            results["mimc_merkle_root_2^20"] = {
                "s": dt, "leaves_per_s": n_leaves / dt, "oracle_est_s": o_est,
                "vs_baseline": o_est / dt}
            log(f"mimc 20-level dense root (2^20 leaves): {dt*1e3:.1f} ms "
                f"({o_est/dt:,.0f}x oracle est)")

    if _enabled("smt"):
        with _section(results, "smt_2^16_batch_insert"):
            smt = merkle.SparseMerkleTree(16, "poseidon")
            k_ins = 4096
            idxs = jnp.asarray(rng.choice(1 << 16, size=k_ins, replace=False)
                               .astype(np.int32))
            vals = jnp.asarray(rand_fr(k_ins))
            dt = timed(lambda nd, i, v: smt._insert_fn(nd, i, v),
                       smt.nodes, idxs, vals)
            o_est = k_ins * 16 / o_rates.get("poseidon_hash2", 20.0)
            results["smt_2^16_batch_insert"] = {
                "batch": k_ins, "s": dt, "leaves_per_s": k_ins / dt,
                "oracle_est_s": o_est, "vs_baseline": o_est / dt}
            log(f"SMT depth-16 batch insert {k_ins}: {dt*1e3:.1f} ms -> "
                f"{k_ins/dt:,.0f} leaves/s ({o_est/dt:,.0f}x oracle est)")

    # ---- config 5b LAST: deposit prove (265 constraints — dispatch-bound
    # at this size; recorded for completeness after everything else) -------
    if _enabled("groth16_deposit") and os.environ.get(
            "BENCH_SKIP_GROTH16") != "1":
        with _section(results, "groth16_prove_deposit"):
            from owshen_tpu.circuits import pool
            from owshen_tpu.groth16 import groth16

            w = pool.DepositWitness(secret=12345, salt=67890, amount=1000)
            com = pool.commitment_of(w.secret, w.salt, w.amount)
            b = pool.deposit_circuit(w)
            t0 = time.perf_counter()
            pk, vk = groth16.setup(b)
            t_setup = time.perf_counter() - t0
            groth16.prove(pk, b)  # compile
            t0 = time.perf_counter()
            proof = groth16.prove(pk, b)
            t_prove = time.perf_counter() - t0
            # publics: [commitment, amount, token] (round-5 multi-token)
            ok = groth16.verify(vk, [com, w.amount, 0], proof)
            assert ok, "deposit proof failed to verify"
            m = b.num_vars
            o_est = (3 * m + pk.n_domain) / o_pps
            results["groth16_prove_deposit"] = {
                "constraints": len(b.constraints), "setup_s": t_setup,
                "prove_s": t_prove, "proofs_per_s": 1 / t_prove,
                "verify_ok": bool(ok), "oracle_est_s": o_est,
                "vs_baseline": o_est / t_prove}
            log(f"Groth16 deposit ({len(b.constraints)} constraints): "
                f"setup {t_setup:.1f}s, prove {t_prove:.2f}s "
                f"({1/t_prove:.2f} proofs/s, {o_est/t_prove:,.0f}x oracle est)")

    results["total_bench_s"] = time.time() - T_START
    _save(results)
    log(f"total bench time: {results['total_bench_s']:.0f}s")

    if msm_out is None:
        err = results.get("msm_g1_2^22", {}).get("error", "missing")
        msm_out = {"metric": "msm_g1", "value": 0.0, "unit": "Mpoints/s",
                   "vs_baseline": 0.0, "error": err}
    print(json.dumps(msm_out), flush=True)


if __name__ == "__main__":
    main()
