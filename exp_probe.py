#!/usr/bin/env python
"""On-chip probe: per-scan-step overhead + composed-XLA vs Pallas add rates.

Round-4 design input: the round-3 driver artifact shows the deposit prove at
79.6 s while the component FLOP accounting predicts ~1 s — the gap must be
per-sequential-step overhead (scan iterations / tiny-op dispatch) through
the axon tunnel.  This probe measures it directly so the prover redesign
(precomputed fixed-point MSM with wide folds) is sized against reality.

Writes exp_probe.json; run on the real chip.
"""
import json
import os
import sys
import time

os.environ.setdefault("OWSHEN_NTT_PALLAS_MIN_LOGN", "22")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _sync(out):
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timed(fn, *args, iters=3):
    t0 = time.perf_counter()
    _sync(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return compile_s, min(ts)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    res = {}
    t0 = time.time()
    _sync(jnp.zeros((8, 8), jnp.uint32) + 1)
    res["warmup_s"] = time.time() - t0
    log(f"warmup {res['warmup_s']:.1f}s; device {jax.devices()[0]}")

    from owshen_tpu.curves import bn254
    from owshen_tpu.fields.field import FR
    from owshen_tpu.oracle import curve as ocurve

    rng = np.random.RandomState(0)

    def rand_pts(n):
        base = bn254.g1_encode([ocurve.G1.mul(ocurve.G1_GEN, k + 1)
                                for k in range(min(n, 64))])
        reps = n // min(n, 64)
        return tuple(jnp.tile(a, (reps, 1) if a.ndim == 2 else (reps,))
                     for a in base)

    # --- A: scan-step overhead: K-step scan of a batch-B G1 add ---
    from owshen_tpu.curves.weierstrass import pallas_min_rows

    for B in (8, 512, 16384):
        pts = rand_pts(B)
        for K in (32, 256):
            def fn(p, K=K):
                def body(acc, _):
                    return bn254.G1.add(acc, p), None
                with pallas_min_rows(1 << 30):  # composed XLA
                    acc, _ = jax.lax.scan(body, p, None, length=K)
                return acc
            c, t = timed(jax.jit(fn), pts)
            res[f"scan_xla_B{B}_K{K}"] = {"compile_s": c, "s": t,
                                          "per_step_ms": t / K * 1e3}
            log(f"XLA scan B={B} K={K}: compile {c:.1f}s run {t*1e3:.1f}ms "
                f"-> {t/K*1e3:.3f} ms/step")
    # Pallas variant at wide batch
    for B in (16384,):
        pts = rand_pts(B)
        for K in (32, 256):
            def fn(p, K=K):
                def body(acc, _):
                    return bn254.G1.add(acc, p), None
                with pallas_min_rows(1):
                    acc, _ = jax.lax.scan(body, p, None, length=K)
                return acc
            c, t = timed(jax.jit(fn), pts)
            res[f"scan_pallas_B{B}_K{K}"] = {"compile_s": c, "s": t,
                                             "per_step_ms": t / K * 1e3}
            log(f"Pallas scan B={B} K={K}: compile {c:.1f}s run {t*1e3:.1f}ms "
                f"-> {t/K*1e3:.3f} ms/step")

    # --- B: dispatch floor: tiny jit called back-to-back ---
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.uint32)
    _sync(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        _sync(f(x))
    res["dispatch_floor_ms"] = (time.perf_counter() - t0) / 20 * 1e3
    log(f"dispatch floor {res['dispatch_floor_ms']:.1f} ms")

    # --- C: big flat gather rate (table-MSM shape: 1M rows of 48/128 u32) ---
    for rows, width in ((1 << 20, 48), (1 << 20, 128)):
        tab = jnp.zeros((1 << 22, width), jnp.uint32)
        idx = jnp.asarray(rng.randint(0, 1 << 22, size=rows).astype(np.int32))
        g = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=0))
        c, t = timed(g, tab, idx)
        res[f"gather_{rows}x{width}"] = {"compile_s": c, "s": t,
                                         "ns_per_row": t / rows * 1e9}
        log(f"gather {rows}x{width}: {t*1e3:.1f}ms ({t/rows*1e9:.0f} ns/row)")

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "exp_probe.json"), "w") as fh:
        json.dump(res, fh, indent=1, default=float)
    log("probe done")


if __name__ == "__main__":
    main()
