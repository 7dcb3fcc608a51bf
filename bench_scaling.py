#!/usr/bin/env python
"""Mesh-scaling shape report on the virtual CPU mesh (d = 1 vs 2 vs 8).

Real multi-chip hardware is not reachable from this environment (one v5e
chip through a tunnel), so absolute multi-chip throughput cannot be
measured.  What CAN be measured — and what this script reports — is the
SHAPE of the distributed paths' overhead: per-op wall time of the sharded
kernels (DistNtt all_to_all, msm_dist shard+gather-reduce, distributed
dense Merkle root) at d = 1/2/8 on the XLA CPU mesh, normalized to d=1.
On real ICI the collective volume is identical (DistNtt moves the n·L·4 B
coefficient array once; msm_dist moves d×3 field elements), so a flat
curve here means the decomposition adds no superlinear collective cost.

Run:  OWSHEN_TPU_TESTENV=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py [--big]
Writes bench_scaling.json; not part of the driver bench budget.

--big runs REPRESENTATIVE shapes (VERDICT r3 #7): NTT 2^20 and MSM 2^20
(2^17 points/device at d=8 — the smallest size at which every shard still
routes to the production sorted engine; CPU wall time caps the size:
2^18/device costs hours on the XLA CPU mesh), where per-shard compute
amortizes the
per-window fixed costs that dominated the toy-size run (the d=8 MSM
"2.48x overhead" was 64 points/shard paying 16 windows of scan machinery
each).  Each entry also reports the op's analytic collective volume —
exact, since the decomposition fixes it: DistNtt all_to_all moves the full
n·L·4 B coefficient array once per transform; msm_dist all_gathers d
projective points (3·L·4 B each).  Writes bench_scaling_big.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8, (
        "run with the 8-device virtual CPU mesh (see module docstring)")

    from owshen_tpu.curves import bn254
    from owshen_tpu.fields.field import FR, ints_to_array
    from owshen_tpu.oracle import curve as ocurve
    from owshen_tpu.parallel.mesh import make_mesh
    from owshen_tpu.parallel.merkle_dist import merkle_root_dist
    from owshen_tpu.parallel.msm_dist import msm_dist
    from owshen_tpu.parallel.ntt_dist import DistNtt

    rng = np.random.RandomState(3)
    results = {}

    def timed(fn, *args, iters=3):
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    if "--big" in sys.argv:
        L = FR.L
        big = {}
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_scaling_big.json")

        def save():
            with open(path, "w") as fh:
                json.dump(big, fh, indent=1)

        # --- NTT 2^20: all_to_all volume = n*L*4 B per transform ---
        # XLA CPU runs this graph at ~0.2% of the chip rate (~5 min/call),
        # so each config is warm-up + ONE timed call and the artifact
        # checkpoints after every entry.
        if os.path.exists(path):
            with open(path) as fh:
                big = json.load(fh)  # keep prior sections on partial reruns
        log_n = 20
        n = 1 << log_n
        if "--msm-only" not in sys.argv:
            x_small = ints_to_array(
                [int(v) for v in rng.randint(0, 1 << 62, 1 << 12)])
            xs20 = jnp.tile(jnp.asarray(x_small), (1 << 8, 1))
            for d in (1, 8):
                dn = DistNtt(make_mesh(d), log_n)
                t = timed(dn.ntt, xs20, iters=1)
                big[f"ntt_2^20_d{d}"] = {
                    "s": t, "collective_bytes": n * L * 4,
                    "per_device_rows": n // d}
                save()
                print(f"ntt 2^20 d={d}: {t*1e3:.0f} ms", flush=True)
        # --- MSM 2^20 (2^17 points/device at d=8 -- the smallest size
        # where every shard still routes to the production sorted
        # engine): all_gather moves d*3*L*4 B ---
        log_m = 20
        m = 1 << log_m
        base = bn254.g1_encode(
            [ocurve.G1.mul(ocurve.G1_GEN, k + 1) for k in range(1 << 9)])
        ptsb = tuple(
            jnp.tile(a, (m >> 9, 1) if a.ndim == 2 else (m >> 9,))
            for a in base)
        sc_small = np.asarray(ints_to_array(
            [int(v) for v in rng.randint(1, 1 << 62, 1 << 12)]))
        scb = jnp.asarray(np.tile(sc_small, (m >> 12, 1)))
        for d in (1, 8):
            mesh = make_mesh(d)
            t = timed(lambda p, s: msm_dist(mesh, bn254.G1, p, s),
                      ptsb, scb, iters=1)
            big[f"msm_2^{log_m}_d{d}"] = {
                "s": t, "collective_bytes": d * 3 * L * 4,
                "per_device_points": m // d}
            save()
            print(f"msm 2^{log_m} d={d}: {t:.2f} s", flush=True)
        for key in ("ntt_2^20", f"msm_2^{log_m}"):
            if f"{key}_d1" not in big:
                continue
            t1 = big[f"{key}_d1"]["s"]
            if f"{key}_d8" in big:
                big[f"{key}_d8"]["overhead_vs_d1"] = (
                    big[f"{key}_d8"]["s"] / t1)
        save()
        print(json.dumps({"metric": f"mesh_overhead_d8_msm_2^{log_m}",
                          "value": round(
                              big[f"msm_2^{log_m}_d8"]["overhead_vs_d1"], 3),
                          "unit": "x_vs_d1"}), flush=True)
        return

    log_n = 12
    xs = ints_to_array([int(v) for v in rng.randint(0, 1 << 62, 1 << log_n)])
    n_pts = 64
    pts = bn254.g1_encode(
        [ocurve.G1.mul(ocurve.G1_GEN, k + 1) for k in range(n_pts)])
    sc = ints_to_array([int(v) for v in rng.randint(1, 1 << 62, n_pts)])
    leaves = ints_to_array([int(v) for v in rng.randint(0, 1 << 31, 256)])

    for d in (1, 2, 8):
        mesh = make_mesh(d)
        dn = DistNtt(mesh, log_n)
        t_ntt = timed(dn.ntt, jnp.asarray(xs))
        t_msm = timed(lambda p, s: msm_dist(mesh, bn254.G1, p, s, c=4,
                                            lanes=4), pts, sc)
        t_mk = timed(lambda lv: merkle_root_dist(mesh, lv, "poseidon"),
                     jnp.asarray(leaves))
        results[f"d={d}"] = {"ntt_2^12_s": t_ntt, "msm_64_s": t_msm,
                             "merkle_256_s": t_mk}
        print(f"d={d}: ntt {t_ntt*1e3:.1f} ms, msm {t_msm*1e3:.1f} ms, "
              f"merkle {t_mk*1e3:.1f} ms", flush=True)

    base = results["d=1"]
    for d in (2, 8):
        results[f"overhead_d={d}"] = {
            k: results[f"d={d}"][k] / base[k] for k in base}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_scaling.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"metric": "mesh_overhead_ratio_d8_ntt",
                      "value": round(results["overhead_d=8"]["ntt_2^12_s"], 3),
                      "unit": "x_vs_d1"}), flush=True)


if __name__ == "__main__":
    main()
