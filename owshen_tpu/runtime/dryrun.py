"""Multi-chip dry-run: compile + execute the distributed proving step on an
n-device mesh with the real shardings (SURVEY.md §2.4) on tiny shapes.

Budget discipline (the round-3 driver run hit rc=124 at ~10 min wall):
  * the parent process NEVER initializes jax/the TPU tunnel — the decision
    to spawn is made from sys.modules/env alone (__graft_entry__.py);
  * one distributed prove, not setup+2 proves (the single-chip equivalence
    gate lives in tests/test_dist.py::test_prove_dist);
  * every stage prints a timestamped line, so a timeout leaves a
    diagnostic tail instead of an empty artifact;
  * the subprocess reuses the persistent CPU compile cache
    (JAX_COMPILATION_CACHE_DIR) so warm driver runs skip XLA compiles.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_T0 = time.time()


def _stage(msg: str) -> None:
    print(f"[dryrun t+{time.time() - _T0:.0f}s] {msg}", flush=True)


def run(n_devices: int) -> None:
    """Assumes jax already initialized with >= n_devices devices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..curves import bn254
    from ..fields.field import FR, ints_to_array
    from ..oracle import curve as ocurve
    from ..oracle import ntt as ontt
    from ..ops import merkle
    from ..parallel.mesh import make_mesh
    from ..parallel.merkle_dist import merkle_root_dist
    from ..parallel.msm_dist import msm_dist
    from ..parallel.ntt_dist import DistNtt

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    mesh = make_mesh(n_devices)
    rng = np.random.RandomState(7)
    _stage(f"mesh up: {n_devices}x {jax.devices()[0].platform}")

    # --- distributed NTT (sequence-parallel analogue, all_to_all) ---
    log_n = 6
    n = 1 << log_n
    xs = [int(rng.randint(0, 1 << 30)) for _ in range(n)]
    dn = DistNtt(mesh, log_n)
    got = FR.decode(dn.ntt(jnp.asarray(FR.encode(xs))))
    want = ontt.ntt(xs, dn.omega)
    assert got == want, "DistNtt forward mismatch"
    back = FR.decode(dn.intt(jnp.asarray(FR.encode(got))))
    assert back == [x % FR.p for x in xs], "DistNtt inverse mismatch"
    _stage("DistNtt fwd/inv OK")

    # --- distributed MSM (data-parallel shards + ICI gather-reduce) ---
    n_pts = 2 * n_devices
    ks = [int(rng.randint(1, 1000)) for _ in range(n_pts)]
    scalars = [int(rng.randint(0, 1 << 62)) for _ in range(n_pts)]
    pts = [ocurve.G1.mul(ocurve.G1_GEN, k) for k in ks]
    acc = msm_dist(mesh, bn254.G1, bn254.g1_encode(pts),
                   ints_to_array(scalars), c=4, lanes=2)
    got_pt = bn254.g1_decode(tuple(x[None] for x in acc))[0]
    assert got_pt == ocurve.G1.msm(pts, scalars), "msm_dist mismatch"
    _stage("msm_dist OK")

    # --- distributed Merkle root (subtree partitioning + collective top) ---
    leaves = [int(rng.randint(0, 1 << 31)) for _ in range(8 * n_devices)]
    root = merkle_root_dist(mesh, jnp.asarray(FR.encode(leaves)), "poseidon")
    want_root = merkle.oracle_sparse_root(
        dict(enumerate(leaves)), (8 * n_devices - 1).bit_length(), "poseidon")
    assert FR.decode(root[None])[0] == want_root, "merkle_root_dist mismatch"
    _stage("merkle_root_dist OK")

    # --- distributed Groth16 prove: sharded MSMs over the mesh +
    # all_to_all NTT h-pipeline, verified by the host pairing check.  ONE
    # prove — the bit-exact single-chip equivalence is gated in
    # tests/test_dist.py::test_prove_dist, and a second prove here cost the
    # round-3 driver run its budget. ---
    from ..groth16 import groth16
    from ..groth16.r1cs import Builder

    b = Builder()
    y = b.pub(49)
    xvar = b.priv(7)
    b.enforce_eq(b.mul(xvar, xvar), y)
    for k in range(32):  # pad rows so the NTT domain (n=128) shards at d=8
        v = b.priv(k + 2)
        b.enforce_eq(b.mul(v, v), b.priv((k + 2) ** 2))
    assert b.check()
    _stage("dryrun circuit built (33 constraints)")
    pk, vk = groth16.setup(b, seed=b"dryrun")
    _stage("setup done")
    proof_d = groth16.prove(pk, b, seed=b"dr", msm_c=4, msm_lanes=2,
                            mesh=mesh)
    _stage("distributed prove done")
    assert groth16.verify(vk, [49], proof_d), "distributed proof rejected"
    _stage("verify OK")

    print(f"MULTICHIP OK: ntt/msm/merkle/groth16-prove distributed on "
          f"{n_devices} devices ({jax.devices()[0].platform})")


def run_subprocess(n_devices: int) -> None:
    """Spawn a clean python with the CPU mesh forced before jax import."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable TPU sitecustomize hook
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    # persistent CPU compile cache: cold compiles of the distributed prove
    # otherwise cost the driver's whole dryrun budget
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    code = (f"import sys; sys.path.insert(0, {repo!r}); "
            f"from owshen_tpu.runtime.dryrun import run; run({n_devices})")
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
