"""Test configuration: run on a virtual 8-device CPU mesh.

Real multi-chip hardware is not available in CI; sharding tests use
XLA's host-platform device-count override.

Note: the environment may pre-register an external TPU plugin from
``sitecustomize`` and force ``jax_platforms`` at interpreter start, so the
``JAX_PLATFORMS`` env var alone is not sufficient — we also override the
config after importing jax.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite compiles hundreds of programs on
# one CPU core; caching makes reruns dramatically faster
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

_mods_seen: set[str] = set()

_counts = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}


def pytest_runtest_logreport(report):
    if report.when == "call":
        if report.passed:
            _counts["passed"] += 1
        elif report.failed:
            _counts["failed"] += 1
        elif report.skipped:
            _counts["skipped"] += 1
    elif report.failed:  # setup/teardown error
        _counts["errors"] += 1
    elif report.skipped and report.when == "setup":
        _counts["skipped"] += 1


def pytest_sessionfinish(session, exitstatus):
    """Write a self-proving run summary BEFORE interpreter teardown.

    This environment's exit-time crash family (stale XLA:CPU AOT cache /
    TPU-plugin teardown — CLAUDE.md) can kill the process after the last
    test but before pytest's terminal summary flushes, leaving a run
    with every dot green but no "N passed" line.  This hook runs inside
    the session, so `TESTS_LAST_RUN.json` survives the crash and is the
    suite's citable artifact (VERDICT r3 item 8)."""
    import json
    import time

    out = dict(_counts)
    out["exitstatus"] = int(getattr(exitstatus, "value", exitstatus))
    out["when"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "TESTS_LAST_RUN.json")
    with open(path, "w") as f:
        json.dump(out, f)
        f.write("\n")
        f.flush()
        os.fsync(f.fileno())


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_module(request):
    """Release compiled executables between test modules.

    A single pytest session accumulates hundreds of live XLA:CPU
    executables; observed (three separate runs on this host) late
    -session SIGSEGVs inside `backend_compile_and_load` / the
    compilation-cache zstandard path that never reproduce when the same
    tests run in a fresh process.  Dropping executables at module
    boundaries keeps the live-code footprint bounded; the persistent
    on-disk cache makes the re-loads cheap."""
    mod = request.node.nodeid.split("::", 1)[0]
    if mod not in _mods_seen:
        _mods_seen.add(mod)
        jax.clear_caches()
    yield
