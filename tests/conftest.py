"""Test configuration: force an 8-device virtual CPU platform.

Tests never need real TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (SURVEY.md section 4's "fake backend" strategy).
Must run before jax initializes its backends.
"""

import os

# The shell env pins JAX_PLATFORMS=axon (the real TPU) and the axon
# sitecustomize imports jax at interpreter start, so env edits alone are too
# late - override through jax.config after import instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, (
    "tests require the 8-device virtual CPU platform; got "
    f"{jax.devices()}"
)

import subprocess  # noqa: E402
import sys  # noqa: E402
import time  # noqa: E402

import pytest  # noqa: E402

from carla_ppo_tpu.envs import track as track_mod  # noqa: E402
from carla_ppo_tpu.envs.types import EnvParams  # noqa: E402


@pytest.fixture(scope="session")
def lap_track():
    return track_mod.make_lap_track(seed=0)


@pytest.fixture(scope="session")
def lap_params(lap_track):
    return EnvParams(track=lap_track)


# ---------------------------------------------------------------------------
# Crash-proofing the full-suite gate (round-4 VERDICT item 1).
#
# Observed failure: `pytest tests/ -q -m "not slow"` died DETERMINISTICALLY
# (SIGSEGV x3 / SIGABRT x1 across judge runs, reproduced here) inside XLA:CPU
# native compile/cache-load of the dp pixel program - always at the ~246th
# test (test_pixel_trainer_dp), never in isolation, never at file scope. The
# trigger is ~230 prior tests' accumulated in-process XLA state (hundreds of
# live CPU executables + two LLVM-bearing extensions, jaxlib and torch, in
# one process). Two structural defenses, so the gate is green on ANY machine
# regardless of where a particular jaxlib build's threshold lies:
#
# 1. jax.clear_caches() after every test MODULE bounds live-executable
#    accumulation (the persistent on-disk compile cache makes the forced
#    recompiles cheap cache loads).
# 2. Tests marked `isolated` (the observed crasher, and any future test that
#    compiles the big dp pixel program) run in a FRESH subprocess: a native
#    crash there fails that one test with a readable report instead of
#    killing the whole gate.
# ---------------------------------------------------------------------------

_ISOLATED_NODEIDS = {
    # The deterministic full-suite crasher (XLA:CPU compile of the 8-device
    # dp pixel program after ~230 prior tests).
    "tests/test_trainer.py::test_pixel_trainer_dp",
}

_IN_SUBPROCESS_ENV = "CARLA_PPO_ISOLATED_SUBPROCESS"


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_state():
    """Drop jit caches after each test module (defense 1 above)."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "isolated: run in a fresh subprocess (XLA native-state isolation)",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in _ISOLATED_NODEIDS:
            item.add_marker(pytest.mark.isolated)


def pytest_runtest_protocol(item, nextitem):
    if item.get_closest_marker("isolated") is None:
        return None
    if os.environ.get(_IN_SUBPROCESS_ENV):
        return None  # already inside the isolation subprocess
    from _pytest.reports import TestReport

    ihook = item.ihook
    ihook.pytest_runtest_logstart(nodeid=item.nodeid, location=item.location)
    env = dict(os.environ, **{_IN_SUBPROCESS_ENV: "1"})
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             item.nodeid],
            capture_output=True,
            text=True,
            env=env,
            cwd=str(item.config.rootpath),
            timeout=1800,
        )
        rc, out, err = proc.returncode, proc.stdout, proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1
        out = (e.stdout or b"").decode(errors="replace") if isinstance(
            e.stdout, bytes) else (e.stdout or "")
        err = "isolated subprocess timed out after 1800 s"
    duration = time.perf_counter() - t0
    outcome = "passed" if rc == 0 else "failed"
    longrepr = None
    if rc != 0:
        longrepr = (
            f"isolated subprocess exited {rc}\n"
            f"--- stdout (tail) ---\n{out[-8000:]}\n"
            f"--- stderr (tail) ---\n{err[-8000:]}"
        )
    report = TestReport(
        nodeid=item.nodeid,
        location=item.location,
        keywords={item.name: 1},
        outcome=outcome,
        longrepr=longrepr,
        when="call",
        duration=duration,
    )
    ihook.pytest_runtest_logreport(report=report)
    ihook.pytest_runtest_logfinish(nodeid=item.nodeid, location=item.location)
    return True
