from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

_LC_TEST = "test_barrier_training_across_executor_jvms"


def pytest_collection_modifyitems(config, items):
    """Overlap the local-cluster deployment test with the whole suite.

    That test spends ~40s in a SUBPROCESS (its own Spark master — it
    cannot share the fixture JVM), which is pure wall-clock overlap
    opportunity: launch the subprocess as soon as collection shows the
    test will run, let every other test execute while the cluster
    spins/trains, and have the test itself only join + assert. A
    targeted run that doesn't select the test never launches it.

    Guards (r9 ADVICE): -k/-m deselection runs AFTER this hook and
    --collect-only never executes tests, so in those modes we skip the
    eager launch (the test falls back to a synchronous subprocess) —
    otherwise a deselected test would orphan a ~40s JVM with an unread
    stdout pipe. pytest_unconfigure below reaps the process if the run
    aborts before the test consumes it."""
    opt = config.option
    if getattr(opt, "collectonly", False):
        return
    if getattr(opt, "keyword", "") or getattr(opt, "markexpr", ""):
        return
    if any(it.name == _LC_TEST for it in items):
        import subprocess

        from tests.test_local_cluster import _SCRIPT

        config._lc_proc = subprocess.Popen(
            [sys.executable, "-c", _SCRIPT],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )


def pytest_unconfigure(config):
    """Reap the local-cluster subprocess if the test never joined it
    (deselection after launch, skip, or an -x abort earlier in the
    suite) — otherwise the JVM outlives pytest and can block on a full
    unread stdout pipe."""
    proc = getattr(config, "_lc_proc", None)
    if proc is not None and proc.returncode is None:
        proc.kill()
        try:
            proc.communicate(timeout=30)
        except Exception:
            pass


@pytest.fixture(scope="session")
def spark():
    from pyspark_xgboost_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s
    s.stop()
