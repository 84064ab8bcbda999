from __future__ import annotations

import os

import pytest

from xena_gdc_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def run_cli_inprocess(*args: str):
    """Drive ``cli.main`` in-process against the shared test SparkSession.

    A real-subprocess invocation pays a fresh JVM + SparkSession boot
    (~15 s each; ~20 call sites dominated the suite's wall clock).
    ``main`` resolves its session via ``getOrCreate`` and never stops it,
    so the in-process call exercises the same code path minus the boot;
    the ``python -m`` surface stays covered by the subprocess smokes in
    test_cli_pipelines. CLI stderr is print()-based (no logging
    handlers), so redirect_stderr captures every error path; argparse
    exits surface as SystemExit with its code."""
    import contextlib
    import io
    import subprocess

    from xena_gdc_etl_spark import cli

    # Make sure the session getOrCreate hands the CLI is the test-scoped
    # one, even when a CLI test runs before any `spark` fixture.
    get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        try:
            rc = cli.main(list(args))
        except SystemExit as e:  # argparse error paths exit(2)
            rc = e.code if isinstance(e.code, int) else (0 if e.code is None else 2)
    return subprocess.CompletedProcess(args, rc, out.getvalue(), err.getvalue())
