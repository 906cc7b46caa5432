"""Shared Spark fixture. One local session for the whole test run."""

from __future__ import annotations

import shutil

import pytest

from curator_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(master="local[8]", shuffle_partitions=8, app_name="curator_spark_tests")
    yield s
    s.stop()


@pytest.fixture()
def workdir(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)
