from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("PTS_SHUFFLE_PARTITIONS", "4")

from polars_trading_spark.session import get_spark  # noqa: E402
from polars_trading_spark.config import Config  # noqa: E402

SF_DIR = os.environ.get("PTS_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "streaming: the full streaming-operator matrix "
        "(cross-batch equality + end-to-end flagship chain smoke); "
        "run with `pytest -m streaming`",
    )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pts-tests")
    yield spark


@pytest.fixture(autouse=True)
def _reset_config():
    Config.reset()
    yield
    Config.reset()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
