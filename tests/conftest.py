from __future__ import annotations

import os
import sys
import tempfile

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_the_net_crawler_spark.fixtures import write_fixtures
from map_the_net_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(app_name="mtn-tests", master="local[8]",
                   shuffle_partitions=1)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp
    sp.stop()


@pytest.fixture(scope="session")
def fixture_paths():
    """Small deterministic corpus for the heavier crawl tests."""
    d = tempfile.mkdtemp(prefix="mtn_fixtures_")
    return write_fixtures(d, n_domains=20)


@pytest.fixture(scope="session")
def fixture_frames(fixture_paths):
    return {k: pd.read_parquet(v) for k, v in fixture_paths.items()}


@pytest.fixture(scope="session")
def committed_fixdir():
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fixtures")
