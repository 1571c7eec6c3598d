from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccirecommenderdatapipeline_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: whole-registry sweeps (plan-fingerprint drift); minutes, "
        "not seconds — still part of the default run",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s
