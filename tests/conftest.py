from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# transformWithStateInPandas needs the google.protobuf runtime in BOTH
# the driver and the python workers; tools/pbshim/sitecustomize.py
# provides it from the on-box SDK bundle when no real install exists.
# PYTHONPATH must carry the shim BEFORE the JVM starts: local-mode
# worker daemons inherit the environment captured at JVM launch.
_PBSHIM = os.path.join(_REPO, "tools", "pbshim")
os.environ["PYTHONPATH"] = (
    _PBSHIM + os.pathsep + os.environ.get("PYTHONPATH", "")
)
sys.path.insert(0, _PBSHIM)
import sitecustomize  # noqa: E402,F401  (applies the shim to the driver)

from meta_iterative_mapreduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("MIMR_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mimr-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
