import os
import runpy
import sys

import pytest

# protobuf shim (tools/pbcompat): the transformWithStateInPandas e2e
# needs google.protobuf, absent from this container but present as a
# pure-Python runtime inside the google-cloud-sdk install. Activate the
# shim in THIS (driver) process now, and export it on PYTHONPATH before
# the session fixture builds a SparkContext so executor Python workers
# pick it up via their sitecustomize import. No-ops everywhere protobuf
# is properly installed.
_PBCOMPAT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "pbcompat")
runpy.run_path(os.path.join(_PBCOMPAT, "sitecustomize.py"))
if _PBCOMPAT not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        _PBCOMPAT + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(
        os.pathsep)

from felixzh_flink_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
