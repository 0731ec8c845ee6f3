import os
import sys

import pytest

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)

# Spark python workers inherit PYTHONPATH from the driver JVM; include the
# tests dir so closures referencing test-module symbols (e.g. detector
# factories passed to operators.tuning) unpickle on workers.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_TESTS_DIR, _REPO_ROOT, os.environ.get("PYTHONPATH", "")) if p
)


@pytest.fixture(scope="session")
def spark():
    from streamchange_spark.session import get_spark

    spark = get_spark(
        app_name="streamchange_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()
