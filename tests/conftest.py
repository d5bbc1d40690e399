from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from imagor_spark.engine.session import get_spark

    s = get_spark(app_name="imagor-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
