from __future__ import annotations

import pytest

from pargraph_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pargraph-spark-tests", cores=4, shuffle_partitions=8,
                  extra_conf={"spark.ui.enabled": "false"})
    yield s
    s.stop()
