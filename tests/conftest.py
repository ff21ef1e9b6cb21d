from __future__ import annotations

import pytest

from docling_rag_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()
