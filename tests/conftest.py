from __future__ import annotations

import pytest

from cerberus_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=8, driver_memory="8g", app_name="cerberus_spark_tests")
    yield s
    s.stop()
