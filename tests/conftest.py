from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from lcr_etl_upgrade_spark.session import get_session

    spark = get_session("tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
