"""S1/S6 executable verification on embedded Derby (ships in Spark's jars
— no network, no external service).

The reference's JDBC surface is a fetchsize-tuned full-table scan
(sync.py:68-82) plus an out-of-band COUNT(*) pushed to the database
(sync.py:45-55). Here both run for real: Spark writes a table into an
embedded Derby database, JdbcSource reads it back (plain and partitioned)
and pushes the count down as a subquery.
"""

from __future__ import annotations

import pytest

from lcr_etl_upgrade_spark.sources.registry import JdbcSource

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/testdb;create=true"
    src = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(200)],
        ["id", "name", "amount"],
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "people")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_plain_scan_roundtrip(spark, derby_url):
    source = JdbcSource(
        url=derby_url, table="people", properties={"driver": DRIVER}
    )
    df = source.load(spark)
    assert df.count() == 200
    rows = {r.id: (r.name, r.amount) for r in df.collect()}
    assert rows[7] == ("name_7", 10.5)


def test_jdbc_partitioned_scan(spark, derby_url):
    """partitionColumn/lower/upper/numPartitions produce a multi-partition
    scan with the same contents — the 100 TB read shape."""
    source = JdbcSource(
        url=derby_url,
        table="people",
        properties={"driver": DRIVER},
        partition_column="id",
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
    )
    df = source.load(spark)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    assert sorted(r.id for r in df.collect()) == list(range(200))


def test_jdbc_count_pushdown(spark, derby_url):
    source = JdbcSource(
        url=derby_url, table="people", properties={"driver": DRIVER}
    )
    assert source.count_pushdown(spark) == 200


def test_jdbc_liveness_probe(spark, derby_url, tmp_path):
    """SELECT-1-style probe: true on a live database, false (not raise)
    on a dead one — the reference's orchestration precondition."""
    derby_probe = "(SELECT 1 AS probe_ok FROM SYSIBM.SYSDUMMY1) t"
    live = JdbcSource(url=derby_url, table="people", properties={"driver": DRIVER})
    assert live.probe(spark, probe_query=derby_probe) is True
    dead = JdbcSource(
        # create=true omitted: connecting to a nonexistent Derby db fails
        url=f"jdbc:derby:{tmp_path}/no_such_db",
        table="people",
        properties={"driver": DRIVER},
    )
    assert dead.probe(spark, probe_query=derby_probe) is False


def test_jdbc_fetchsize_applied(spark, derby_url):
    """fetchsize is plumbed into the reader options (the reference's one
    JDBC tuning knob, sync.py:74)."""
    source = JdbcSource(
        url=derby_url, table="people", properties={"driver": DRIVER}, fetchsize=50
    )
    df = source.load(spark)
    assert df.count() == 200
