"""Live JDBC integration for the snapshot source (S2/S3) against the
embedded Derby engine that ships with Spark — no external database or
extra packages needed. S5's information_schema scan is not exercised
here (Derby exposes SYS catalogs instead); it stays covered by unit
tests against the query builder."""

import pytest


def _connect(spark, url):
    return spark._jvm.java.sql.DriverManager.getConnection(url)


@pytest.fixture(scope="module")
def seeded_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "snapdb"
    url = f"jdbc:derby:{db};create=true"
    conn = _connect(spark, url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE items (id INT PRIMARY KEY, name VARCHAR(20), "
        "val DOUBLE)")
    ps = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
    for i in range(100):
        ps.setInt(1, i)
        ps.setString(2, f"item{i}")
        ps.setDouble(3, i * 1.5)
        ps.executeUpdate()
    st.close()
    ps.close()
    conn.close()
    return url


def test_snapshot_read_full(spark, seeded_url):
    from python_cdc_component_spark.sources.jdbc import snapshot_read
    df = snapshot_read(spark, seeded_url, "items")
    rows = {(r["ID"], r["NAME"]) for r in df.collect()}
    assert len(rows) == 100
    assert (0, "item0") in rows and (99, "item99") in rows


def test_snapshot_read_partitioned(spark, seeded_url):
    from python_cdc_component_spark.sources.jdbc import snapshot_read
    df = snapshot_read(spark, seeded_url, "items",
                       partition_column="ID", lower_bound=0,
                       upper_bound=100, num_partitions=4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100          # range splits cover every row once


def test_snapshot_statement_override(spark, seeded_url):
    from python_cdc_component_spark.sources.jdbc import snapshot_read
    df = snapshot_read(
        spark, seeded_url, "items",
        statement_override="SELECT id, val FROM items WHERE id < 10")
    got = df.collect()
    assert len(got) == 10
    assert set(df.columns) == {"ID", "VAL"}
