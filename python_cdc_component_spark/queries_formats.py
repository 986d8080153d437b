"""Driver-oracled queries for storage-layout and UDF-surface operators.

Three capability families that round 2 adds on top of the SURVEY §2
inventory:

- **Bucketed co-located join** (`bucketed_join_revenue`) — the
  storage-level shuffle remedy (SURVEY §4; the reference re-joins staged
  chunks on the PK every run, ``db_components/db_common/staging.py:216``).
  Both fact tables are persisted ``bucketBy(orderkey)`` and the join runs
  Exchange-free; a pytest plan guard asserts no shuffle on either side.
- **Grouped-aggregate Pandas UDF** (`grouped_agg_pandas_median`) — the
  third Pandas-UDF shape (scalar and grouped-map exist elsewhere): a
  whole-group Series→scalar aggregate over Arrow.  Median is chosen
  because it is order-independent (sort inside the UDF), so the result
  hash-matches DuckDB's ``quantile_cont`` exactly.  Scale note: grouped
  aggregates materialize each group in one worker — the JVM-side
  ``F.percentile`` is the unbounded-cardinality path; this entry is the
  custom-aggregate extension seam.
- **ORC round-trip** (`orc_roundtrip_events`) — column-format breadth:
  the engine's envelope survives a parquet→ORC→ORC-scan hop bit-exact
  (ORC is the other splittable columnar format a 100 TB lake actually
  contains; the scan still prunes columns and pushes predicates).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .operators.bucketing import write_bucketed, colocated_join
from .queries import query, _spark, _dec_sum
from .sources.events import read_events

# ---------------------------------------------------------------------------
# Bucketed co-located join (SURVEY §4 shuffle strategy)


@query("bucketed_join_revenue", """
SELECT o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""")
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join lineitem⋈orders via same-bucketed external tables: the join
    key shuffle is paid once at write time (8 buckets, one file each),
    then the SortMergeJoin reads co-located buckets with no Exchange.

    At 100 TB this is the difference between shuffling the fact table on
    every run and shuffling it once per ingest; the plan guard lives in
    ``tests/test_formats_bucketing.py``.
    """
    spark = _spark(spark)
    uid = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix="bucketed_join_")
    li = (spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
          .select(F.col("l_orderkey").alias("orderkey"),
                  "l_extendedprice", "l_discount"))
    orders = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
              .select(F.col("o_orderkey").alias("orderkey"),
                      "o_orderpriority"))
    lt, ot = f"li_bkt_{uid}", f"ord_bkt_{uid}"
    write_bucketed(li, lt, os.path.join(root, "li"), ["orderkey"])
    write_bucketed(orders, ot, os.path.join(root, "ord"), ["orderkey"])
    joined = colocated_join(spark, lt, ot, ["orderkey"])
    return (joined.groupBy("o_orderpriority")
            .agg(_dec_sum(F.col("l_extendedprice")
                          * (1 - F.col("l_discount")), "revenue"),
                 F.count(F.lit(1)).alias("n_items")))


# ---------------------------------------------------------------------------
# Grouped-aggregate Pandas UDF (§2.10 UDF surface, third shape)


def _median_udaf():
    """Whole-group median as a grouped-agg Pandas UDF (Series → scalar
    over Arrow) — order-independent (sorts inside), linear interpolation
    identical to DuckDB ``quantile_cont(x, 0.5)``.  Built lazily so
    importing this module never requires an active SparkSession."""
    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        import numpy as np
        return float(np.median(v.to_numpy(dtype="float64")))

    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return int(len(v))
    return median_udaf, count_udaf


@query("grouped_agg_pandas_median", """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""")
def grouped_agg_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a grouped-agg Pandas UDF (Series → scalar over
    Arrow).  The group is materialized in one worker — fine for bounded
    group counts (3 statuses here); unbounded-cardinality medians go
    through JVM-side ``F.percentile``/``approx_percentile`` instead
    (``percentiles_by_status``, ``approx_quantile_contract``)."""
    spark = _spark(spark)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    median, nrows = _median_udaf()
    # Spark disallows mixing pandas and JVM aggregates in one agg, so the
    # row count is a (trivial) pandas aggregate too.
    return (orders.groupBy("o_orderstatus")
            .agg(median(F.col("o_totalprice")).alias("median_price"),
                 nrows(F.col("o_totalprice")).alias("n_orders")))


# ---------------------------------------------------------------------------
# ORC round-trip (column-format breadth)


@query("orc_roundtrip_events", """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       epoch_ms(MAX(ts)) AS max_ts_ms
FROM events
GROUP BY event_type
""")
def orc_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events survive a parquet→ORC→scan hop bit-exact: the aggregate over
    the ORC copy equals the oracle over the original parquet.  ORC is
    splittable and columnar, so the re-scan still prunes to the three
    referenced columns and runs predicate pushdown like parquet."""
    spark = _spark(spark)
    out = tempfile.mkdtemp(prefix="orc_events_")
    # read_events probes the footer's timestamp unit (fixtures have
    # drifted NANOS→MICROS across driver versions) and exposes a stable
    # µs `ts` — the one events read path (sources/events.py).
    ev = read_events(spark, sf_dir).select(
        "event_id", "ts", "event_type", "value")
    ev.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (back.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 _dec_sum(F.col("value"), "sum_value"),
                 F.unix_millis(F.max("ts")).alias("max_ts_ms")))


@query("variant_shred_events", """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS max_k,
       CAST(COUNT(*) FILTER (WHERE json_extract_string(props, '$.missing')
                             IS NOT NULL) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
""")
def variant_shred_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding through Spark 4's VARIANT type: the
    JSON payload column parses once into a binary variant
    (``parse_json``) and typed paths extract JVM-side with
    ``try_variant_get`` — the open-lakehouse answer to per-query JSON
    string re-parsing (the reference stores Debezium's payload as plain
    JSON strings and re-walks them per access,
    ``debezium_core``'s converter keeps values as JSON text). Variant
    decode is columnar + whole-stage-codegen; absent paths yield NULL
    (priced by ``n_missing``), and all aggregates are exact integer
    sums so the DuckDB JSON oracle hash-matches."""
    spark = _spark(spark)
    v = read_events(spark, sf_dir).select(
        "event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "long")
    miss = F.try_variant_get("v", "$.missing", "string")
    return (v.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(k).cast("long").alias("sum_k"),
                  F.max(k).cast("long").alias("max_k"),
                  F.count(miss).cast("long").alias("n_missing")))


@query("xml_roundtrip_events", """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(MAX(epoch_ms(ts)) AS BIGINT) AS max_ts_ms
FROM events
GROUP BY event_type
""")
def xml_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events survive a parquet→XML→XML-scan hop value-exact (Spark 4
    ships the XML source built in — the third interchange format after
    CSV/JSONL on the egress surface). Timestamps cross as epoch-ms
    longs (XML has no native timestamp lexical guarantee across
    writers) and the read-back uses an EXPLICIT schema — XML inference
    would widen longs/doubles from text. Doubles round-trip exactly:
    the writer emits Java's shortest-round-trip decimal form."""
    spark = _spark(spark)
    out = tempfile.mkdtemp(prefix="xml_events_")
    ev = read_events(spark, sf_dir).select(
        "event_id", F.unix_millis("ts").alias("ts_ms"),
        "event_type", "value")
    (ev.write.mode("overwrite").format("xml")
       .option("rowTag", "event").save(out))
    back = (spark.read.format("xml").option("rowTag", "event")
            .schema("event_id long, ts_ms long, event_type string, "
                    "value double")
            .load(out))
    return (back.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 _dec_sum(F.col("value"), "sum_value"),
                 F.max("ts_ms").cast("long").alias("max_ts_ms")))
