"""SparkSession factory tuned for the engine.

Local-mode defaults mirror the scale knobs the reference exposes
(reference ``db_components/debezium/executor.py:37-45`` DuckDB memory/thread
PRAGMAs; ``staging.py:135-151``): on Spark the equivalents are shuffle
partitioning, AQE, and Arrow transfer. On a real cluster the same builder
is used with ``master`` unset (taken from spark-submit) and
``spark.sql.shuffle.partitions`` sized to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "python_cdc_component_spark",
              cpus: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    Scale notes (100 TB design): every setting here is also correct on a
    1000-executor cluster — AQE handles skew joins and post-shuffle
    coalescing at any scale; UTC session TZ keeps event-time semantics
    deterministic across executors; Arrow is required for the Pandas-UDF
    operators in ``operators.llm``.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the one spill knob the dedup scale curve needs (SCALING.md):
        # bound bytes per input split so the per-task partial
        # WindowGroupLimit sort stays in memory at any corpus size.
        # 128 MB is Spark's default, pinned here so cluster-profile
        # overrides are explicit; tune DOWN for very wide rows.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES",
                               "134217728"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
