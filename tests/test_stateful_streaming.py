"""applyInPandasWithState keyed-dedup operator test."""

import os
import shutil

from pyspark.sql import functions as F

from python_cdc_component_spark.model.envelope import SYSTEM_COLUMNS as SC
from python_cdc_component_spark.operators.dedup import dedup_latest
from python_cdc_component_spark.sources.events import read_cdc_events
from python_cdc_component_spark.streaming.bounded import read_event_stream
from python_cdc_component_spark.streaming.stateful import (
    streaming_dedup_latest)


def test_stateful_dedup_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "p0.parquet"))

    stream = read_event_stream(spark, src)
    ddl = f"user_id long, {SC.pos} long, value double, event_type string"
    out = streaming_dedup_latest(stream, "user_id", SC.pos, ddl)

    sink = str(tmp_path / "sink")

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (out.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    # update-mode emits per micro-batch; the final state per key is the
    # row with max pos among emissions
    got_df = spark.read.parquet(sink)
    got = {(r.user_id, r[SC.pos])
           for r in dedup_latest(got_df, ["user_id"],
                                 order_by=[F.col(SC.pos).desc()]).collect()}
    expected = {(r.user_id, r[SC.pos])
                for r in dedup_latest(read_cdc_events(spark, sf_dir),
                                      ["user_id"]).collect()}
    assert got == expected


def test_stateful_dedup_parameterized_type_ddl(spark, sf_dir, tmp_path):
    """DDL with comma-bearing types (decimal(10,2)) must parse into the
    right column list (ADVICE r1: naive split(',') shredded these)."""
    src = str(tmp_path / "src_ddl")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "p0.parquet"))
    stream = read_event_stream(spark, src)
    ddl = f"user_id long, {SC.pos} long, value decimal(10,2)"
    out = streaming_dedup_latest(stream, "user_id", SC.pos, ddl)
    assert out.schema.fieldNames() == ["user_id", SC.pos, "value"]
