"""schema_align / delete_rewrite / filters / routing operator tests."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_cdc_component_spark.model.envelope import SYSTEM_COLUMNS as SC
from python_cdc_component_spark.operators.delete_rewrite import (
    drop_tombstones, rewrite_deletes)
from python_cdc_component_spark.operators.filters import (
    apply_column_filter, drop_helper_columns, table_include_filter)
from python_cdc_component_spark.operators.routing import split_schema_changes
from python_cdc_component_spark.operators.schema_align import (
    align_to_schema, union_epochs)


def test_align_to_schema_pads_and_prunes(spark):
    df = spark.createDataFrame([(1, "x", 9.5)], ["id", "keep", "extra"])
    target = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("keep", T.StringType()),
        T.StructField("missing", T.DoubleType()),
    ])
    out = align_to_schema(df, target)
    assert out.columns == ["id", "keep", "missing"]
    row = out.collect()[0]
    assert row.missing is None and row.keep == "x"
    assert out.schema["missing"].dataType == T.DoubleType()


def test_union_epochs_pads_missing_columns(spark):
    e1 = spark.createDataFrame([(1, "a")], ["id", "v"])
    e2 = spark.createDataFrame([(2, "b", 1.5)], ["id", "v", "w"])
    out = union_epochs([e1, e2]).orderBy("id").collect()
    assert out[0].w is None and out[1].w == 1.5


def test_rewrite_deletes_uses_before_image(spark):
    rows = [
        ("c", "new", None),
        ("u", "upd", "old"),
        ("d", None, "gone"),
    ]
    df = spark.createDataFrame(rows, ["kbc__operation", "v", "before_v"])
    out = rewrite_deletes(df, ["v"]).orderBy("kbc__operation").collect()
    by_op = {r["kbc__operation"]: r for r in out}
    assert by_op["d"].v == "gone" and by_op["d"][SC.deleted] is True
    assert by_op["u"].v == "upd" and by_op["u"][SC.deleted] is False
    assert "before_v" not in out[0].asDict()


def test_drop_tombstones(spark):
    df = spark.createDataFrame(
        [("a", None), (None, "b"), (None, None)], ["before", "after"])
    assert drop_tombstones(df).count() == 2


def test_column_filter_include_exclude(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0, "op")], ["id", "name", "secret_metric", SC.operation])
    out = apply_column_filter(df, include=["id", "name", "secret.*"],
                              exclude=["secret.*"])
    assert out.columns == ["id", "name", SC.operation]  # system col protected


def test_drop_helper_columns(spark):
    df = spark.createDataFrame(
        [(1, 2, "u")], ["id", SC.BATCH_EVENT_ORDER, SC.OPERATION])
    assert drop_helper_columns(df).columns == ["id"]


def test_table_include_filter(spark):
    df = spark.createDataFrame([("t1", 1), ("t2", 2)], ["_table", "v"])
    assert table_include_filter(df, ["t1"]).collect()[0].v == 1


def test_split_schema_changes(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ALTER TABLE t ADD c INT")], ["id", "ddl"])
    data, ddl = split_schema_changes(df)
    assert {r.id for r in data.collect()} == {1, 2}
    assert {r.id for r in ddl.collect()} == {3}
