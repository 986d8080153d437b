"""Wire-format parity against the reference's OWN Java test fixtures.

The reference's Kafka-Connect envelope converters are pinned by
``debezium_core/src/test/java/.../converter`` tests; this module replays
their EXACT resource fixtures (``initialSchema.json``, ``singleData.json``,
``dataArray.json``, ``singleData_extended.json``, ``schema_extended*.json``)
through ``sources/envelope.py`` and asserts the same table / row / type
decisions:

- ``DedupeDbConverterTest.simpleTest`` (type fidelity of one event),
- ``DedupeDbConverterTest.appendMoreData`` (MAX_CHUNK_SIZE=1 chunk
  rotation → per-chunk contents),
- ``AppendDbConverterTest.appendMoreData`` (append keeps every event),
- ``JsonConverterTest.updateSchema`` (drift detect → adjustSchema →
  merged column order + logical-timestamp decode).
"""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_cdc_component_spark.model.schema import merge_schemas
from python_cdc_component_spark.operators.dedup import dedup_latest
from python_cdc_component_spark.sources.chunks import read_epochs
from python_cdc_component_spark.sources.envelope import (
    connect_fields_to_struct, decode_logical, missing_columns,
    parse_envelope)

FIXTURES = ("/root/reference/debezium_core/src/test/resources/"
            "keboola/cdc/debezium/converter")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present")


def _fixture(name: str):
    with open(os.path.join(FIXTURES, name)) as fh:
        return json.load(fh)


def _envelope_df(spark, payloads: list[dict],
                 schema_name: str = "testcdc.inventory.products.Value"):
    rows = [(json.dumps({"schema": {"name": schema_name}, "payload": p}),)
            for p in payloads]
    return spark.createDataFrame(rows, "raw string")


def test_dedupe_converter_single_event_type_fidelity(spark):
    """DedupeDbConverterTest.simpleTest (16-45): one update event lands
    as one typed row — int32 id, double weight (incl. the dashed column
    name), string ops columns, int64 event timestamp — and the table
    identity comes from schema.name with the reference normalization."""
    fields = _fixture("initialSchema.json")
    payload = _fixture("singleData.json")
    out = parse_envelope(_envelope_df(spark, [payload]), "raw",
                         connect_fields_to_struct(fields))
    out = dedup_latest(out, ["id"],
                       order_by=[F.col("kbc__event_timestamp").desc()])
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["_table"] == "testcdc_inventory_products"
    assert r["id"] == 122 and r["name"] == "ccc"
    assert r["description"] == "hafanana"
    assert r["weight"] == 100.0 and r["weight-with-dash"] == 100.0
    assert r["kbc__operation"] == "u"
    assert r["kbc__event_timestamp"] == 1710349868992
    assert r["__deleted"] == "false"
    by_name = {f.name: f.dataType for f in out.schema.fields}
    assert by_name["id"] == T.IntegerType()
    assert by_name["weight"] == T.DoubleType()
    assert by_name["weight-with-dash"] == T.DoubleType()
    assert by_name["kbc__event_timestamp"] == T.LongType()
    assert by_name["__deleted"] == T.StringType()


def test_dedupe_converter_chunk_rotation(spark, tmp_path):
    """DedupeDbConverterTest.appendMoreData (47-94): with
    MAX_CHUNK_SIZE=1 the two events of dataArray.json land in chunk 0
    and chunk 1 respectively — the Spark analog is one epoch directory
    per chunk; each epoch holds exactly the row the Java test asserts,
    and the cross-chunk compaction (dedup over the epoch union in event
    order) keeps the chunk-1 state."""
    fields = _fixture("initialSchema.json")
    events = _fixture("dataArray.json")
    struct = connect_fields_to_struct(fields)
    root = str(tmp_path / "testTable")
    for i, ev in enumerate(events):          # MAX_CHUNK_SIZE=1 rotation
        (parse_envelope(_envelope_df(spark, [ev]), "raw", struct)
         .write.parquet(os.path.join(root, f"epoch_{i}")))

    chunk0 = spark.read.parquet(os.path.join(root, "epoch_0")).collect()
    assert len(chunk0) == 1
    assert (chunk0[0]["id"], chunk0[0]["name"], chunk0[0]["description"],
            chunk0[0]["weight"], chunk0[0]["kbc__operation"],
            chunk0[0]["kbc__event_timestamp"], chunk0[0]["__deleted"]) == (
        122, "oldName", "oldDescription", 0.012, "i", 1710349868992, "false")
    chunk1 = spark.read.parquet(os.path.join(root, "epoch_1")).collect()
    assert len(chunk1) == 1
    assert (chunk1[0]["id"], chunk1[0]["name"], chunk1[0]["description"],
            chunk1[0]["weight"], chunk1[0]["kbc__operation"],
            chunk1[0]["kbc__event_timestamp"], chunk1[0]["__deleted"]) == (
        122, "newName", "newDescription", 100.0, "u", 1710349898992, "false")

    # compaction over the chunk union → latest state only
    final = dedup_latest(
        read_epochs(spark, root), ["id"],
        order_by=[F.col("kbc__event_timestamp").desc()]).collect()
    assert len(final) == 1 and final[0]["name"] == "newName"


def test_append_converter_keeps_every_event(spark):
    """AppendDbConverterTest.appendMoreData: APPEND mode retains both
    envelope events as independent rows, in event order."""
    fields = _fixture("initialSchema.json")
    events = _fixture("dataArray.json")
    out = (parse_envelope(_envelope_df(spark, events), "raw",
                          connect_fields_to_struct(fields))
           .orderBy("kbc__event_timestamp").collect())
    assert [(r["name"], r["kbc__operation"], r["weight"]) for r in out] == [
        ("oldName", "i", 0.012), ("newName", "u", 100.0)]


def test_json_converter_update_schema(spark):
    """JsonConverterTest.updateSchema (17-66): the extended payload is
    detected as drifted (isMissingAnyColumn), the schema adjusts, and
    the merged column order matches ``schema_extended_expected.json`` —
    previous order preserved, dropped ``weight``/``weight-with-dash``
    staying IN PLACE as nullable, new ``timestamp_col`` appended last —
    while the logical int64 Timestamp decodes to the exact
    LocalDateTime the Java test asserts."""
    init_fields = _fixture("initialSchema.json")
    payload = _fixture("singleData_extended.json")
    ext_fields = _fixture("schema_extended.json")["fields"]
    expected = _fixture("schema_extended_expected.json")

    # drift probe: the payload carries a column the schema lacks
    assert missing_columns(payload, init_fields) == ["timestamp_col"]

    # adjustSchema: merge previous (initial) with the validation schema
    merged = merge_schemas(connect_fields_to_struct(init_fields),
                           connect_fields_to_struct(ext_fields))
    want_order = [f["field"] for f in expected if not f.get("orderEvent")
                  and f["field"] != "kbc__batch_event_order"]
    assert [f.name for f in merged.fields] == want_order
    by_name = {f.name: f for f in merged.fields}
    # dropped columns survive in place, nullable
    assert by_name["weight"].nullable and by_name["weight-with-dash"].nullable
    assert by_name["weight"].dataType == T.DoubleType()

    out = decode_logical(
        parse_envelope(_envelope_df(spark, [payload]), "raw", merged),
        ext_fields)
    r = out.collect()[0]
    assert r["id"] == 122 and r["name"] == "ccc"
    assert r["description"] == "hafanana"
    assert r["weight"] is None                       # not in the payload
    assert r["timestamp_col"] == datetime.datetime(2023, 1, 1, 12, 34, 56,
                                                   789000)
    assert r["kbc__operation"] == "u"
    assert r["kbc__event_timestamp"] == 1710349868992
    assert r["__deleted"] == "false"


def test_envelope_stream_tail(spark, tmp_path):
    """The wire parser is stream-ready: the reference's envelope events
    arrive as a JSON-lines tail (the shape a live Debezium/Kafka feed
    delivers), flow through readStream -> parse_envelope, and land as
    typed rows — tombstones (null payload / malformed JSON) dropped
    mid-stream, exactly like the batch path."""
    fields = _fixture("initialSchema.json")
    events = _fixture("dataArray.json")
    src = tmp_path / "tail"
    src.mkdir()
    lines = [json.dumps({"schema": {"name": "testcdc.inventory.products"
                                            ".Value"},
                         "payload": p}) for p in events]
    lines.insert(1, json.dumps({"schema": {"name": "x.y.Value"},
                                "payload": None}))    # tombstone
    lines.append("not json at all")                    # malformed line
    (src / "batch0.jsonl").write_text("\n".join(lines))

    stream = spark.readStream.format("text").load(str(src))
    parsed = parse_envelope(stream, "value",
                            connect_fields_to_struct(fields))
    got: list = []
    q = (parsed.writeStream
         .foreachBatch(lambda df, _id: got.extend(df.collect()))
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.awaitTermination(120)
    assert sorted((r["name"], r["kbc__operation"], r["weight"])
                  for r in got) == [("newName", "u", 100.0),
                                    ("oldName", "i", 0.012)]
    assert all(r["_table"] == "testcdc_inventory_products" for r in got)


def test_all_datatypes_wire_fixture_parity(spark):
    """AbstractDbConverterTest's all-data-types golden trio
    (allDataTypesSchema/allDataTypes/allDataTypesExpected.json): every
    field of the reference Java converter's expected output must fall
    out of parse_envelope + decode_logical —

    - nested struct/array values re-serialize as the SAME compact
      JSON strings (incl. the Point's explicit null srid), the
      'stringified, never decomposed' contract
      (AbstractDbConverter.java:194);
    - Timestamp/Date logical ints decode to the instants the Java
      java.sql formats render ('2023-01-01 12:34:56.0' / ISO date);
    - Time/MicroDuration/Bits/bytea/decimal-as-string pass through
      untouched, CHAR padding preserved."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    fields = _fixture("allDataTypesSchema.json")["fields"]
    payload = _fixture("allDataTypes.json")
    expected = _fixture("allDataTypesExpected.json")
    out = decode_logical(
        parse_envelope(
            _envelope_df(spark, [payload],
                         schema_name="testcdc.inventory.all_types.Value"),
            "raw", connect_fields_to_struct(fields)),
        fields)
    r = out.collect()[0]
    assert r["_table"] == "testcdc_inventory_all_types"

    special = {"timestamp_col", "date_col", "real_col"}
    for col, want in expected.items():
        if col in special:
            continue
        assert r[col] == want, col
    # Java java.sql.Timestamp.toString appends '.0'; the instant and
    # the day must match our typed decode under the UTC session
    assert r["timestamp_col"] == datetime.datetime(2023, 1, 1, 12, 34, 56)
    assert expected["timestamp_col"] == "2023-01-01 12:34:56.0"
    assert r["date_col"] == datetime.date(2023, 1, 1)
    assert expected["date_col"] == str(r["date_col"])
    # float32 wire value: equal at float precision
    import struct as _struct
    assert (_struct.unpack("f", _struct.pack("f", expected["real_col"]))[0]
            == r["real_col"])
    # the stringified-nested contract holds byte-for-byte
    assert r["point_col"] == expected["point_col"]
    assert r["array_col"] == expected["array_col"]
