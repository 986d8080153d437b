"""Timestamp-unit drift regression net: the events source must produce
IDENTICAL ``ts_ns``/``ts`` whatever physical unit the fixture stores
``ts`` in (the driver's generator has already drifted NANOS→MICROS
between rounds; this pins every unit the footer probe handles)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from python_cdc_component_spark.sources.events import (
    read_events, ts_to_ns_factor)

_TS_NS = [1_706_659_108_684_000_000, 1_706_000_000_123_000_000]
_ROWS = {
    "event_id": [1, 2],
    "user_id": [10, 20],
    "event_type": ["click", "view"],
    "value": [1.5, 2.5],
    "props": ['{"k":1}', '{"k":2}'],
}


def _write(tmp_path, name, ts_array):
    d = str(tmp_path / name)
    os.makedirs(d)
    table = pa.table({
        "event_id": pa.array(_ROWS["event_id"], pa.int64()),
        "ts": ts_array,
        "user_id": pa.array(_ROWS["user_id"], pa.int64()),
        "event_type": pa.array(_ROWS["event_type"]),
        "value": pa.array(_ROWS["value"], pa.float64()),
        "props": pa.array(_ROWS["props"]),
    })
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("unit,factor", [
    ("ms", 1_000_000), ("us", 1_000), ("ns", 1)])
def test_read_events_normalizes_every_timestamp_unit(spark, tmp_path,
                                                     unit, factor):
    vals = [t // factor for t in _TS_NS]
    arr = pa.array(vals, pa.timestamp(unit))
    d = _write(tmp_path, f"u_{unit}", arr)
    assert ts_to_ns_factor(os.path.join(d, "events.parquet")) == factor
    got = {r["event_id"]: (r["ts_ns"], r["ts"])
           for r in read_events(spark, d).collect()}
    for eid, want_ns in zip(_ROWS["event_id"], _TS_NS):
        ns, ts = got[eid]
        assert ns == want_ns
        # µs timestamp view agrees regardless of the storage unit
        assert int(ts.timestamp() * 1_000_000) * 1000 == want_ns


def test_read_events_plain_int64_is_taken_as_nanos(spark, tmp_path):
    """Test fixtures written from a long `ts_ns` column carry no logical
    type — the probe must default to nanos (the historical contract)."""
    arr = pa.array(_TS_NS, pa.int64())
    d = _write(tmp_path, "u_int64", arr)
    assert ts_to_ns_factor(os.path.join(d, "events.parquet")) == 1
    got = {r["event_id"]: r["ts_ns"]
           for r in read_events(spark, d).collect()}
    assert got == dict(zip(_ROWS["event_id"], _TS_NS))
