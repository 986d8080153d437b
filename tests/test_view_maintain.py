"""Streaming aggregate-view maintenance: after EVERY micro-batch the
maintained view must equal a full recompute over the compacted state —
through inserts, updates (group migration), deletes, re-inserts, and
float-hostile measures accumulated across many read-modify-write
cycles."""

import pytest

from python_cdc_component_spark.sinks.merge import MergeCompactor
from python_cdc_component_spark.streaming.view_maintain import StreamingAggView

SCHEMA = ("user_id long, grp string, value double, "
          "kbc__event_timestamp long, kbc__file string, kbc__pos long, "
          "__deleted boolean")


def _batch(spark, rows):
    return spark.createDataFrame(
        [(u, g, v, ts, "binlog.000001", pos, d)
         for (u, g, v, ts, pos, d) in rows], SCHEMA)


def _snap(df):
    return {tuple(r[k] for k in ("grp",)): (r["n_rows"], r["sum_value"])
            for r in df.collect()}


def test_view_tracks_state_through_batches(spark, tmp_path):
    comp = MergeCompactor(str(tmp_path / "state"), ["user_id"],
                          num_buckets=4)
    view = StreamingAggView(str(tmp_path / "view"), ["user_id"], ["grp"],
                            "value")
    batches = [
        # inserts
        [(1, "a", 0.1, 10, 1, False), (2, "a", 0.2, 10, 2, False),
         (3, "b", 0.3, 10, 3, False)],
        # update 1 (a→b migration), delete 3, insert 4
        [(1, "b", 1.1, 20, 4, False), (3, "b", 0.0, 20, 5, True),
         (4, "c", 0.7, 20, 6, False)],
        # re-insert 3, delete 4 (empties group c), touch 2 in place
        [(3, "a", 0.9, 30, 7, False), (4, "c", 0.0, 30, 8, True),
         (2, "a", 0.25, 30, 9, False)],
    ]
    for rows in batches:
        view.update(spark, comp, _batch(spark, rows))
        got = _snap(view.read_view(spark))
        want = _snap(view.recompute(spark, comp))
        assert got == want, f"after batch {rows}: {got} != {want}"
    # final content sanity: 1→b, 2→a, 3→a live; 4 deleted; c gone
    final = _snap(view.read_view(spark))
    assert set(final) == {("a",), ("b",)}
    assert final[("a",)][0] == 2 and final[("b",)][0] == 1


def test_view_survives_many_rmw_cycles_exactly(spark, tmp_path):
    """20 read-modify-write cycles over 0.1-style values: a double-typed
    stored sum would drift; the decimal view must stay bit-equal to the
    recompute at every step."""
    comp = MergeCompactor(str(tmp_path / "state"), ["user_id"],
                          num_buckets=2)
    view = StreamingAggView(str(tmp_path / "view"), ["user_id"], ["grp"],
                            "value")
    for i in range(20):
        rows = [(100 + i, "g", 0.1, i, i, False)]
        view.update(spark, comp, _batch(spark, rows))
    got = _snap(view.read_view(spark))
    want = _snap(view.recompute(spark, comp))
    assert got == want
    assert got[("g",)][0] == 20
