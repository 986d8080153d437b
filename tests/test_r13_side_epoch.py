"""Unified side-state epoch driver (VERDICT r12 #5) — the four
`_maintain_*` drivers now share one skeleton (`_run_side_epoch`:
exactly-once probe → keyed extract → empty gate → purge-then-add
work). The full r7-r12 crash/replay suites pin behavior-identity; this
file pins the NEW aligned convention: every state kind marks its
epoch on an empty batch and a replay skips at the marker probe."""

import os
import types

from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, _maintain_dedup_groups)
from python_cdc_component_spark.streaming.dedup_state import (
    StreamingDedupGroups)

_BATCH_SCHEMA = ("user_id long, event_type string, props string, "
                 "kbc__event_timestamp long, kbc__file string, "
                 "kbc__pos long, __deleted boolean, "
                 "_snapshot_phase string")


def test_dedup_groups_empty_epoch_marks_and_replay_skips(spark,
                                                         tmp_path):
    """An empty epoch marks its ingest tier (tier mode pinned first)
    and the replay skips at the marker probe; a later real epoch
    proceeds on the pinned scheme."""
    cfg = BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        dedup_groups_path=str(tmp_path / "groups"),
        dedup_groups_buckets=8)
    groups = StreamingDedupGroups(cfg.dedup_groups_path, num_buckets=8)
    compactor = types.SimpleNamespace(
        state_path=str(tmp_path / "state"))
    empty = spark.createDataFrame([], _BATCH_SCHEMA)
    _maintain_dedup_groups(spark, groups, compactor, empty, 0, cfg)
    marker = os.path.join(groups._manifest_path, "1")
    assert os.path.exists(marker)
    with open(groups._tier_mode_path) as fh:
        assert fh.read() == "cdc3"
    mt = os.path.getmtime(marker)
    _maintain_dedup_groups(spark, groups, compactor, empty, 0, cfg)
    assert os.path.getmtime(marker) == mt
    # a later real epoch proceeds normally on the pinned scheme
    rows = spark.createDataFrame(
        [(uid, "signup",
          " ".join(f"u{uid}w{i}" for i in range(40)),
          uid, "f1", uid, False, "s")
         for uid in (1, 2)], _BATCH_SCHEMA)
    state = rows.select("user_id", "props",
                        rows["__deleted"].alias("__deleted"))
    state.write.mode("overwrite").parquet(compactor.state_path)
    _maintain_dedup_groups(spark, groups, compactor, rows, 1, cfg)
    got = {r["keep_doc_id"] for r in
           groups.read_groups(spark).select("keep_doc_id").collect()}
    assert got == {1, 2}
