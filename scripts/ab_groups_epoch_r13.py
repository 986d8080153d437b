"""A/B probe for dedup-groups epoch job trims: times bounded_sync WITH
dedup_groups (1000 docs / 4 waves, the bench extras shape) from
whichever tree is argv[1]. One JSON line out; caller interleaves."""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, sys.argv[1])

from python_cdc_component_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_groups_epoch")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    from python_cdc_component_spark.queries import (
        _stage_docs_as_event_waves)
    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, bounded_sync)

    out = {"tree": sys.argv[1], "with_groups_sec": []}
    for rep in range(3):
        root = tempfile.mkdtemp(prefix="ab_geh_")
        try:
            docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                    .select("doc_id", "text").limit(1000))
            flat = _stage_docs_as_event_waves(spark, docs, root, 4)
            cfg = BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0,
                dedup_groups_path=f"{root}/groups",
                dedup_groups_buckets=16)
            t0 = time.time()
            bounded_sync(spark, flat, f"{root}/state", f"{root}/ckpt",
                         cfg)
            out["with_groups_sec"].append(round(time.time() - t0, 3))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    out["load"] = open("/proc/loadavg").read().split()[:3]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
