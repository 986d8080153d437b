"""Noise-free evidence for the epoch job trims: count SPARK JOBS
launched by a 4-wave dedup-groups sync (tree = argv[1]) via the
status tracker's job-id high-water mark. Job count is deterministic
for a fixed input, unlike wall time under ambient load."""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, sys.argv[1])

from python_cdc_component_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_jobcount")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    from python_cdc_component_spark.queries import (
        _stage_docs_as_event_waves)
    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, bounded_sync)

    def run(groups: bool) -> int:
        root = tempfile.mkdtemp(prefix="ab_jc_")
        try:
            docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                    .select("doc_id", "text").limit(1000))
            flat = _stage_docs_as_event_waves(spark, docs, root, 4)
            cfg = BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0,
                dedup_groups_path=(f"{root}/groups" if groups else None),
                dedup_groups_buckets=16)
            store = sc._jsc.sc().statusStore()
            hi0 = store.jobsList(None).size()
            bounded_sync(spark, flat, f"{root}/state", f"{root}/ckpt",
                         cfg)
            return store.jobsList(None).size() - hi0
        finally:
            shutil.rmtree(root, ignore_errors=True)

    plain = run(False)
    with_groups = run(True)
    print(json.dumps({"tree": sys.argv[1], "plain_jobs": plain,
                      "with_groups_jobs": with_groups,
                      "premium_jobs": with_groups - plain}))


if __name__ == "__main__":
    main()
