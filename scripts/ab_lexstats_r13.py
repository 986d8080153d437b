"""Interleaved A/B for the r13 maintained-corpus-stats change
(VERDICT r12 #1): the `bench_lexical_index_sync` ingest premium and
index-fed BM25 probe at the r13 working tree (maintained
`_corpstats`, candidate-pruned dl join, insert-only rewrite skip) vs
the r12-close commit (558b453, worktree .ab_r13/). Fresh subprocess
per rep, sides interleaved so host noise lands on both; the CONTROL
is the plain (no side state) sync both trees run identically. min +
median across reps per side.

Usage: python scripts/ab_lexstats_r13.py [reps] [old_tree]
"""
import json
import os
import statistics
import subprocess
import sys

SNIPPET = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from python_cdc_component_spark.session import get_spark
spark = get_spark("ab_lexstats", cpus="32")
spark.conf.set("spark.sql.shuffle.partitions", "16")
sf_dir = "/root/testdata/sf0.1"
from python_cdc_component_spark.queries import _stage_docs_as_event_waves
from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, bounded_sync)
from python_cdc_component_spark.streaming.lexical_state import (
    StreamingLexicalIndex)
docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(1000))
root = tempfile.mkdtemp(prefix="ab_lexstats_")
flat = _stage_docs_as_event_waves(spark, docs, root, 4)
out = {}
for label, lex_path in (("plain", None), ("with_lex", f"{root}/lex")):
    cfg = BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        max_files_per_trigger=1, max_wait_s=5.0,
        lexical_index_path=lex_path, lexical_parts=16)
    t0 = time.time()
    bounded_sync(spark, flat, f"{root}/state_{label}",
                 f"{root}/ckpt_{label}", cfg)
    out[f"{label}_sec"] = round(time.time() - t0, 3)
out["premium_sec"] = round(out["with_lex_sec"] - out["plain_sec"], 3)
lex = StreamingLexicalIndex(f"{root}/lex", num_parts=16)
t0 = time.time()
out["probe_rows"] = lex.bm25_topk(
    spark, ["table", "query", "scan", "merge"], k=15).count()
out["probe_sec"] = round(time.time() - t0, 3)
shutil.rmtree(root, ignore_errors=True)
print("ABRESULT " + json.dumps(out))
"""


def run(tree: str) -> dict:
    r = subprocess.run([sys.executable, "-c", SNIPPET, tree],
                       capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no ABRESULT from {tree}:\n{r.stdout[-2000:]}"
                       f"\n{r.stderr[-2000:]}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    old_tree = (sys.argv[2] if len(sys.argv) > 2
                else os.path.abspath(".ab_r13"))
    new_tree = os.path.abspath(".")
    rows = {"old": [], "new": []}
    for i in range(reps):
        for side, tree in (("old", old_tree), ("new", new_tree)):
            rows[side].append(run(tree))
            print(f"rep {i} {side}: {rows[side][-1]}",
                  f"load={os.getloadavg()}", flush=True)
    doc = {"metric": "ab_lexstats_r13", "reps": reps,
           "loadavg": os.getloadavg()}
    for side in ("old", "new"):
        for key in ("plain_sec", "premium_sec", "probe_sec"):
            vals = [r[key] for r in rows[side]]
            doc[f"{side}_{key}_all"] = vals
            doc[f"{side}_{key}_min"] = min(vals)
            doc[f"{side}_{key}_median"] = statistics.median(vals)
    print(json.dumps(doc, separators=(",", ":")))
    with open("ab_lexstats_r13.json", "w") as fh:
        json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
