"""Direct interleaved A/B of the r13 lexical maintenance + probe
changes: times ONLY the `_maintain_lexical_index` epoch loop (8
insert-only epochs + 2 update/tombstone epochs over 4k docs) and the
index-fed BM25 probe, per tree, in fresh subprocesses — the
bounded_sync wrapper's streaming machinery (checkpoint IO, triggers)
swamped the per-epoch delta in `ab_lexstats_r13.py` (premium noise
±10 s vs an expected sub-second delta).

Usage: python scripts/ab_lexstats_direct_r13.py [reps] [old_tree]
"""
import json
import os
import statistics
import subprocess
import sys

SNIPPET = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, sys.argv[1])
import os
os.chdir(sys.argv[1])
from python_cdc_component_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("ab_lexdirect", cpus="32")
spark.conf.set("spark.sql.shuffle.partitions", "16")
from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, _maintain_lexical_index)
from python_cdc_component_spark.streaming.lexical_state import (
    StreamingLexicalIndex)

docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text").limit(4000).collect())
root = tempfile.mkdtemp(prefix="ab_lexdirect_")
cfg = BoundedStreamConfig(
    mode="DEDUPE", primary_keys=["user_id"],
    lexical_index_path=f"{root}/lex", lexical_parts=16)
lex = StreamingLexicalIndex(f"{root}/lex", num_parts=16)
SCHEMA = ("user_id long, props string, kbc__event_timestamp long, "
          "kbc__file string, kbc__pos long, __deleted boolean, "
          "_snapshot_phase string")

def batch(rows, epoch):
    return spark.createDataFrame(
        [(d, t if t is not None else "x", 1000 + epoch, "f", j,
          t is None, None) for j, (d, t) in enumerate(rows)], SCHEMA)

# warm the session (codegen, parquet committers) outside the timer
_maintain_lexical_index(
    spark, StreamingLexicalIndex(f"{root}/warm", num_parts=16),
    batch([(999999, "warm up tokens")], 0), 0,
    BoundedStreamConfig(mode="DEDUPE", primary_keys=["user_id"],
                        lexical_index_path=f"{root}/warm",
                        lexical_parts=16))

waves = [docs[i::8] for i in range(8)]
t0 = time.time()
for e, w in enumerate(waves):   # 8 insert-only epochs
    _maintain_lexical_index(
        spark, lex, batch([(r["doc_id"], r["text"]) for r in w], e),
        e, cfg)
ins_sec = round(time.time() - t0, 3)
# 2 update/tombstone epochs over 10% of the corpus
upd = [(r["doc_id"], r["text"] + " upd") for r in docs[:400]]
tomb = [(r["doc_id"], None) for r in docs[400:800]]
t0 = time.time()
_maintain_lexical_index(spark, lex, batch(upd, 8), 8, cfg)
_maintain_lexical_index(spark, lex, batch(tomb, 9), 9, cfg)
mut_sec = round(time.time() - t0, 3)
t0 = time.time()
n = lex.bm25_topk(spark, ["table", "query", "scan", "merge"],
                  k=15).count()
probe_sec = round(time.time() - t0, 3)
shutil.rmtree(root, ignore_errors=True)
print("ABRESULT " + json.dumps(
    {"ins_sec": ins_sec, "mut_sec": mut_sec,
     "probe_sec": probe_sec, "probe_rows": n}))
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    old_tree = (sys.argv[2] if len(sys.argv) > 2
                else os.path.abspath(".ab_r13"))
    new_tree = os.path.abspath(".")
    rows = {"old": [], "new": []}
    for i in range(reps):
        for side, tree in (("old", old_tree), ("new", new_tree)):
            rows[side].append(run(tree))
            print(f"rep {i} {side}: {rows[side][-1]}",
                  f"load={os.getloadavg()}", flush=True)
    doc = {"metric": "ab_lexstats_direct_r13", "reps": reps,
           "loadavg": os.getloadavg()}
    for side in ("old", "new"):
        for key in ("ins_sec", "mut_sec", "probe_sec"):
            vals = [r[key] for r in rows[side]]
            doc[f"{side}_{key}_all"] = vals
            doc[f"{side}_{key}_min"] = min(vals)
            doc[f"{side}_{key}_median"] = statistics.median(vals)
    print(json.dumps(doc, separators=(",", ":")))
    with open("ab_lexstats_direct_r13.json", "w") as fh:
        json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
