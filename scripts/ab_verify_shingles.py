"""Interleaved A/B for the verify-shingle handoff lever (NOTES_r9
§9.3 / NOTES_r10 §9.3): old = pre-lever HEAD worktree, new = working
tree. Each rep is a fresh subprocess running bench_dedup_groups_sync
at the given batch shape; sides alternate old/new so machine drift
hits both equally (the r9/r10 adjudication methodology).

Usage: python scripts/ab_verify_shingles.py <n_docs> <reps> [old_tree]
"""
import json
import os
import subprocess
import sys

SNIPPET = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from python_cdc_component_spark.session import get_spark
import importlib, bench
spark = get_spark("ab_groups")
spark.read.parquet("/root/testdata/sf0.1/documents.parquet").count()
out = bench.bench_dedup_groups_sync(spark, "/root/testdata/sf0.1",
                                    n_docs=int(sys.argv[2]), n_waves=4)
print("ABRESULT " + json.dumps(out))
"""


def run(tree: str, n_docs: int) -> dict:
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-c", SNIPPET, tree, str(n_docs)],
        cwd=tree, capture_output=True, text=True, env=env)
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(r.stdout[-2000:] + r.stderr[-2000:])


def main() -> None:
    n_docs = int(sys.argv[1])
    reps = int(sys.argv[2])
    old = sys.argv[3] if len(sys.argv) > 3 else os.path.abspath(".ab_r10b")
    new = os.path.abspath(".")
    res = {"old": [], "new": []}
    print(f"load_start={os.getloadavg()}", flush=True)
    for i in range(reps):
        for label, tree in (("old", old), ("new", new)):
            out = run(tree, n_docs)
            res[label].append(out["groups_premium_sec"])
            print(f"rep {i} {label}: premium={out['groups_premium_sec']}"
                  f" with={out['with_groups_sec']}"
                  f" plain={out['plain_sec']}", flush=True)
    med = {k: sorted(v)[len(v) // 2] for k, v in res.items()}
    print(json.dumps({"n_docs": n_docs, "reps": reps, "median": med,
                      "all": res,
                      "load_end": os.getloadavg()}), flush=True)


if __name__ == "__main__":
    main()
