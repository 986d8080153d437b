"""Focused A/B for the verify-shingle handoff on a PAIR-HEAVY batch —
the workload the lever targets (bench_dedup_groups_sync's sf corpus
slice yields ~7 candidate pairs total, so it prices only the lever's
fixed cost, never its win). Shape: batch0 indexes N unique 40-token
base texts; batch1 ingests a 1-token-perturbed variant of every base
(each collides with its base through 3-4 LSH bands and verifies at
Jaccard ≈ 0.85), so the verify stage sees ~N real non-exact pairs with
half the endpoints batch-side. Old = pre-lever worktree, new = working
tree; fresh subprocess per rep, sides interleaved.

Usage: python scripts/ab_verify_heavy.py <n_docs> <reps> [old_tree]
"""
import json
import os
import subprocess
import sys

SNIPPET = r"""
import json, sys, time, tempfile, shutil
sys.path.insert(0, sys.argv[1])
from python_cdc_component_spark.session import get_spark
from python_cdc_component_spark.streaming.dedup_state import (
    StreamingDedupGroups)

n = int(sys.argv[2])
spark = get_spark("ab_verify_heavy")
spark.range(10).count()    # JVM warm
rnd = __import__("random").Random(42)
words = [f"w{i}" for i in range(5000)]
bases, variants = [], []
for i in range(n):
    toks = [words[rnd.randrange(5000)] for _ in range(40)]
    bases.append((i, " ".join(toks)))
    v = list(toks)
    v[20] = "zz%d" % i
    variants.append((n + i, " ".join(v)))
b0 = spark.createDataFrame(bases, "doc_id long, text string")
b1 = spark.createDataFrame(variants, "doc_id long, text string")
corpus = b0.unionByName(b1)
work = tempfile.mkdtemp(prefix="abvh_")
try:
    st = StreamingDedupGroups(work + "/st", num_buckets=16)
    t0 = time.time()
    s0 = st.process_batch(spark, b0, corpus=b0, batch_id=0)
    t1 = time.time()
    s1 = st.process_batch(spark, b1, corpus=corpus, batch_id=1)
    t2 = time.time()
    n_groups = st.read_groups(spark).count()
    print("ABRESULT " + json.dumps(
        {"batch0_sec": round(t1 - t0, 3),
         "batch1_sec": round(t2 - t1, 3),
         "edges_b1": s1.get("n_verified_edges"),
         "n_groups": n_groups}))
finally:
    shutil.rmtree(work, ignore_errors=True)
"""


def run(tree: str, n_docs: int) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", SNIPPET, tree, str(n_docs)],
        cwd=tree, capture_output=True, text=True)
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
    checks = set()
    print(f"load_start={os.getloadavg()}", flush=True)
    for i in range(reps):
        for label, tree in (("old", old), ("new", new)):
            out = run(tree, n_docs)
            res[label].append(out["batch1_sec"])
            checks.add((out["edges_b1"], out["n_groups"]))
            print(f"rep {i} {label}: batch1={out['batch1_sec']}"
                  f" batch0={out['batch0_sec']}"
                  f" edges={out['edges_b1']}"
                  f" groups={out['n_groups']}", flush=True)
    assert len(checks) == 1, f"sides disagree on results: {checks}"
    med = {k: sorted(v)[len(v) // 2] for k, v in res.items()}
    print(json.dumps({"n_docs": n_docs, "reps": reps, "median": med,
                      "all": res, "parity": sorted(checks),
                      "load_end": os.getloadavg()}), flush=True)


if __name__ == "__main__":
    main()
