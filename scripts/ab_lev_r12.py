"""VERDICT r11 #4 datapoint: thresholded (3-arg, early-exit DP) vs
plain levenshtein inside the blocked-link pair join, on a LONG-string
hot block — interleaved expression A/B in one process (same session,
same data, alternating sides), medians + load context persisted to
ab_lev_r12.json. Usage: python scripts/ab_lev_r12.py [n_rows] [strlen]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_cdc_component_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    slen = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = get_spark("ab_lev", cpus="8")
    # one hot block of n long strings: half share a base (dist ≤ 2),
    # half diverge early (the early-exit's best case) and late (worst)
    base = "x" * slen
    rows = []
    for i in range(n):
        if i % 3 == 0:
            rows.append((i, "b", base + f"{i % 7}"))
        elif i % 3 == 1:
            rows.append((i, "b", f"{i}" + base))          # early diverge
        else:
            rows.append((i, "b", base[: slen - 10]
                         + f"tail{i:06d}"))               # late diverge
    df = spark.createDataFrame(rows, "rid long, seg string, name string")
    df = df.localCheckpoint(eager=True)
    a = df.select(F.col("rid").alias("id_a"),
                  F.col("name").alias("na"), "seg")
    b = df.select(F.col("rid").alias("id_b"),
                  F.col("name").alias("nb"), "seg")
    joined = a.join(b, "seg").filter(F.col("id_a") < F.col("id_b"))

    def run(thresholded: bool) -> float:
        if thresholded:
            d = F.levenshtein("na", "nb", 2)
            out = joined.filter(d >= 0)
        else:
            d = F.levenshtein("na", "nb")
            out = joined.filter(d <= 2)
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for t in (True, False):
        run(t)                                   # warm codegen
    plain, thresh = [], []
    for _ in range(5):                           # interleaved
        plain.append(run(False))
        thresh.append(run(True))
    doc = {
        "metric": "ab_levenshtein_thresholded",
        "n_rows": n, "strlen": slen,
        "pairs": joined.count(),
        "plain_sec": plain, "thresholded_sec": thresh,
        "plain_median": statistics.median(plain),
        "thresholded_median": statistics.median(thresh),
        "speedup": round(statistics.median(plain)
                         / statistics.median(thresh), 2),
        "loadavg": os.getloadavg(),
    }
    print(json.dumps(doc, separators=(",", ":")))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ab_lev_r12.json"), "w") as fh:
        json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
