"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values. Usage::

    python scripts/check_oracle.py [--shard K/N] [sf_dir] [query ...]

``--shard K/N`` (1-based K) runs every N-th query of the (stable,
insertion-ordered) list starting at K — lets CI split the ~9-minute
full gate across processes; the shards partition the query set exactly.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from python_cdc_component_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif s.dtype == object:
            df[c] = s.map(lambda v: None if v is None else
                          (str(v) if not isinstance(v, (list, tuple)) else str(v)))
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    a, b = _canon(spark_df), _canon(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            col_a, col_b = a[c].tolist(), b[c].tolist()
            bad = [i for i, (x, y) in enumerate(zip(col_a, col_b))
                   if not _values_equal(x, y)]
            if bad:
                i = bad[0]
                problems.append(
                    f"col {c}: {len(bad)} mismatches; first at row {i}: "
                    f"spark={col_a[i]!r} duck={col_b[i]!r}")
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    shard_k, shard_n = 1, 1
    if argv and argv[0] == "--shard":
        shard_k, shard_n = (int(x) for x in argv[1].split("/"))
        if not 1 <= shard_k <= shard_n:
            raise SystemExit(f"bad shard {argv[1]!r}: need 1 <= K <= N")
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if os.environ.get("SPARK_GRAFT_HOSTILE"):
        # driver simulation: vanilla session, non-UTC TZ, no AQE, default
        # 200 shuffle partitions — results must be config-invariant
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("check_oracle_hostile")
                 .config("spark.sql.session.timeZone", "America/New_York")
                 .config("spark.sql.adaptive.enabled", "false")
                 .config("spark.sql.shuffle.partitions", "200")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
    else:
        spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = [n for i, n in enumerate(qs)
             if i % shard_n == shard_k - 1 and (not only or n in only)]
    failed = []
    n_run = 0
    for name in names:
        fn = qs[name]
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)})")
            continue
        try:
            rel = con.sql(oracles[name])
            # The driver's value-hash serializes HUGEINT (DuckDB SUM of
            # integers) and TIMESTAMPTZ differently from Spark's
            # BIGINT/TIMESTAMP even when values agree — pandas-level
            # normalization below would hide that, so flag them hard.
            type_problems = [
                f"oracle col {c} has driver-hash-hostile type {t}"
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()
                or "TIME ZONE" in str(t).upper()]
            ddf = rel.df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = type_problems + compare(name, sdf, ddf)
        dt = time.time() - t0
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + " | ".join(problems))
            failed.append(name)
        else:
            print(f"OK   {name} ({dt:.1f}s, {len(sdf)} rows)")
    print(f"\n{len(failed)} failed of {n_run}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
