"""Local replica of the driver's correctness gate: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB over the same sf dir; compare
row count, sorted column names, and an order-insensitive value hash."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from information_extraction_from_biographies_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df) -> str:
    cols = sorted(df.columns)
    rows = []
    for tup in df[cols].itertuples(index=False):
        parts = []
        for v in tup:
            if isinstance(v, float):
                parts.append(f"{v:.6f}")
            else:
                parts.append(str(v))
        rows.append("\x1f".join(parts))
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:] or None
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            failures += 1
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {wall:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {exc}")
            failures += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}  ({wall:.1f}s)")
            if "value hash mismatch" in problems and len(sdf) == len(odf):
                cols = sorted(sdf.columns)
                a = sdf[cols].astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().reset_index(drop=True)
                b = odf[cols].astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().reset_index(drop=True)
                diff = a[a != b]
                for i in diff.index[:3]:
                    print(f"      spark: {a[i]}")
                    print(f"      duck : {b[i]}")
        else:
            print(f"OK    {name}: {len(sdf)} rows ({wall:.1f}s)")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
