"""Copy-on-write vocabulary-commit economics: apply deltas of SEVERAL
sizes to the SAME bucketed base, each twice — once with CoW commits
(touched buckets rewritten, untouched bucket files hardlinked from the
parent) and once with the full-rewrite path (enable_cow=False) — and
record, per delta size, the touched/total bucket ratio, reused files, and
fresh bytes actually written, plus both delta walls. Writes the sweep to
BENCH/incremental.json under "cow".

The claim under test is WRITE-I/O scaling, not sandbox wall time: at
sandbox scale the vocabulary tables are a few MB, so the wall delta is
commit-protocol noise — the evidence that matters is fresh-bytes-written
(CoW) vs total-bytes (full), which is the term that otherwise grows with
DISTINCT persons at the 10^12-turn posture. The sweep also pins the
crossover honestly: a delta whose distinct keys approach the bucket count
touches every bucket (coupon-collector) and CoW degenerates to the full
rewrite — the win requires bucket count >> per-delta distinct keys, i.e.
sizing buckets to the VOCABULARY (AUTO_BUCKET_TARGET_BYTES) while deltas
stay small relative to it, which is exactly the posture at 10^12 turns
with hourly ingestion.

Usage: python tools/bench_cow.py [n_convs] [buckets] [delta_sizes...]
       (default 6000 256 600 60 12)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from information_extraction_from_biographies_spark.plans.incremental import IncrementalPipeline
from information_extraction_from_biographies_spark.plans.pipeline import (
    VOCAB_BUCKET_KEYS,
    Pipeline,
)
from information_extraction_from_biographies_spark.session import get_spark
from information_extraction_from_biographies_spark.sources.checkpoint import CheckpointStore


def _snapshot_io(store: CheckpointStore, table: str, sid: str, parent: str) -> dict:
    """files/bytes of a committed snapshot, split fresh vs parent-inode."""
    parent_inodes = set()
    pdir = store._snapshot_dir(table, parent)
    if os.path.isdir(pdir):
        parent_inodes = {e.inode() for e in os.scandir(pdir) if e.is_file()}
    fresh_files = fresh_bytes = reused_files = total_bytes = 0
    for e in os.scandir(store._snapshot_dir(table, sid)):
        if not e.is_file() or e.name.startswith(("_", ".")):
            continue
        size = e.stat().st_size
        total_bytes += size
        if e.inode() in parent_inodes:
            reused_files += 1
        else:
            fresh_files += 1
            fresh_bytes += size
    return {
        "fresh_files": fresh_files,
        "fresh_bytes": fresh_bytes,
        "reused_files": reused_files,
        "total_bytes": total_bytes,
    }


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    delta_sizes = [int(a) for a in sys.argv[3:]] or [600, 60, 12]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="kg-cow-bench", master=f"local[{cpus}]", shuffle_partitions=64
    )
    from pyspark.sql import functions as F  # noqa: N812

    tdf = spark.read.parquet(bench.materialize_transcripts(spark, n_convs))
    # hold out a deterministic pool of max(delta_sizes) convs; each sweep
    # point draws a NESTED subset so every delta applies to the same base
    pool_n = max(delta_sizes)
    ranked = tdf.select("conv_id").distinct().orderBy(F.xxhash64("conv_id"))
    pool_ids = [r["conv_id"] for r in ranked.limit(pool_n).collect()]
    base_t = tdf.filter(~F.col("conv_id").isin(pool_ids))

    wh = tempfile.mkdtemp(prefix="kg_cow_")
    try:
        # gram_index=False: rescan="none" posture never queries the rescan index
        Pipeline(spark, wh, snapshot_id="base", buckets=buckets, gram_index=False).run(base_t)
        store = CheckpointStore(spark, wh)

        runs = []
        for d in sorted(delta_sizes, reverse=True):
            ids = pool_ids[:d]
            delta_t = tdf.filter(F.col("conv_id").isin(ids))

            t0 = time.monotonic()
            IncrementalPipeline(spark, wh, "base", f"cw{d}", buckets=buckets).run(
                delta_t, rescan="none"
            )
            cow_wall = time.monotonic() - t0

            t0 = time.monotonic()
            IncrementalPipeline(
                spark, wh, "base", f"fl{d}", buckets=buckets, enable_cow=False
            ).run(delta_t, rescan="none")
            full_wall = time.monotonic() - t0

            tables = {}
            cow_fresh = full_total = 0
            for t in VOCAB_BUCKET_KEYS:
                io = _snapshot_io(store, t, f"cw{d}", "base")
                cow_lin = store.lineage(t, f"cw{d}").get("cow")
                full_io = _snapshot_io(store, t, f"fl{d}", "base")
                tables[t] = {
                    # None = CoW did not engage (full fallback commit) —
                    # recorded rather than crashed so a buckets=0 run or a
                    # per-table fallback still produces a usable record
                    "touched_buckets": (
                        len(cow_lin["touched_buckets"]) if cow_lin else None
                    ),
                    "total_buckets": buckets,
                    **io,
                    "full_rewrite_bytes": full_io["total_bytes"],
                }
                cow_fresh += io["fresh_bytes"]
                full_total += full_io["total_bytes"]

            run = {
                "delta_convs": d,
                "cow_delta_wall": round(cow_wall, 3),
                "full_delta_wall": round(full_wall, 3),
                "touched_buckets": sum(
                    t["touched_buckets"] or 0 for t in tables.values()
                ),
                "total_buckets": buckets * len(tables),
                "vocab_fresh_bytes_cow": cow_fresh,
                "vocab_bytes_full_rewrite": full_total,
                "write_reduction": (
                    round(1 - cow_fresh / full_total, 4) if full_total else None
                ),
                "tables": tables,
            }
            runs.append(run)
            print(json.dumps({k: v for k, v in run.items() if k != "tables"}), flush=True)

        out = {
            "n_convs": n_convs,
            "base_convs": n_convs - pool_n,
            "buckets": buckets,
            "cores": cpus,
            "runs": runs,
        }
        path = os.path.join(REPO, "BENCH", "incremental.json")
        doc = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                doc = json.load(f)
        # default layout under "cow"; other bucket counts get their own
        # section so sweeps at several B values coexist in the record
        doc["cow" if buckets == 256 else f"cow_b{buckets}"] = out
        with open(path, "w", encoding="utf-8") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {path} (cow section)")
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
