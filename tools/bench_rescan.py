"""Affected-history detection economics: rescan="exact" (full O(history)
turn-table scan) vs rescan="indexed" (gram-posting candidates + pruned
verify) — same bucketed base, same ~600-conv delta, identical committed
excluded_convs required. Records both detection walls (the committed
stage's lineage wall_ms), the index build/maintenance walls, and the
index's on-disk size, under "rescan_index" in BENCH/incremental.json.

At sandbox scale the full scan reads a few hundred MB of page-cached
parquet, so the WALL gap understates the claim — the structural evidence
is that the indexed path's read set (posting buckets + candidate turn
buckets) is delta-driven while the exact path's is the whole base turn
table; both paths' outputs are pinned equal (tests/test_postings.py).

Usage: python tools/bench_rescan.py [n_convs] [buckets] [delta_convs]
       (default 24000 64 600)
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
from information_extraction_from_biographies_spark.plans.pipeline import Pipeline
from information_extraction_from_biographies_spark.session import get_spark
from information_extraction_from_biographies_spark.sources.checkpoint import CheckpointStore


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    delta_n = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="kg-rescan-bench", master=f"local[{cpus}]", shuffle_partitions=64
    )
    from pyspark.sql import functions as F  # noqa: N812

    tdf = spark.read.parquet(bench.materialize_transcripts(spark, n_convs))
    ranked = tdf.select("conv_id").distinct().orderBy(F.xxhash64("conv_id"))
    delta_ids = [r["conv_id"] for r in ranked.limit(delta_n).collect()]
    base_t = tdf.filter(~F.col("conv_id").isin(delta_ids))
    delta_t = tdf.filter(F.col("conv_id").isin(delta_ids))

    wh = tempfile.mkdtemp(prefix="kg_rescan_")
    try:
        Pipeline(spark, wh, snapshot_id="base", buckets=buckets).run(base_t)
        store = CheckpointStore(spark, wh)

        walls = {}
        for mode, sid in (("exact", "rx"), ("indexed", "ri")):
            t0 = time.monotonic()
            IncrementalPipeline(spark, wh, "base", sid, buckets=buckets).run(
                delta_t, rescan=mode
            )
            walls[mode] = {
                "delta_wall": round(time.monotonic() - t0, 3),
                "detection_wall_ms": store.lineage("excluded_convs", sid)["metrics"][
                    "wall_ms"
                ],
                "excluded_convs": store.lineage("excluded_convs", sid)["total_rows"],
            }
        assert (
            walls["exact"]["excluded_convs"] == walls["indexed"]["excluded_convs"]
        ), "indexed detection diverged from exact"

        out = {
            "n_convs": n_convs,
            "base_convs": n_convs - delta_n,
            "delta_convs": delta_n,
            "buckets": buckets,
            "cores": cpus,
            "exact": walls["exact"],
            "indexed": walls["indexed"],
            "index_build_wall_ms": store.lineage("turn_grams", "base")["metrics"][
                "wall_ms"
            ],
            "index_delta_wall_ms": store.lineage("turn_grams", "ri")["metrics"][
                "wall_ms"
            ],
            "index_bytes": _dir_bytes(
                store._snapshot_dir("turn_grams", "base")
            ),
            "turns_bytes": _dir_bytes(
                store._snapshot_dir("stage0_turns", "base")
            ),
            # stop-gram cap (operators/postings.hot_grams): hot grams
            # carry most posting rows and no pruning power — the raw
            # (uncapped) index measured 7x the turn table's bytes
            "stopped_grams": store.lineage("gram_stops", "base")["total_rows"],
            "kept_posting_rows": store.lineage("turn_grams", "base")["total_rows"],
        }
        print(json.dumps(out), flush=True)
        path = os.path.join(REPO, "BENCH", "incremental.json")
        doc = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                doc = json.load(f)
        doc["rescan_index"] = out
        with open(path, "w", encoding="utf-8") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {path} (rescan_index section)")
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
