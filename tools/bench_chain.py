"""Compaction economics: read amplification of ``full_view`` vs snapshot
chain length. Builds one base snapshot, applies CHAIN_MAX constant-size
deltas (``rescan="none"`` ingestion posture), and at chain lengths 1/8/32
times (a) the chain-resolved full read of the corpus-scale tables and
(b) the same read after ``compact_snapshot`` flattens the chain — plus
the one-time compaction wall itself, so an operator can place the knee:
compact when (chain_read − flat_read) × reads_per_day exceeds the
compaction cost. Writes the ``chain`` section of BENCH/incremental.json.

Usage: python tools/bench_chain.py [base_convs delta_convs]
(defaults 2400 75; SPARK_GRAFT_CPUS honored, default 32)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from information_extraction_from_biographies_spark.plans.incremental import (
    IncrementalPipeline,
    compact_snapshot,
    full_view,
)
from information_extraction_from_biographies_spark.plans.pipeline import Pipeline
from information_extraction_from_biographies_spark.session import get_spark
from information_extraction_from_biographies_spark.sources.checkpoint import (
    CheckpointStore,
)

CHAIN_POINTS = [1, 8, 32]
CHAIN_MAX = max(CHAIN_POINTS)
TABLES = ["stage0_turns", "stage2_mentions"]


def _timed_read(store, table, sid, trials=3):
    """Best-of-N wall of a full_view noop-sink materialization (forced
    compute of every column; count() would let Catalyst prune)."""
    walls = []
    for _ in range(trials):
        store.spark.catalog.clearCache()
        t0 = time.monotonic()
        full_view(store, table, sid).write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 3))
    return min(walls), walls


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
    delta_n = int(sys.argv[2]) if len(sys.argv) > 2 else 75
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="kg-chain-bench", master=f"local[{cpus}]", shuffle_partitions=64
    )
    total = base_n + CHAIN_MAX * delta_n
    tdf = spark.read.parquet(bench.materialize_transcripts(spark, total))
    conv_ids = sorted(r["conv_id"] for r in tdf.select("conv_id").distinct().collect())
    wh = tempfile.mkdtemp(prefix="kg_chain_")
    store = CheckpointStore(spark, wh)

    from pyspark.sql import functions as F  # noqa: N812

    base_ids = set(conv_ids[:base_n])
    # gram_index=False: rescan="none" posture never queries the rescan index
    Pipeline(spark, wh, snapshot_id="v0", gram_index=False).run(
        tdf.filter(F.col("conv_id").isin(list(base_ids)))
    )
    build_t0 = time.monotonic()
    for i in range(1, CHAIN_MAX + 1):
        chunk = set(conv_ids[base_n + (i - 1) * delta_n : base_n + i * delta_n])
        IncrementalPipeline(spark, wh, f"v{i-1}", f"v{i}").run(
            tdf.filter(F.col("conv_id").isin(list(chunk))), rescan="none"
        )
        print(f"chain {i}/{CHAIN_MAX} built", flush=True)
    build_wall = round(time.monotonic() - build_t0, 1)

    points = []
    for length in CHAIN_POINTS:
        tip = f"v{length}"
        entry = {"chain_len": length, "tables": {}}
        for t in TABLES:
            chain_best, chain_walls = _timed_read(store, t, tip)
            entry["tables"][t] = {"chain_read": chain_best, "chain_walls": chain_walls}
        t0 = time.monotonic()
        compact_snapshot(store, tip, f"c{length}")
        entry["compact_wall"] = round(time.monotonic() - t0, 3)
        for t in TABLES:
            flat_best, flat_walls = _timed_read(store, t, f"c{length}")
            d = entry["tables"][t]
            d["flat_read"] = flat_best
            d["flat_walls"] = flat_walls
            d["amplification"] = round(d["chain_read"] / max(flat_best, 1e-9), 2)
        points.append(entry)
        print(json.dumps(entry), flush=True)

    path = os.path.join(REPO, "BENCH", "incremental.json")
    with open(path, encoding="utf-8") as f:
        out = json.load(f)
    out["chain"] = {
        "base_convs": base_n,
        "delta_convs": delta_n,
        "chain_build_wall": build_wall,
        "cores": cpus,
        "points": points,
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(f"wrote chain section to {path}")


if __name__ == "__main__":
    main()
