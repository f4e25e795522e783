"""Incremental-vs-rebuild crossover sweep (r4 verdict item 2).

For each (corpus size n, delta fraction pct) cell, bootstrap a
checkpointed base over (1-pct) of the corpus, apply the rest through
IncrementalPipeline (rescan="none"), and run a full checkpointed rebuild
over the whole corpus — bench.kg_incremental_run verbatim. The knee per
base size is the delta fraction where delta_wall crosses rebuild_wall;
the ``MaintenanceCostModel`` constants in plans/incremental.py (which
drive ``maintain()``'s rebuild-vs-incremental decision) are fitted to
this table (recorded in BENCH/BASELINE.md §incremental crossover).

Writes BENCH/crossover.json. Usage:
    python tools/bench_crossover.py [n ...]      # default 3000 12000 48000
Env: SPARK_GRAFT_CROSSOVER_PCTS="1,5,10,25,50"
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from information_extraction_from_biographies_spark.session import get_spark


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [3000, 12000, 48000]
    pcts = [
        float(p)
        for p in os.environ.get("SPARK_GRAFT_CROSSOVER_PCTS", "1,5,10,25,50").split(",")
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="kg-crossover", master=f"local[{cpus}]", shuffle_partitions=64
    )
    cells = []
    for n in sizes:
        for pct in pcts:
            r = bench.kg_incremental_run(spark, n, delta_pct=pct, career_reps=4)
            cell = {
                "n_convs": n,
                "delta_pct": pct,
                "base_convs": r["base_convs"],
                "delta_convs": r["delta_convs"],
                "delta_ratio": round(r["delta_convs"] / max(r["base_convs"], 1), 4),
                "delta_wall": r["delta_wall"],
                "rebuild_wall": r["rebuild_wall"],
                "speedup_vs_rebuild": r["speedup_vs_rebuild"],
                "trials": r["trials"],
                "rebuild_trials": r.get("rebuild_trials"),
            }
            cells.append(cell)
            print(json.dumps(cell), flush=True)

    # knee per base size: largest measured delta_ratio where incremental
    # still beats rebuild, and the first where it doesn't (bracket)
    knees = {}
    for n in sizes:
        rows = sorted(
            (c for c in cells if c["n_convs"] == n), key=lambda c: c["delta_ratio"]
        )
        wins = [c for c in rows if c["speedup_vs_rebuild"] and c["speedup_vs_rebuild"] > 1.0]
        losses = [c for c in rows if c["speedup_vs_rebuild"] and c["speedup_vs_rebuild"] <= 1.0]
        knees[str(n)] = {
            "last_win_ratio": wins[-1]["delta_ratio"] if wins else None,
            "first_loss_ratio": losses[0]["delta_ratio"] if losses else None,
        }
    out = {"cores": cpus, "cells": cells, "knee_by_base": knees}
    path = os.path.join(REPO, "BENCH", "crossover.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    print(json.dumps({"knee_by_base": knees}))
    spark.stop()


if __name__ == "__main__":
    main()
