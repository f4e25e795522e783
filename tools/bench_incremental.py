"""Constant-delta incremental-maintenance measurement: apply the SAME
absolute delta (~600 conversations) against growing base corpora and
record the delta wall — the claim under test is that maintenance cost has
no O(history) term (growth may only come from the O(vocabulary) state
rewrites). Writes BENCH/incremental.json.

Usage: python tools/bench_incremental.py [base_convs ...]
(defaults: 6000 24000; delta held at ~600 convs via fractional pct)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from information_extraction_from_biographies_spark.session import get_spark

DELTA_CONVS = 600


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [6000, 24000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="kg-incr-bench", master=f"local[{cpus}]", shuffle_partitions=64
    )
    results = []
    for n in sizes:
        pct = 100.0 * DELTA_CONVS / n
        r = bench.kg_incremental_run(spark, n, delta_pct=pct, career_reps=4)
        r["n_convs"] = n
        results.append(r)
        print(json.dumps(r), flush=True)
    out = {
        "delta_convs_target": DELTA_CONVS,
        "cores": cpus,
        "runs": results,
    }
    path = os.path.join(REPO, "BENCH", "incremental.json")
    # preserve sections other tools own (bench_chain.py's "chain")
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            prev = json.load(f)
        for k, v in prev.items():
            out.setdefault(k, v)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
