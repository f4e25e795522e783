"""Two-parallelism scaling evidence (north rule: efficiency >= 0.8 from N
to 4N executors).

A real multi-executor cluster is unavailable in this sandbox, so the
criterion is evidenced by running the IDENTICAL job at two parallelism
levels on the SAME materialized input:

    local[8]  (N)    vs    local[32]  (4N)

throughput T = triples/sec over the end-to-end KG pipeline (stages 0-4);
efficiency = T(32) / (4 * T(8)).

Each level runs in its own subprocess (a SparkSession's master is fixed
for the JVM's lifetime). Usage:

    python tools/bench_scaling.py              # both levels + summary JSON
    python tools/bench_scaling.py --cores N    # one measurement (internal)

The summary is printed as one JSON line and written to BENCH/scaling.json;
BASELINE.md's "Measured scaling" section is refreshed from it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "20000"))
CAREER_REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "4"))
TRANSCRIPTS = f"/tmp/kg_scaling_transcripts_{N_CONVS}_r{CAREER_REPS}"


def measure(cores: int) -> dict:
    import bench
    from information_extraction_from_biographies_spark.session import get_spark

    spark = get_spark(
        app_name=f"kg-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    wall, n_triples, n_turns, n_cooc, n_entities = bench.kg_pipeline_run(
        spark, N_CONVS, transcripts_path=TRANSCRIPTS, career_reps=CAREER_REPS
    )
    spark.stop()
    return {
        "cores": cores,
        "wall_sec": round(wall, 3),
        "n_turns": n_turns,
        "n_triples": n_triples,
        "n_cooccurrence": n_cooc,
        "n_entities": n_entities,
        "triples_per_sec": round(n_triples / wall, 2),
        "turns_per_sec": round(n_turns / wall, 2),
    }


def main() -> None:
    if len(sys.argv) == 3 and sys.argv[1] == "--cores":
        print("RESULT " + json.dumps(measure(int(sys.argv[2]))))
        return

    # materialize the shared input once (any cores)
    import bench
    from information_extraction_from_biographies_spark.session import get_spark

    spark = get_spark(app_name="kg-scaling-gen", master="local[32]")
    bench.materialize_transcripts(spark, N_CONVS, TRANSCRIPTS, CAREER_REPS)
    spark.stop()

    results = {}
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=3600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")), None
        )
        if line is None:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise SystemExit(f"measurement at {cores} cores failed")
        results[cores] = json.loads(line[len("RESULT "):])

    t8 = results[8]["triples_per_sec"]
    t32 = results[32]["triples_per_sec"]
    summary = {
        "n_convs": N_CONVS,
        "career_reps": CAREER_REPS,
        "n_turns": results[32]["n_turns"],
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency": round(t32 / (4 * t8), 3),
        "target": 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
