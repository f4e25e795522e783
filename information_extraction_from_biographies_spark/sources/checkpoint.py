"""Snapshot + lineage checkpoint store (S3/S4 + north-rule resume).

The north rule asks for Iceberg stage checkpoints with per-partition
lineage rows. The iceberg-spark runtime jar is not available in this
sandbox, so this module implements the same contract on plain Parquet
(SURVEY §7 risk 5): every stage write creates

    {warehouse}/{table}/snapshot={snapshot_id}/   ← immutable parquet
    {warehouse}/_lineage/{table}-{snapshot_id}.json

with lineage rows per output file/partition: (partition_file, row_count)
plus stage metrics (input snapshot ids, total rows, wall ms). A stage is
*committed* iff its lineage JSON exists and the per-partition counts
reconcile with the snapshot's actual row count — resume skips committed
stages and re-reads their snapshots (§3.3).

On a cluster this maps 1:1 onto Iceberg: writeTo().append() + snapshot id
+ a lineage table; the resume predicate is identical.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812


class CheckpointStore:
    def __init__(self, spark: SparkSession, warehouse: str) -> None:
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(os.path.join(warehouse, "_lineage"), exist_ok=True)

    # -- paths -------------------------------------------------------
    def _snapshot_dir(self, table: str, snapshot_id: str) -> str:
        return os.path.join(self.warehouse, table, f"snapshot={snapshot_id}")

    def _lineage_path(self, table: str, snapshot_id: str) -> str:
        return os.path.join(self.warehouse, "_lineage", f"{table}-{snapshot_id}.json")

    # -- write path --------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        table: str,
        snapshot_id: str,
        input_snapshots: dict[str, str] | None = None,
        metrics: dict | None = None,
    ) -> str:
        """Write df as an immutable snapshot + lineage rows. Returns path."""
        t0 = time.monotonic()
        path = self._snapshot_dir(table, snapshot_id)
        df.write.mode("overwrite").parquet(path)
        # per-partition lineage: one row per output file with its row count
        written = self.spark.read.parquet(path)
        per_file = (
            written.groupBy(F.input_file_name().alias("partition_file"))
            .count()
            .collect()
        )
        lineage = {
            "table": table,
            "snapshot_id": snapshot_id,
            "input_snapshots": input_snapshots or {},
            "partitions": [
                {"partition_file": os.path.basename(r["partition_file"]), "row_count": r["count"]}
                for r in per_file
            ],
            "total_rows": int(sum(r["count"] for r in per_file)),
            "metrics": dict(metrics or {}, wall_ms=int((time.monotonic() - t0) * 1000)),
        }
        tmp = self._lineage_path(table, snapshot_id) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(lineage, f, ensure_ascii=False, indent=1)
        os.replace(tmp, self._lineage_path(table, snapshot_id))  # atomic commit point
        return path

    # -- read / resume path -------------------------------------------
    def is_committed(self, table: str, snapshot_id: str) -> bool:
        lp = self._lineage_path(table, snapshot_id)
        sp = self._snapshot_dir(table, snapshot_id)
        if not (os.path.exists(lp) and os.path.isdir(sp)):
            return False
        with open(lp, encoding="utf-8") as f:
            lineage = json.load(f)
        try:
            actual = self.spark.read.parquet(sp).count()
        except Exception:
            return False
        return actual == lineage["total_rows"]

    def read(self, table: str, snapshot_id: str) -> DataFrame:
        return self.spark.read.parquet(self._snapshot_dir(table, snapshot_id))

    def lineage(self, table: str, snapshot_id: str) -> dict:
        with open(self._lineage_path(table, snapshot_id), encoding="utf-8") as f:
            return json.load(f)
