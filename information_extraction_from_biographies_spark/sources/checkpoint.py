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
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

# Spark bucketed data files carry their bucket id in the name:
# part-<task>-<uuid>_<bucketId>.c000.snappy.parquet — the reader groups
# files by this suffix, which is what lets a snapshot mix files written
# by different jobs (fresh buckets + files hardlinked from the parent).
_BUCKET_ID_RE = re.compile(r"_(\d{5})\.")


def _footer_counts(path: str, names=None) -> list[dict]:
    """Per-file row counts read from the parquet FOOTERS — the write-stats
    lookup Iceberg serves from its manifests. O(files) driver-side metadata
    reads (a footer is a few KB at the file tail): no Spark job, no data
    scan. Replacing the old ``groupBy(input_file_name()).count()``
    read-back removed one full-table scan per stage commit — at N tables
    per pipeline run that read-back was the largest fixed per-commit cost
    and re-read every committed byte once.

    Zero-row files are omitted to match the shape the read-back produced
    (an empty file contributes no group); sums are unaffected. ``names``
    restricts the read to specific basenames (CoW fresh-file accounting).
    """
    import pyarrow.parquet as pq

    if names is None:
        if not os.path.isdir(path):
            return []
        names = [
            e.name
            for e in os.scandir(path)
            if e.is_file() and not e.name.startswith(("_", "."))
        ]
    names = sorted(names)

    def one(n: str) -> dict:
        return {
            "partition_file": n,
            "row_count": int(pq.ParquetFile(os.path.join(path, n)).metadata.num_rows),
        }

    if len(names) > 16:
        # object stores / many-bucket commits: overlap the footer round
        # trips; each read is tiny and releases the GIL in Arrow IO
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, len(names))) as ex:
            rows = list(ex.map(one, names))
    else:
        rows = [one(n) for n in names]
    return [r for r in rows if r["row_count"] > 0]


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

    def _catalog_name(self, table: str, snapshot_id: str) -> str:
        # The session catalog is global: two stores with different
        # warehouses (or ids that alnum-squash to the same text, e.g.
        # "a-b" vs "a_b") must not collide on one table name, or read()
        # would silently serve the other store's snapshot. A hash of the
        # raw (warehouse, table, id) triple disambiguates both cases.
        import hashlib

        h = hashlib.sha1(
            f"{self.warehouse}\x00{table}\x00{snapshot_id}".encode()
        ).hexdigest()[:10]
        safe = "".join(c if c.isalnum() else "_" for c in f"{table}__snap_{snapshot_id}")
        return f"{safe}_{h}"

    # -- write path --------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        table: str,
        snapshot_id: str,
        input_snapshots: dict[str, str] | None = None,
        metrics: dict | None = None,
        bucket_keys: list[str] | str | None = None,
        buckets: int = 0,
    ) -> str:
        """Write df as an immutable snapshot + lineage rows. Returns path.

        ``bucket_keys``/``buckets`` write the snapshot BUCKETED on its
        downstream join/group key (sources/bucketed.py): a resumed
        pipeline then re-reads the stage pre-hash-partitioned and the
        planner drops the repartition shuffle the original run paid —
        e.g. the turns snapshot bucketed on conv_id feeds both Python
        passes with zero exchanges on re-run."""
        t0 = time.monotonic()
        path = self._snapshot_dir(table, snapshot_id)
        if bucket_keys is not None and buckets > 0:
            from .bucketed import write_bucketed

            keys = [bucket_keys] if isinstance(bucket_keys, str) else list(bucket_keys)
            # align write tasks with buckets: repartition by the SAME hash
            # the bucketing uses (Murmur3 pmod), so each task holds exactly
            # one bucket and writes ONE file — without this, every upstream
            # task writes a file per bucket it touches (tasks x buckets
            # small files per commit)
            write_bucketed(
                df.repartition(buckets, *keys),
                self._catalog_name(table, snapshot_id),
                keys,
                buckets,
                path=path,
                mode="overwrite",
            )
        else:
            df.write.mode("overwrite").parquet(path)
        # per-partition lineage: one row per output file with its row
        # count, read from the parquet footers the write just produced —
        # no read-back scan (see _footer_counts). Handles the empty
        # bucketed snapshot (zero data files) for free.
        per_file = _footer_counts(path)
        lineage = {
            "table": table,
            "snapshot_id": snapshot_id,
            "input_snapshots": input_snapshots or {},
            "partitions": per_file,
            "total_rows": int(sum(r["row_count"] for r in per_file)),
            "metrics": dict(metrics or {}, wall_ms=int((time.monotonic() - t0) * 1000)),
        }
        if bucket_keys is not None and buckets > 0:
            lineage["bucketing"] = {
                "keys": [bucket_keys] if isinstance(bucket_keys, str) else list(bucket_keys),
                "num_buckets": buckets,
                "catalog_table": self._catalog_name(table, snapshot_id),
                # recorded so a new session can re-register the table by
                # DDL even when the snapshot has zero data files
                "schema_ddl": ", ".join(
                    f"`{f_.name}` {f_.dataType.simpleString()}" for f_ in df.schema.fields
                ),
            }
        tmp = self._lineage_path(table, snapshot_id) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(lineage, f, ensure_ascii=False, indent=1)
        os.replace(tmp, self._lineage_path(table, snapshot_id))  # atomic commit point
        return path

    # -- copy-on-write path (Iceberg CoW at bucket granularity) --------
    def bucketing_spec(self, table: str, snapshot_id: str) -> dict | None:
        """The committed bucketing record ({keys, num_buckets, ...}) of a
        snapshot, or None if absent/unbucketed — callers use this to decide
        whether a partial rewrite can align with the parent layout."""
        try:
            return self.lineage(table, snapshot_id).get("bucketing")
        except (OSError, json.JSONDecodeError):
            return None

    def bucket_files(self, table: str, snapshot_id: str) -> dict[int, list[str]]:
        """bucket_id → data-file paths of a bucketed snapshot, parsed from
        the filenames (the same mapping Spark's scan uses)."""
        d = self._snapshot_dir(table, snapshot_id)
        out: dict[int, list[str]] = {}
        if not os.path.isdir(d):
            return out
        for name in os.listdir(d):
            if name.startswith(("_", ".")):
                continue
            m = _BUCKET_ID_RE.search(name)
            if m:
                out.setdefault(int(m.group(1)), []).append(os.path.join(d, name))
        return out

    def read_buckets(self, table: str, snapshot_id: str, bucket_ids) -> DataFrame:
        """Read ONLY the named buckets of a bucketed snapshot — a
        file-pruned scan for per-key-local consumers. A bucket holds every
        row whose key hashes to it, so the projection is complete per key:
        any per-key computation over these rows equals the same computation
        over the full table restricted to those keys. The scan is a plain
        parquet read (no bucket-distribution metadata) — callers feed
        delta-sized aggregates, not co-located joins."""
        files = self.bucket_files(table, snapshot_id)
        picked = [f for b in bucket_ids for f in files.get(b, [])]
        if not picked:
            return self.read(table, snapshot_id).filter(F.lit(False))
        return self.spark.read.parquet(*picked)

    def commit_partial(
        self,
        df_touched: DataFrame,
        table: str,
        snapshot_id: str,
        parent_snapshot: str,
        touched_buckets,
        input_snapshots: dict[str, str] | None = None,
        metrics: dict | None = None,
    ) -> str:
        """Copy-on-write commit: write ONLY the touched buckets' (full,
        merged) contents and hardlink every untouched bucket file from the
        parent snapshot — Iceberg's copy-on-write rewrite expressed on this
        store. Per-delta write I/O is O(touched buckets), not O(table).

        Contract: ``df_touched`` must hold EXACTLY the merged table's rows
        whose key hashes into ``touched_buckets`` (same Murmur3-pmod hash
        the bucketed layout uses), and the parent snapshot must be
        committed bucketed; the result reads back as the complete merged
        table under the parent's layout. Hardlinks mean expiring the
        parent later never invalidates this snapshot (the inodes survive);
        a cross-device warehouse falls back to copies."""
        spec = self.bucketing_spec(table, parent_snapshot)
        if spec is None:
            raise ValueError(
                f"commit_partial requires a bucketed parent: {table}@{parent_snapshot}"
            )
        keys, n = spec["keys"], spec["num_buckets"]
        t0 = time.monotonic()
        path = self._snapshot_dir(table, snapshot_id)
        from .bucketed import write_bucketed

        cat = self._catalog_name(table, snapshot_id)
        # one task per bucket (same alignment note as commit())
        write_bucketed(
            df_touched.repartition(n, *keys), cat, keys, n, path=path, mode="overwrite"
        )
        # basenames the bucketed write just produced — everything else in
        # the directory afterwards is a hardlink from the parent
        fresh_names = {
            e.name
            for e in os.scandir(path)
            if e.is_file() and not e.name.startswith(("_", "."))
        }
        touched = set(int(b) for b in touched_buckets)
        reused = 0
        reused_names = set()
        for b, fs in self.bucket_files(table, parent_snapshot).items():
            if b in touched:
                continue
            for f in fs:
                dst = os.path.join(path, os.path.basename(f))
                try:
                    os.link(f, dst)
                except OSError:
                    shutil.copy2(f, dst)
                crc = os.path.join(
                    os.path.dirname(f), "." + os.path.basename(f) + ".crc"
                )
                if os.path.exists(crc):
                    dcrc = os.path.join(path, "." + os.path.basename(f) + ".crc")
                    try:
                        os.link(crc, dcrc)
                    except OSError:
                        shutil.copy2(crc, dcrc)
                reused += 1
                reused_names.add(os.path.basename(f))
        # the write registered + cached the table before the links landed
        self.spark.catalog.refreshTable(cat)
        # lineage reconciliation WITHOUT scanning the reused buckets: fresh
        # files are counted from their footers (no Spark job); hardlinked
        # files are byte-identical to the parent's, so their parent lineage
        # rows are inherited verbatim (any basename the parent lineage
        # lacks — it shouldn't — gets a footer read as a fallback)
        partitions = list(_footer_counts(path, fresh_names))
        parent_rows = {
            p["partition_file"]: p
            for p in self.lineage(table, parent_snapshot).get("partitions", [])
        }
        for name in sorted(reused_names):
            row = parent_rows.get(name)
            if row is None:
                row = _footer_counts(path, [name])
                row = row[0] if row else {"partition_file": name, "row_count": 0}
            partitions.append(row)
        lineage = {
            "table": table,
            "snapshot_id": snapshot_id,
            "input_snapshots": input_snapshots or {},
            "partitions": partitions,
            "total_rows": int(sum(p["row_count"] for p in partitions)),
            "metrics": dict(metrics or {}, wall_ms=int((time.monotonic() - t0) * 1000)),
            "bucketing": {
                "keys": list(keys),
                "num_buckets": n,
                "catalog_table": cat,
                "schema_ddl": ", ".join(
                    f"`{f_.name}` {f_.dataType.simpleString()}"
                    for f_ in df_touched.schema.fields
                ),
            },
            "cow": {
                "parent": parent_snapshot,
                "touched_buckets": sorted(touched),
                "reused_files": reused,
            },
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
            # reconcile against the parquet footers (O(files) metadata
            # reads, no Spark job): detects missing/truncated data files
            # the same way the old full-count read-back did — resume
            # callers probe every stage, so this must stay cheap
            actual = sum(r["row_count"] for r in _footer_counts(sp))
        except Exception:
            return False
        return actual == lineage["total_rows"]

    def read(self, table: str, snapshot_id: str) -> DataFrame:
        """Re-read a committed snapshot. Bucketed snapshots are read
        through the catalog so the scan KEEPS the bucket distribution (a
        plain parquet read of the same files would lose it); if the
        catalog entry is gone (new session, in-memory catalog) it is
        re-registered from the lineage record first."""
        lp = self._lineage_path(table, snapshot_id)
        if os.path.exists(lp):
            with open(lp, encoding="utf-8") as f:
                bucketing = json.load(f).get("bucketing")
            if bucketing is not None:
                cat = bucketing["catalog_table"]
                if not self.spark.catalog.tableExists(cat):
                    # declare the existing file layout with DDL (no rewrite);
                    # schema from the lineage record — an empty snapshot has
                    # no files to infer from
                    cols = bucketing.get("schema_ddl")
                    if cols is None:
                        df = self.spark.read.parquet(self._snapshot_dir(table, snapshot_id))
                        cols = ", ".join(
                            f"`{f_.name}` {f_.dataType.simpleString()}" for f_ in df.schema.fields
                        )
                    keys = ", ".join(f"`{k}`" for k in bucketing["keys"])
                    self.spark.sql(
                        f"CREATE TABLE {cat} ({cols}) USING parquet "
                        f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
                        f"INTO {bucketing['num_buckets']} BUCKETS "
                        f"LOCATION '{self._snapshot_dir(table, snapshot_id)}'"
                    )
                return self.spark.table(cat)
        return self.spark.read.parquet(self._snapshot_dir(table, snapshot_id))

    def lineage(self, table: str, snapshot_id: str) -> dict:
        with open(self._lineage_path(table, snapshot_id), encoding="utf-8") as f:
            return json.load(f)

    def lineage_table(self) -> DataFrame:
        """Every committed stage's per-partition lineage as ONE queryable
        DataFrame — (table, snapshot_id, partition_file, row_count,
        total_rows, wall_ms, input_snapshots) — the Iceberg-metadata-table
        shape (`snapshot.partitions`) of this store. Lets an operator ask
        "which stage/partition produced these rows" or "where did wall
        time go" with plain Spark SQL instead of shell-ing over JSON.

        The lineage dir holds one small JSON per stage commit (O(stages),
        not O(data)), so a driver-side parse is the right tool at any
        corpus size."""
        rows = []
        ldir = os.path.join(self.warehouse, "_lineage")
        for name in sorted(os.listdir(ldir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(ldir, name), encoding="utf-8") as f:
                rec = json.load(f)
            for p in rec["partitions"]:
                rows.append(
                    (
                        rec["table"],
                        rec["snapshot_id"],
                        p["partition_file"],
                        int(p["row_count"]),
                        int(rec["total_rows"]),
                        int(rec["metrics"].get("wall_ms", 0)),
                        {k: str(v) for k, v in rec["input_snapshots"].items()},
                    )
                )
        return self.spark.createDataFrame(
            rows,
            "table string, snapshot_id string, partition_file string, "
            "row_count long, total_rows long, wall_ms long, "
            "input_snapshots map<string,string>",
        )

    # -- retention ---------------------------------------------------
    def snapshots(self, table: str) -> list[str]:
        """Committed snapshot ids of a table, oldest first (commit order =
        lineage-file mtime; ids themselves carry no ordering contract)."""
        tdir = os.path.join(self.warehouse, table)
        if not os.path.isdir(tdir):
            return []
        found = []
        for name in os.listdir(tdir):
            if name.startswith("snapshot="):
                sid = name.split("=", 1)[1]
                lp = self._lineage_path(table, sid)
                if os.path.exists(lp):
                    found.append((os.path.getmtime(lp), sid))
        return [sid for _m, sid in sorted(found)]

    def _chain_protected(self) -> set[str]:
        """Snapshot ids that a LIVE incremental snapshot still resolves
        through: every ancestor on a chain whose tip metadata exists.
        Expiring one of these would silently truncate ``full_view``'s
        parent-union, so they are never expiry victims. Incremental
        metadata is removed by compaction (compact_snapshot + deleting
        the chain's _incremental files), which is the supported way to
        retire a chain."""
        inc_dir = os.path.join(self.warehouse, "_incremental")
        protected: set[str] = set()
        if not os.path.isdir(inc_dir):
            return protected
        for name in os.listdir(inc_dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(inc_dir, name), encoding="utf-8") as f:
                protected.add(json.load(f)["parent"])
            protected.add(name[: -len(".json")])
        return protected

    def expire_snapshots(self, table: str, keep_last: int = 2) -> list[str]:
        """Drop all but the newest ``keep_last`` committed snapshots of a
        table (Iceberg's expire_snapshots shape): the lineage JSON is
        removed FIRST — after that the snapshot is uncommitted, so a
        crash mid-delete leaves garbage files, never a half-valid
        snapshot — then the data directory and any bucket catalog entry.
        Snapshots that live incremental chains still reference (parents
        or members of an unretired chain) are skipped — expiring one
        would break ``plans.incremental.full_view`` for every descendant.
        Returns the expired ids. Copy-on-write children of an expired
        snapshot stay readable: their reused files are hardlinks, so the
        inodes outlive the parent directory."""
        sids = self.snapshots(table)
        protected = self._chain_protected()
        victims = [
            sid for sid in sids[: max(len(sids) - keep_last, 0)] if sid not in protected
        ]
        for sid in victims:
            lp = self._lineage_path(table, sid)
            with open(lp, encoding="utf-8") as f:
                bucketing = json.load(f).get("bucketing")
            os.remove(lp)  # commit point of the expiry
            if bucketing is not None and self.spark.catalog.tableExists(
                bucketing["catalog_table"]
            ):
                self.spark.sql(f"DROP TABLE {bucketing['catalog_table']}")
            shutil.rmtree(self._snapshot_dir(table, sid), ignore_errors=True)
        return victims
