"""Copy-on-write vocabulary commits (Iceberg CoW at bucket granularity).

At the 10^12-turn posture the vocabulary tables (registry bits, people,
alias registry, CC labels, entities, nodes) hold one row per DISTINCT
person/surface — rewriting them FULL on every delta is the last remaining
per-delta cost that grows with corpus vocabulary. When the base snapshot
carries them bucketed (VOCAB_BUCKET_KEYS at one shared count), the
incremental pipeline commits only the buckets the delta's keys hash into
and hardlinks every untouched bucket file from the parent
(CheckpointStore.commit_partial) — per-delta vocabulary write I/O becomes
O(touched buckets) ≈ O(delta). These tests pin:

- the Murmur3-pmod hash `_touched_ids` uses IS the bucketed layout's
  file-to-bucket mapping (the correctness keystone of every pruned read);
- commit_partial reads back as the complete merged table, reconciles its
  lineage, and genuinely hardlinks (same inode) the untouched buckets;
- the end-to-end incremental CoW run (bucketed base) reproduces the plain
  batch recompute table-for-table, engages on every vocabulary table, and
  chains (a CoW child is a valid CoW parent);
- a parent snapshot's directory can disappear without invalidating the
  child (hardlinked inodes survive — Iceberg-style expiry safety).
"""

import json
import os
import shutil

from pyspark.sql import functions as F  # noqa: N812

from information_extraction_from_biographies_spark import fixtures as fx
from information_extraction_from_biographies_spark.plans.incremental import IncrementalPipeline
from information_extraction_from_biographies_spark.plans.pipeline import (
    VOCAB_BUCKET_KEYS,
    Pipeline,
)
from information_extraction_from_biographies_spark.sources.checkpoint import CheckpointStore

from test_incremental import _assert_equal_results, _rows, _split_convs

N = 8


def _inode(p):
    return os.stat(p).st_ino


def _base_table(spark, keys):
    return spark.createDataFrame([(k, i) for i, k in enumerate(keys)], "k string, v int")


def test_touched_ids_match_bucket_file_layout(spark, tmp_path):
    """pmod(hash(key), n) — the expression the pruned reads and touched-set
    computation use — must equal the bucket id Spark encoded in each data
    file's name. If this ever diverged, CoW would silently read/write the
    wrong buckets."""
    store = CheckpointStore(spark, str(tmp_path / "wh"))
    keys = [f"person-{i}" for i in range(50)]
    store.commit(_base_table(spark, keys), "t", "s1", bucket_keys="k", buckets=N)
    by_expr = {
        r["k"]: r["b"]
        for r in store.read("t", "s1")
        .select("k", F.pmod(F.hash("k"), F.lit(N)).alias("b"))
        .collect()
    }
    for b in range(N):
        in_files = {r["k"] for r in store.read_buckets("t", "s1", [b]).collect()}
        assert in_files == {k for k, bb in by_expr.items() if bb == b}


def test_commit_partial_merges_and_hardlinks(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "wh"))
    keys = [f"person-{i}" for i in range(60)]
    store.commit(_base_table(spark, keys), "t", "s1", bucket_keys="k", buckets=N)

    # delta updates 3 keys and adds 2 — the merged rule is last-wins on v
    delta = {"person-3": 103, "person-17": 117, "person-42": 142, "new-a": 900, "new-b": 901}
    ddf = spark.createDataFrame(list(delta.items()), "k string, v int")
    touched = sorted(
        r["b"]
        for r in ddf.select(F.pmod(F.hash("k"), F.lit(N)).alias("b")).distinct().collect()
    )
    base_touched = store.read_buckets("t", "s1", touched)
    merged_touched = (
        base_touched.join(ddf.select("k"), "k", "left_anti").unionByName(ddf)
    )
    store.commit_partial(merged_touched, "t", "s2", "s1", touched)

    expected = {k: i for i, k in enumerate(keys)} | delta
    got = {r["k"]: r["v"] for r in store.read("t", "s2").collect()}
    assert got == expected
    assert store.is_committed("t", "s2")

    lin = store.lineage("t", "s2")
    assert lin["cow"]["parent"] == "s1"
    assert lin["cow"]["touched_buckets"] == touched
    assert lin["cow"]["reused_files"] == N - len(touched) > 0
    assert lin["total_rows"] == len(expected)

    # untouched buckets are the SAME inodes as the parent's files
    parent_files = store.bucket_files("t", "s1")
    child_files = store.bucket_files("t", "s2")
    for b in range(N):
        if b in touched:
            continue
        assert {_inode(f) for f in parent_files[b]} == {_inode(f) for f in child_files[b]}

    # expiry safety: remove the parent snapshot entirely — the child's
    # hardlinked inodes keep its full contents readable
    shutil.rmtree(tmp_path / "wh" / "t" / "snapshot=s1")
    os.remove(tmp_path / "wh" / "_lineage" / "t-s1.json")
    spark.catalog.refreshTable(lin["bucketing"]["catalog_table"])
    assert {r["k"]: r["v"] for r in store.read("t", "s2").collect()} == expected


def test_commit_partial_empty_delta_reuses_everything(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "wh"))
    keys = [f"person-{i}" for i in range(30)]
    base = _base_table(spark, keys)
    store.commit(base, "t", "s1", bucket_keys="k", buckets=N)
    store.commit_partial(base.filter(F.lit(False)), "t", "s2", "s1", [])
    assert _rows(store.read("t", "s2")) == _rows(store.read("t", "s1"))
    assert store.lineage("t", "s2")["cow"]["reused_files"] == len(
        [f for fs in store.bucket_files("t", "s1").values() for f in fs]
    )


def test_incremental_cow_matches_full_recompute_and_chains(spark, tmp_path):
    """Bucketed base → two chained incremental deltas. Every vocabulary
    table must CoW-commit on both steps (step 2's parent is itself a CoW
    snapshot), at least one table must genuinely reuse parent files, and
    the chain tip must reproduce the plain batch recompute over ALL
    transcripts table-for-table."""
    fixture = fx.make_fixture(n_convs=18, seed=11)
    base_t, rest = _split_convs(spark, fixture, 10)
    mid_ids = [
        r["conv_id"]
        for r in rest.select("conv_id").distinct().orderBy("conv_id").limit(4).collect()
    ]
    d1 = rest.filter(F.col("conv_id").isin(mid_ids))
    d2 = rest.filter(~F.col("conv_id").isin(mid_ids))

    # 64 buckets: a 4-conv delta's people cannot cover them all, so the
    # reuse assertion below has untouched buckets to find at this scale
    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="s1", buckets=64).run(base_t)
    IncrementalPipeline(spark, wh, "s1", "s2", buckets=64).run(d1, rescan="exact")
    pipe3 = IncrementalPipeline(spark, wh, "s2", "s3", buckets=64)
    inc = pipe3.run(d2, rescan="exact")

    reused_any = False
    for sid, parent in (("s2", "s1"), ("s3", "s2")):
        for t in VOCAB_BUCKET_KEYS:
            lin = pipe3.store.lineage(t, sid)
            assert lin.get("cow", {}).get("parent") == parent, f"{t}@{sid} not CoW"
            reused_any = reused_any or lin["cow"]["reused_files"] > 0
    assert reused_any, "no vocabulary table reused any parent bucket file"

    full = Pipeline(spark, str(tmp_path / "f"), snapshot_id="f1", buckets=0).run(
        fx.transcripts_sdf(spark, fixture)
    )
    _assert_equal_results(inc, full)

    # the component-keyed index must stay an exact mirror of cc_labels at
    # every chain point — it is what the CoW label commit prunes its
    # merged-component member reads with; a drifted index would silently
    # relabel the wrong buckets on the NEXT delta
    for sid in ("s1", "s2", "s3"):
        labels = _rows(
            pipe3.store.read("cc_labels", sid).select("component", "vertex")
        )
        members = _rows(pipe3.store.read("cc_members", sid))
        assert members == labels, f"cc_members@{sid} diverged from cc_labels"


def test_incremental_cow_resume_skips_committed(spark, tmp_path):
    """A rerun over an already-committed CoW snapshot must skip every
    stage (the CoW lineage reconciles) and return identical tables."""
    fixture = fx.make_fixture(n_convs=14, seed=5)
    base_t, delta_t = _split_convs(spark, fixture, 9)
    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="s1", buckets=N).run(base_t)
    pipe = IncrementalPipeline(spark, wh, "s1", "s2", buckets=N)
    first = pipe.run(delta_t, rescan="exact")
    rerun = IncrementalPipeline(spark, wh, "s1", "s2", buckets=N).run(
        delta_t, rescan="exact"
    )
    assert rerun.executed_stages == []
    for t in ("people", "entities", "nodes", "triples"):
        assert _rows(first.tables[t]) == _rows(rerun.tables[t])
