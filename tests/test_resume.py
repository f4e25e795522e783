"""Kill-resume: restart after a mid-pipeline failure recomputes nothing
before the failure point, and lineage row counts reconcile (north rule)."""

import pytest
from pyspark.sql import functions as F  # noqa: N812

from information_extraction_from_biographies_spark import fixtures as fx
from information_extraction_from_biographies_spark.plans.pipeline import Pipeline


def test_kill_resume(spark, tmp_path):
    f = fx.make_fixture(n_convs=4)
    tdf = fx.transcripts_sdf(spark, f)
    wh = str(tmp_path / "wh")
    pipe = Pipeline(spark, wh, snapshot_id="r1")

    with pytest.raises(RuntimeError, match="injected failure"):
        pipe.run(tdf, fail_after="stage2_triples")

    # committed through stage2_triples
    for t in ["stage0_turns", "stage1_people", "stage2_triples"]:
        assert pipe.store.is_committed(t, "r1"), t
    assert not pipe.store.is_committed("cooccurrence", "r1")

    # resume: everything up to the failure point is skipped, the rest runs
    res = pipe.run(tdf, resume=True)
    assert "stage2_triples" in res.skipped_stages
    assert "stage0_turns" in res.skipped_stages
    assert "cooccurrence" in res.executed_stages

    # lineage reconciles per table
    for t in ["stage2_triples", "cooccurrence"]:
        lineage = pipe.store.lineage(t, "r1")
        actual = pipe.store.read(t, "r1").count()
        assert lineage["total_rows"] == actual
        assert sum(p["row_count"] for p in lineage["partitions"]) == actual

    # and results are complete
    assert res.tables["triples"].count() > 0
    assert res.tables["cooccurrence"].count() > 0


def test_connected_components_vs_union_find(spark):
    """Property check: CC min-label propagation ≡ a driver-side union-find
    on a pseudo-random graph (fixed seed)."""
    import random

    from information_extraction_from_biographies_spark.operators.canonicalize import (
        connected_components,
    )

    rng = random.Random(5)
    n = 120
    edges = [(f"v{rng.randrange(n)}", f"v{rng.randrange(n)}") for _ in range(90)]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    expected = {}
    for a, b in edges:
        for v in (a, b):
            expected.setdefault(find(v), set()).add(v)
    want = sorted([frozenset(s) for s in expected.values()], key=sorted)

    df = spark.createDataFrame(edges, "src string, dst string")
    comp = connected_components(df)
    groups = {}
    for r in comp.collect():
        groups.setdefault(r.component, set()).add(r.vertex)
    got = sorted([frozenset(s) for s in groups.values()], key=sorted)
    assert got == want


def test_connected_components_salted_equals_unsalted(spark):
    from information_extraction_from_biographies_spark.operators.canonicalize import (
        connected_components,
    )

    edges = [("hub", f"n{i}") for i in range(40)] + [("n0", "x"), ("y", "z")]
    df = spark.createDataFrame(edges, "src string, dst string")
    plain = {(r.vertex, r.component) for r in connected_components(df).collect()}
    salted = {(r.vertex, r.component) for r in connected_components(df, salt=8).collect()}
    assert plain == salted


def test_expire_snapshots_keeps_newest_and_stays_committed(spark, tmp_path):
    import time as _time

    from information_extraction_from_biographies_spark.sources.checkpoint import (
        CheckpointStore,
    )

    store = CheckpointStore(spark, str(tmp_path / "wh"))
    for i in range(4):
        store.commit(spark.range(10 + i), "t", f"s{i}")
        _time.sleep(0.05)  # mtime ordering
    assert store.snapshots("t") == ["s0", "s1", "s2", "s3"]

    expired = store.expire_snapshots("t", keep_last=2)
    assert expired == ["s0", "s1"]
    assert store.snapshots("t") == ["s2", "s3"]
    assert not store.is_committed("t", "s0")
    assert store.is_committed("t", "s3")
    assert store.read("t", "s3").count() == 13

    # expiring a bucketed snapshot also drops its catalog entry
    store.commit(
        spark.range(20).selectExpr("id as conv_id"), "b", "s1",
        bucket_keys="conv_id", buckets=2,
    )
    cat = store._catalog_name("b", "s1")
    store.read("b", "s1").count()
    assert spark.catalog.tableExists(cat)
    store.expire_snapshots("b", keep_last=0)
    assert not spark.catalog.tableExists(cat)
    assert store.snapshots("b") == []


def test_bucketed_catalog_names_scoped_per_warehouse(spark, tmp_path):
    """Two stores sharing (table, snapshot_id) must not collide in the
    session-global catalog: each read() returns its own store's rows, and
    ids that alnum-squash identically ('a-b' vs 'a_b') stay distinct."""
    from information_extraction_from_biographies_spark.sources.checkpoint import (
        CheckpointStore,
    )

    a = CheckpointStore(spark, str(tmp_path / "wa"))
    b = CheckpointStore(spark, str(tmp_path / "wb"))
    a.commit(spark.range(5).selectExpr("id as conv_id"), "turns", "s1",
             bucket_keys="conv_id", buckets=2)
    b.commit(spark.range(9).selectExpr("id as conv_id"), "turns", "s1",
             bucket_keys="conv_id", buckets=2)
    assert a._catalog_name("turns", "s1") != b._catalog_name("turns", "s1")
    assert a.read("turns", "s1").count() == 5  # not repointed to b's 9
    assert b.read("turns", "s1").count() == 9

    assert a._catalog_name("t", "a-b") != a._catalog_name("t", "a_b")


def test_lineage_table_queryable(spark, tmp_path):
    """All committed stages' per-partition lineage rows come back as one
    DataFrame whose totals reconcile with the snapshots."""
    from information_extraction_from_biographies_spark.sources.checkpoint import (
        CheckpointStore,
    )

    store = CheckpointStore(spark, str(tmp_path / "wh"))
    store.commit(spark.range(10), "a", "s1", metrics={"stage": "zero"})
    store.commit(spark.range(7), "b", "s1", input_snapshots={"a": "s1"})

    lt = store.lineage_table()
    agg = {
        (r["table"], r["snapshot_id"]): r
        for r in lt.groupBy("table", "snapshot_id")
        .agg(
            F.sum("row_count").alias("n"),
            F.first("total_rows").alias("tot"),
            F.first("input_snapshots").alias("inp"),
        )
        .collect()
    }
    assert agg[("a", "s1")]["n"] == agg[("a", "s1")]["tot"] == 10
    assert agg[("b", "s1")]["n"] == 7
    assert dict(agg[("b", "s1")]["inp"]) == {"a": "s1"}
    # every partition row carries a real file name and a positive count
    assert lt.filter((F.col("row_count") < 0) | (F.col("partition_file") == "")).count() == 0
