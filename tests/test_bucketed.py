"""Bucketed-table layout: the planner must satisfy join/aggregation
distribution from the table layout itself — no Exchange on bucketed
sides. This is the co-located-join story for repeated stage-boundary
joins at 100 TB (sources/bucketed.py)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from information_extraction_from_biographies_spark.sources.bucketed import (
    bucket_spec,
    read_bucketed,
    write_bucketed,
)
from information_extraction_from_biographies_spark.sources.checkpoint import (
    CheckpointStore,
)


def plan_of(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("source"),
        F.sha1(F.col("id").cast("string")).alias("content"),
    )
    scores = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100).alias("score")
    )
    write_bucketed(docs, "tb_docs", "doc_id", 8, path=str(root / "docs"))
    write_bucketed(scores, "tb_scores", "doc_id", 8, path=str(root / "scores"))
    yield "tb_docs", "tb_scores"
    spark.sql("DROP TABLE IF EXISTS tb_docs")
    spark.sql("DROP TABLE IF EXISTS tb_scores")


def _no_broadcast(spark):
    return _conf_ctx(spark, "spark.sql.autoBroadcastJoinThreshold", "-1")


@contextlib.contextmanager
def _conf_ctx(spark, key, value):
    old = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, old)


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t1, t2 = bucketed_pair
    with _no_broadcast(spark):
        joined = read_bucketed(spark, t1).join(read_bucketed(spark, t2), "doc_id")
        plan = plan_of(joined)
        assert "Exchange" not in plan
        assert joined.count() == 2000


def test_unbucketed_control_join_shuffles(spark, bucketed_pair, tmp_path):
    # same data read as PLAIN parquet (layout metadata lost) must shuffle —
    # proves the no-Exchange plan above comes from the bucket metadata.
    t1, t2 = bucketed_pair
    p1 = spark.table(t1).inputFiles()[0].rsplit("/", 1)[0]
    p2 = spark.table(t2).inputFiles()[0].rsplit("/", 1)[0]
    with _no_broadcast(spark):
        joined = spark.read.parquet(p1).join(spark.read.parquet(p2), "doc_id")
        assert "Exchange" in plan_of(joined)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    t1, _ = bucketed_pair
    agg = read_bucketed(spark, t1).groupBy("doc_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in plan_of(agg)


def test_groupby_off_bucket_key_still_shuffles(spark, bucketed_pair):
    # sanity: the layout only covers its own key
    t1, _ = bucketed_pair
    agg = read_bucketed(spark, t1).groupBy("source").agg(F.count("*").alias("n"))
    assert "Exchange" in plan_of(agg)


def test_round_trip_and_spec(spark, bucketed_pair):
    t1, _ = bucketed_pair
    df = read_bucketed(spark, t1)
    assert df.count() == 2000
    assert df.select(F.sum("doc_id")).first()[0] == sum(range(2000))
    assert bucket_spec(spark, t1) == (["doc_id"], 8)
    assert bucket_spec(spark, "tb_scores") == (["doc_id"], 8)


def test_grouped_map_pre_partitioned_over_bucketed_snapshot(spark, tmp_path):
    """The Exchange-free Python-pass path: a snapshot committed bucketed on
    conv_id, re-read through the catalog, feeds grouped_map with
    pre_partitioned=True — the plan keeps the BUCKETED scan (one partition
    per bucket, groups whole) and has NO Exchange, and every conversation
    is processed exactly once (a cross-partition fragment would double a
    group, which iter_key_groups' per-partition guard cannot see)."""
    import pandas as pd

    from information_extraction_from_biographies_spark.functions.grouped import (
        grouped_map,
    )

    store = CheckpointStore(spark, str(tmp_path / "wh"))
    turns = spark.range(3000).select(
        (F.col("id") % 91).cast("string").alias("conv_id"),
        (F.col("id") / 91).cast("int").alias("turn_idx"),
        F.sha1(F.col("id").cast("string")).alias("text"),
    )
    store.commit(turns, "turns", "s1", bucket_keys="conv_id", buckets=8)

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"conv_id": [g["conv_id"].iloc[0]], "n": [len(g)]})

    # the conf Pipeline pins for this path (see plans/pipeline.py): without
    # it the planner reverts the bucketed scan under a mapInPandas consumer
    with _conf_ctx(spark, "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"):
        t = store.read("turns", "s1")
        out = grouped_map(t, per_conv, "conv_id string, n long", pre_partitioned=True)
        plan = plan_of(out, "simple")
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        rows = {r["conv_id"]: r["n"] for r in out.collect()}
        assert len(rows) == 91 and sum(rows.values()) == 3000

    # control: with the default autoBucketedScan (true — set explicitly,
    # since any pipeline test running earlier pins it off session-wide)
    # the planner DISABLES the bucketed scan for this plan shape — the
    # hazard the conf pin exists for
    with _conf_ctx(spark, "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"):
        t = store.read("turns", "s1")
        out = grouped_map(t, per_conv, "conv_id string, n long", pre_partitioned=True)
        assert "disabled by query planner" in plan_of(out, "simple")
    cat = store._catalog_name("turns", "s1")
    spark.sql(f"DROP TABLE IF EXISTS {cat}")


def test_pipeline_bucketed_parity(spark, tmp_path):
    """Pipeline(buckets=8) (bucketed commits + Exchange-free Python passes)
    produces byte-identical stage tables to Pipeline(buckets=0) (plain
    parquet, full shuffles) — the layout is a plan optimization, never a
    semantic change. Also pins that the constructor set the
    autoBucketedScan conf the pre_partitioned path needs."""
    from information_extraction_from_biographies_spark import fixtures as fx
    from information_extraction_from_biographies_spark.plans.pipeline import Pipeline

    f = fx.make_fixture(n_convs=6)
    tdf = fx.transcripts_sdf(spark, f)
    bucketed = Pipeline(spark, str(tmp_path / "whb"), snapshot_id="b1", buckets=8)
    assert (
        spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        == "false"
    )
    plain = Pipeline(spark, str(tmp_path / "whp"), snapshot_id="p1", buckets=0)
    rb = bucketed.run(tdf)
    rp = plain.run(tdf)
    assert rb.tables.keys() == rp.tables.keys()
    for name in ["triples", "mentions", "entities", "nodes", "cooccurrence", "timeline"]:
        a = sorted(map(tuple, rb.tables[name].collect()))
        b = sorted(map(tuple, rp.tables[name].collect()))
        assert a == b, f"bucketed vs plain mismatch in {name}"
    # and the bucketed run really committed the layout
    assert bucketed.store.lineage("stage0_turns", "b1")["bucketing"]["keys"] == [
        "conv_id"
    ]
    assert "bucketing" not in plain.store.lineage("stage0_turns", "p1")


def test_pipeline_resume_over_unbucketed_snapshot(spark, tmp_path):
    """pre_partitioned is decided from the COMMITTED lineage, not this
    run's knob: resuming with buckets=8 over a snapshot an earlier run
    committed plain must keep the repartition shuffle (no false
    co-location assumption) and still complete correctly."""
    from information_extraction_from_biographies_spark import fixtures as fx
    from information_extraction_from_biographies_spark.plans.pipeline import Pipeline

    f = fx.make_fixture(n_convs=4)
    tdf = fx.transcripts_sdf(spark, f)
    wh = str(tmp_path / "wh")
    old = Pipeline(spark, wh, snapshot_id="v1", buckets=0)
    with pytest.raises(RuntimeError, match="injected failure"):
        old.run(tdf, fail_after="stage0_meta")
    assert "bucketing" not in old.store.lineage("stage0_turns", "v1")

    new = Pipeline(spark, wh, snapshot_id="v1", buckets=8)
    res = new.run(tdf, resume=True)
    assert "stage0_turns" in res.skipped_stages
    assert res.tables["triples"].count() > 0
    # the reference parity fixture path: triples equal a fresh full run
    fresh = Pipeline(spark, str(tmp_path / "wh2"), snapshot_id="f1", buckets=8).run(tdf)
    assert sorted(map(tuple, res.tables["triples"].collect())) == sorted(
        map(tuple, fresh.tables["triples"].collect())
    )


def test_pipeline_resume_over_bucketed_snapshot_repins_conf(spark, tmp_path):
    """Mirror of the test above: resuming with buckets=0 over a snapshot
    an earlier run committed BUCKETED takes the Exchange-free
    pre-partitioned path — sound only if the planner pin is re-set from
    the COMMITTED lineage (a buckets=0 run never pins via
    resolve_buckets). Without the re-pin DisableUnnecessaryBucketedScan
    may revert the scan to splittable reads and a >128MB bucket file
    fragments a conversation across partitions, silently."""
    from information_extraction_from_biographies_spark import fixtures as fx
    from information_extraction_from_biographies_spark.plans.pipeline import Pipeline

    f = fx.make_fixture(n_convs=4)
    tdf = fx.transcripts_sdf(spark, f)
    wh = str(tmp_path / "wh")
    old = Pipeline(spark, wh, snapshot_id="v1", buckets=8)
    with pytest.raises(RuntimeError, match="injected failure"):
        old.run(tdf, fail_after="stage0_meta")
    assert old.store.lineage("stage0_turns", "v1")["bucketing"]["keys"] == [
        "conv_id"
    ]

    # a fresh session starts from the Spark default (true)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    try:
        res = Pipeline(spark, wh, snapshot_id="v1", buckets=0).run(tdf, resume=True)
        assert (
            spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
            == "false"
        )
        assert "stage0_turns" in res.skipped_stages
        fresh = Pipeline(spark, str(tmp_path / "wh2"), snapshot_id="f1", buckets=0).run(
            tdf
        )
        assert sorted(map(tuple, res.tables["triples"].collect())) == sorted(
            map(tuple, fresh.tables["triples"].collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )


def test_checkpoint_bucketed_resume_keeps_layout(spark, tmp_path):
    """A bucketed snapshot re-read through the store joins with zero
    Exchange — including after the catalog entry is dropped (new-session
    resume re-registers the layout via DDL)."""
    store = CheckpointStore(spark, str(tmp_path / "wh"))
    turns = spark.range(500).select(
        F.col("id").alias("conv_id"), (F.col("id") * 2).alias("x")
    )
    store.commit(turns, "turns", "s1", bucket_keys="conv_id", buckets=4)
    assert store.is_committed("turns", "s1")
    assert store.lineage("turns", "s1")["bucketing"]["num_buckets"] == 4

    other = spark.range(500).select(
        F.col("id").alias("conv_id"), F.lit(1).alias("y")
    )
    cat = store._catalog_name("turns", "s1")
    with _no_broadcast(spark):
        # the bucketed side must not re-shuffle: exactly the probe side's
        # repartition Exchange may appear in the simple-mode tree, never two.
        j = store.read("turns", "s1").join(other.repartition(4, "conv_id"), "conv_id")
        assert plan_of(j, "simple").count("Exchange") <= 1
        assert j.count() == 500

        # simulate a fresh session: drop the catalog entry, read again
        spark.sql(f"DROP TABLE {cat}")
        j2 = store.read("turns", "s1").join(other.repartition(4, "conv_id"), "conv_id")
        assert plan_of(j2, "simple").count("Exchange") <= 1
        assert j2.count() == 500
    spark.sql(f"DROP TABLE IF EXISTS {cat}")


def test_auto_bucket_count_thresholds(spark, tmp_path, monkeypatch):
    """Auto-sizing: sub-threshold inputs commit plain (0); above the
    threshold one bucket per target-bytes, capped; in-memory frames
    (no input files) are 0."""
    from information_extraction_from_biographies_spark.plans import pipeline as pmod

    p = str(tmp_path / "in.parquet")
    spark.range(10000).selectExpr("cast(id as string) conv_id").write.parquet(p)
    df = spark.read.parquet(p)
    # real size is a few KB — far under the 1 GiB production threshold
    assert pmod.auto_bucket_count(df) == 0
    # drop the thresholds to the test file's scale: now it must size
    # ceil(bytes/target) and respect the cap
    monkeypatch.setattr(pmod, "AUTO_BUCKET_MIN_BYTES", 1)
    monkeypatch.setattr(pmod, "AUTO_BUCKET_TARGET_BYTES", 1024)
    n = pmod.auto_bucket_count(df)
    assert n >= 1
    monkeypatch.setattr(pmod, "AUTO_BUCKET_MAX", 2)
    assert pmod.auto_bucket_count(df) == 2
    # in-memory frame: size unknowable -> plain
    mem = spark.createDataFrame([("a",)], "conv_id string")
    assert pmod.auto_bucket_count(mem) == 0


def test_pipeline_auto_buckets_plain_at_sandbox_scale(spark, tmp_path):
    """Default buckets=None over a small parquet-backed input resolves to
    plain commits (no bucketing metadata in lineage) — the measured
    sandbox-scale behavior; production sizes engage via the same rule at
    >=1 GiB input."""
    from information_extraction_from_biographies_spark import fixtures as fx
    from information_extraction_from_biographies_spark.plans.pipeline import Pipeline

    f = fx.make_fixture(n_convs=4)
    p = str(tmp_path / "t.parquet")
    fx.transcripts_sdf(spark, f).write.parquet(p)
    pipe = Pipeline(spark, str(tmp_path / "wh"), snapshot_id="a1")
    pipe.run(spark.read.parquet(p))
    assert pipe.buckets == 0
    assert "bucketing" not in pipe.store.lineage("stage0_turns", "a1")
