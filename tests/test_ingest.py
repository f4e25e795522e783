"""Streaming ingestion (foreachBatch → chained incremental snapshots):
drained stream output equals the batch pipeline over the whole corpus;
batch replays are idempotent; compaction flattens the chain."""

import os

from pyspark.sql import functions as F  # noqa: N812

from information_extraction_from_biographies_spark import fixtures as fx
from information_extraction_from_biographies_spark.plans.incremental import (
    IncrementalPipeline,
    compact_snapshot,
    full_view,
    snapshot_parent,
)
from information_extraction_from_biographies_spark.plans.pipeline import Pipeline
from information_extraction_from_biographies_spark.sources.checkpoint import CheckpointStore
from information_extraction_from_biographies_spark.streaming.ingest import (
    IncrementalIngest,
    ingest_stream,
    latest_snapshot,
)
from information_extraction_from_biographies_spark.streaming.stage1 import (
    read_transcript_stream,
)


def _rows(df):
    out = []
    for r in df.collect():
        out.append(
            tuple(
                tuple(sorted(v.items())) if isinstance(v, dict) else v
                for v in r
            )
        )
    return sorted(out, key=repr)


def _land_wave(spark, sdf, conv_ids, path):
    """One parquet FILE per wave — the file source assigns whole files to
    micro-batches, which is the conversation-atomicity contract. Written
    via Spark (coalesce(1)) so the landing schema matches the transcript
    schema exactly (an all-null column round-tripped through pandas loses
    its declared type)."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    sdf.filter(F.col("conv_id").isin(list(conv_ids))).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(part, path)
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_ingest_matches_batch(spark, tmp_path):
    fixture = fx.make_fixture(n_convs=15, seed=3)
    sdf = fx.transcripts_sdf(spark, fixture)
    ids = sorted(r["conv_id"] for r in sdf.select("conv_id").distinct().collect())
    base_ids, w1, w2 = ids[:7], ids[7:11], ids[11:]

    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="v1").run(
        sdf.filter(F.col("conv_id").isin(base_ids))
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    _land_wave(spark, sdf, w1, str(landing / "wave1.parquet"))
    _land_wave(spark, sdf, w2, str(landing / "wave2.parquet"))

    stream = read_transcript_stream(spark, str(landing), max_files_per_trigger=1)
    q = ingest_stream(
        stream,
        wh,
        base_snapshot="v1",
        checkpoint_dir=str(tmp_path / "ckpt"),
        rescan="exact",
    )
    q.awaitTermination(300)

    tip = latest_snapshot(wh, "v1")
    assert tip != "v1"
    store = CheckpointStore(spark, wh)
    full = Pipeline(spark, str(tmp_path / "full"), snapshot_id="f1").run(sdf)
    for table, key in [
        ("stage2_triples", "triples"),
        ("stage2_mentions", "mentions"),
        ("cooccurrence", "cooccurrence"),
    ]:
        assert _rows(full_view(store, table, tip)) == _rows(full.tables[key]), table
    assert _rows(store.read("stage3_entities", tip)) == _rows(full.tables["entities"])
    assert _rows(store.read("nodes", tip)) == _rows(full.tables["nodes"])


def test_ingest_replay_is_idempotent(spark, tmp_path):
    fixture = fx.make_fixture(n_convs=8, seed=5)
    sdf = fx.transcripts_sdf(spark, fixture)
    ids = sorted(r["conv_id"] for r in sdf.select("conv_id").distinct().collect())
    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="v1").run(
        sdf.filter(F.col("conv_id").isin(ids[:5]))
    )
    delta = sdf.filter(~F.col("conv_id").isin(ids[:5]))

    ingest = IncrementalIngest(wh, "v1", rescan="none")
    ingest(delta, 0)
    store = CheckpointStore(spark, wh)
    before = _rows(full_view(store, "stage2_triples", "b0"))
    # crash-replay of the same batch id: same parent, stages all skipped
    ingest(delta, 0)
    assert snapshot_parent(wh, "b0") == "v1"
    assert latest_snapshot(wh, "v1") == "b0"
    assert _rows(full_view(store, "stage2_triples", "b0")) == before
    # an empty replay batch is a no-op
    ingest(delta.limit(0), 1)
    assert latest_snapshot(wh, "v1") == "b0"


def test_compaction_flattens_chain(spark, tmp_path):
    fixture = fx.make_fixture(n_convs=12, seed=7)
    sdf = fx.transcripts_sdf(spark, fixture)
    ids = sorted(r["conv_id"] for r in sdf.select("conv_id").distinct().collect())
    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="v1").run(
        sdf.filter(F.col("conv_id").isin(ids[:8]))
    )
    IncrementalPipeline(spark, wh, "v1", "v2").run(
        sdf.filter(~F.col("conv_id").isin(ids[:8])), rescan="exact"
    )
    store = CheckpointStore(spark, wh)
    want = _rows(full_view(store, "stage2_triples", "v2"))

    done = compact_snapshot(store, "v2", "c1")
    assert "stage2_triples" in done and "cc_labels" in done
    # compacted snapshot is a flat base: no parent, direct reads equal the
    # chain-resolved view
    assert snapshot_parent(wh, "c1") is None
    assert not os.path.exists(os.path.join(wh, "_incremental", "c1.json"))
    assert _rows(store.read("stage2_triples", "c1")) == want
    assert _rows(full_view(store, "stage2_triples", "c1")) == want
    # and a further delta can chain off the compacted base
    assert latest_snapshot(wh, "c1") == "c1"


def test_expiry_protects_live_chains(spark, tmp_path):
    """expire_snapshots must not delete a snapshot an incremental chain
    still resolves through; after compaction + retire_chain it may."""
    from information_extraction_from_biographies_spark.plans.incremental import (
        retire_chain,
    )

    fixture = fx.make_fixture(n_convs=10, seed=11)
    sdf = fx.transcripts_sdf(spark, fixture)
    ids = sorted(r["conv_id"] for r in sdf.select("conv_id").distinct().collect())
    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="v1").run(
        sdf.filter(F.col("conv_id").isin(ids[:7]))
    )
    IncrementalPipeline(spark, wh, "v1", "v2").run(
        sdf.filter(~F.col("conv_id").isin(ids[:7])), rescan="none"
    )
    store = CheckpointStore(spark, wh)
    # v1 is v2's parent and v2 is a live tip: with keep_last=0 neither may
    # be expired while the chain lives
    assert store.expire_snapshots("stage0_turns", keep_last=0) == []
    assert store.is_committed("stage0_turns", "v1")

    compact_snapshot(store, "v2", "c1")
    # only incremental members carry metadata; the batch base v1 simply
    # stops being protected once v2's metadata is gone
    assert retire_chain(wh, "v2") == ["v2"]
    expired = store.expire_snapshots("stage0_turns", keep_last=1)
    assert set(expired) == {"v1", "v2"}
    assert not store.is_committed("stage0_turns", "v1")
    assert store.is_committed("stage0_turns", "c1")


def test_compaction_can_establish_bucketed_layout(spark, tmp_path):
    """compact_snapshot(buckets=N) rewrites the chain's BUCKET_KEYS tables
    bucketed (the natural moment to re-establish co-location a per-delta
    chain has lost); default auto-sizing keeps sandbox-scale chains plain;
    contents equal the chain-resolved view either way."""
    fixture = fx.make_fixture(n_convs=10, seed=5)
    sdf = fx.transcripts_sdf(spark, fixture)
    ids = sorted(r["conv_id"] for r in sdf.select("conv_id").distinct().collect())
    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="v1").run(
        sdf.filter(F.col("conv_id").isin(ids[:7]))
    )
    IncrementalPipeline(spark, wh, "v1", "v2").run(
        sdf.filter(~F.col("conv_id").isin(ids[:7])), rescan="none"
    )
    store = CheckpointStore(spark, wh)
    want = _rows(full_view(store, "stage0_turns", "v2"))

    # auto (default): tiny chain -> plain
    compact_snapshot(store, "v2", "c_auto")
    assert "bucketing" not in store.lineage("stage0_turns", "c_auto")
    assert _rows(store.read("stage0_turns", "c_auto")) == want

    # forced: BUCKET_KEYS tables come out bucketed, others plain
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    compact_snapshot(store, "v2", "c_b", buckets=4)
    lin = store.lineage("stage0_turns", "c_b")
    assert lin["bucketing"]["keys"] == ["conv_id"]
    assert lin["bucketing"]["num_buckets"] == 4
    assert "bucketing" not in store.lineage("stage2_triples", "c_b")
    assert _rows(store.read("stage0_turns", "c_b")) == want


def test_ingest_threads_lexicons_and_turn_cap(spark, tmp_path):
    """IncrementalIngest forwards ``lexicons`` and ``max_conv_turns`` to
    each batch's IncrementalPipeline. Before the fix the ingest path had
    no way to pass either: a stream over a custom-gazetteer base silently
    extracted every micro-batch under the DEFAULT vocabulary (the exact
    vocabulary-mixing hazard plans/incremental.py warns about), and no
    turn cap could guard the per-conversation kernels."""
    import datetime

    from information_extraction_from_biographies_spark import gazetteers as gz

    place = "㐀㐁"  # CJK Ext-A — absent from the built-in place list
    assert place not in gz.DEFAULT_LEXICONS.places
    custom = gz.Lexicons.build(gz.SURNAMES, set(gz.PLACE_NAMES) | {place})

    fixture = fx.make_fixture(n_convs=4, seed=13)
    sdf = fx.transcripts_sdf(spark, fixture)
    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="v1", lexicons=custom).run(sdf)

    ts = datetime.datetime(2024, 1, 1)
    turn0 = f"陳泗一（Tan Test，1900.01.01-1980.01.01）（吳大安撰），{place}人，字伯禹。"
    delta = spark.createDataFrame(
        [("cx", i, "user", t, None, ts) for i, t in enumerate(
            [turn0, "大正1年（1912），任職臺北書局。", "與吳泗平合作發表論文。",
             "民國30年（1941），當選會長。", "晚年定居台南。"]
        )],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )

    ingest = IncrementalIngest(wh, "v1", lexicons=custom, max_conv_turns=3)
    ingest(delta, 0)
    store = CheckpointStore(spark, wh)

    born = [
        (r.subj, r.obj)
        for r in full_view(store, "stage2_triples", "b0")
        .filter((F.col("source") == "born-in") & (F.col("conv_id") == "cx"))
        .collect()
    ]
    assert ("陳泗一", place) in {(s, o) for s, o in born}

    cap_turns = store.read("stage0_turns", "b0").agg(F.max("turn_idx")).collect()[0][0]
    assert cap_turns == 2  # turns 3,4 cut by max_conv_turns=3
    assert store.lineage("stage0_turns", "b0")["metrics"]["capped_convs"] == 1
