"""Structured Streaming surface: per-turn mentions + watermarked windowed
aggregation over a bounded file-source drain (availableNow)."""

import os

import pytest

from information_extraction_from_biographies_spark import fixtures as fx
from information_extraction_from_biographies_spark.operators import mentions, normalize, scan
from information_extraction_from_biographies_spark.streaming import stage1


@pytest.fixture(scope="module")
def landing(tmp_path_factory, spark):
    """Fixture transcripts written as two parquet 'arrivals'."""
    d = tmp_path_factory.mktemp("landing")
    f = fx.make_fixture(n_convs=6, seed=7)
    sdf = fx.transcripts_sdf(spark, f)
    sdf.filter("turn_idx < 2").coalesce(1).write.parquet(os.path.join(d, "batch1"))
    sdf.filter("turn_idx >= 2").coalesce(1).write.parquet(os.path.join(d, "batch2"))
    # file source reads a flat dir of files: point at */*.parquet via glob dir
    return str(d) + "/*", f, sdf


def _index_for(spark, sdf):
    turns, meta = normalize.normalize(sdf)
    people, aliases = mentions.build_registry(*mentions.extract_people(turns, meta))
    return scan.build_surface_index(mentions.registry_surfaces(people, aliases))


def test_streaming_mentions_match_batch_scan(spark, landing, tmp_path):
    glob, f, sdf = landing
    index = _index_for(spark, sdf)
    stream = stage1.read_transcript_stream(spark, glob, max_files_per_trigger=1)
    assert stream.isStreaming
    ment = stage1.streaming_mentions(stream, index)
    stage1.run_available_now(ment, str(tmp_path / "ckpt1"), "stream_mentions")
    got = {
        (r.conv_id, r.turn_idx, r.person, r.surface)
        for r in spark.sql("SELECT * FROM stream_mentions").collect()
    }
    # batch oracle: same automaton applied per turn
    idx = index.local()
    expect = set()
    for row in sdf.collect():
        if row.text:
            for person, surface, _k in idx.persons_in(row.text):
                expect.add((row.conv_id, row.turn_idx, person, surface))
    assert got == expect
    assert len(got) > 0


def test_streaming_windowed_activity(spark, landing, tmp_path):
    glob, f, sdf = landing
    stream = stage1.read_transcript_stream(spark, glob)
    agg = stage1.windowed_conv_activity(stream, watermark="5 minutes", window="1 hour")
    stage1.run_available_now(agg, str(tmp_path / "ckpt2"), "stream_activity", "complete")
    rows = spark.sql("SELECT * FROM stream_activity").collect()
    # fixture: 4 turns per conv, one conv per hour slot (ts = epoch + i hours)
    assert {r.n_turns for r in rows} == {4}
    assert {r.conv_id for r in rows} == {t.conv_id for t in f.truths}
    assert all(r.max_turn_idx == 3 for r in rows)


def test_streaming_exact_dedup_drops_in_horizon_duplicates(spark, tmp_path):
    """streaming/dedup: duplicate payloads inside the watermark horizon are
    dropped; distinct payloads all land; output carries content_hash."""
    import datetime

    from information_extraction_from_biographies_spark.streaming import dedup as sdedup
    from information_extraction_from_biographies_spark.streaming.stage1 import (
        TRANSCRIPT_SCHEMA,
        read_transcript_stream,
        run_available_now,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows1 = [
        ("d1", 0, "user", "same payload", None, t0),
        ("d2", 0, "user", "same payload", None, t0 + datetime.timedelta(minutes=1)),
        ("d3", 0, "user", "unique one", None, t0 + datetime.timedelta(minutes=2)),
    ]
    rows2 = [
        ("d4", 0, "user", "same payload", None, t0 + datetime.timedelta(minutes=3)),
        ("d5", 0, "user", "unique two", None, t0 + datetime.timedelta(minutes=4)),
    ]
    d = tmp_path / "dedup_landing"
    spark.createDataFrame(rows1, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(
        str(d / "b1")
    )
    spark.createDataFrame(rows2, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(
        str(d / "b2")
    )
    stream = read_transcript_stream(spark, str(d) + "/*", max_files_per_trigger=1)
    deduped = sdedup.streaming_exact_dedup(stream, watermark="10 minutes")
    run_available_now(deduped, str(tmp_path / "ckpt_dedup"), "stream_dedup")
    out = spark.sql("SELECT conv_id, text, content_hash FROM stream_dedup").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["same payload", "unique one", "unique two"]
    assert all(len(r["content_hash"]) == 32 for r in out)


def test_latest_snapshot_raises_on_branched_chain(tmp_path):
    """Two snapshots chained on one parent fork the history; the tip
    resolver must refuse (the old dict comprehension kept an ARBITRARY
    child, so restarts could chain onto different branches)."""
    import json
    import os

    import pytest

    from information_extraction_from_biographies_spark.streaming.ingest import (
        latest_snapshot,
    )

    wh = str(tmp_path / "wh")
    inc = os.path.join(wh, "_incremental")
    os.makedirs(inc)
    with open(os.path.join(inc, "b1.json"), "w") as f:
        json.dump({"parent": "s0"}, f)
    # linear chain resolves
    assert latest_snapshot(wh, "s0") == "b1"
    with open(os.path.join(inc, "x1.json"), "w") as f:
        json.dump({"parent": "s0"}, f)
    with pytest.raises(ValueError, match="branched"):
        latest_snapshot(wh, "s0")
