"""Stateful streaming: incremental per-conv mention dedup across
micro-batches (applyInPandasWithState)."""

import os

from information_extraction_from_biographies_spark import fixtures as fx
from information_extraction_from_biographies_spark.operators import mentions, normalize, scan
from information_extraction_from_biographies_spark.streaming import stage1, stateful


def test_incremental_mentions_dedup_across_batches(spark, tmp_path):
    f = fx.make_fixture(n_convs=5, seed=7)
    sdf = fx.transcripts_sdf(spark, f)
    d = tmp_path / "landing"
    d.mkdir()
    # two file-arrivals: a person mentioned in both halves must be emitted once
    sdf.filter("turn_idx < 2").coalesce(1).write.parquet(str(d / "b1"))
    sdf.filter("turn_idx >= 2").coalesce(1).write.parquet(str(d / "b2"))

    turns, meta = normalize.normalize(sdf)
    people, aliases = mentions.build_registry(*mentions.extract_people(turns, meta))
    index = scan.build_surface_index(mentions.registry_surfaces(people, aliases))

    stream = stage1.read_transcript_stream(spark, str(d) + "/*", max_files_per_trigger=1)
    # ttl_minutes=0 → NoTimeout: a bounded availableNow drain must not
    # wait for the processing-time horizon
    out = stateful.incremental_conv_mentions(stream, index, ttl_minutes=0)
    stage1.run_available_now(out, str(tmp_path / "ckpt"), "inc_mentions")
    rows = spark.sql("SELECT * FROM inc_mentions").collect()

    # exactly-once per (conv, person)
    keys = [(r.conv_id, r.person) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate person emission across batches"

    # completeness: equals the batch repeatOK=False scan over raw text
    idx = index.local()
    expect = set()
    first_turn = {}
    for row in sorted(sdf.collect(), key=lambda r: (r.conv_id, r.turn_idx)):
        if row.text:
            for person in idx.distinct_persons_in(row.text):
                if (row.conv_id, person) not in expect:
                    expect.add((row.conv_id, person))
                    first_turn[(row.conv_id, person)] = row.turn_idx
    assert set(keys) == expect
    # first_turn_idx is the first batch-order turn containing the person
    for r in rows:
        assert r.first_turn_idx == first_turn[(r.conv_id, r.person)]


def test_first_turn_correct_when_group_spans_chunks(spark, tmp_path):
    """applyInPandasWithState delivers a big group as MULTIPLE pandas
    chunks with no cross-chunk order; first_turn_idx must be the
    conversation's true first mentioning turn, not the minimum of
    whichever chunk happened to arrive first (rows are written in
    DESCENDING turn order so the real first turn lands in the LAST
    chunk)."""
    from pyspark.sql import functions as F

    from information_extraction_from_biographies_spark.functions.matcher import (
        SurfaceIndexHandle,
    )

    rows = [("c1", t, f"第{t}回提到陳大明先生") for t in range(40)]
    sdf = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    d = tmp_path / "landing"
    d.mkdir()
    (
        sdf.coalesce(1)
        .sortWithinPartitions(F.desc("turn_idx"))
        .write.parquet(str(d / "b1"))
    )

    index = SurfaceIndexHandle(spark, [("陳大明", "陳大明", "name")])
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        stream = stage1.read_transcript_stream(spark, str(d) + "/*", max_files_per_trigger=1)
        out = stateful.incremental_conv_mentions(stream, index, ttl_minutes=0)
        stage1.run_available_now(out, str(tmp_path / "ckpt"), "chunked_mentions")
        got = spark.sql("SELECT * FROM chunked_mentions").collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert [(r.conv_id, r.person, r.first_turn_idx) for r in got] == [
        ("c1", "陳大明", 0)
    ]
