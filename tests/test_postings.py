"""Gram posting index (operators/postings.py) and the ``rescan="indexed"``
affected-history detection built on it.

The contract under test: the index yields a candidate-conversation
SUPERSET of the true changed-surface matches (never a false negative —
exactness keystone), the min-df gram selection keeps candidates tight,
and an ``indexed`` incremental run produces output identical to the
``exact`` full-scan run — including the committed excluded_convs table —
with graceful fallback to the full scan when the base chain lacks the
index."""

import os
import random

from pyspark.sql import functions as F  # noqa: N812

from information_extraction_from_biographies_spark import fixtures as fx
from information_extraction_from_biographies_spark.operators import postings
from information_extraction_from_biographies_spark.plans.incremental import IncrementalPipeline
from information_extraction_from_biographies_spark.plans.pipeline import Pipeline

from test_incremental import _assert_equal_results, _rows, _split_convs


def test_gram_filter_never_false_negative(spark):
    """For random texts and random contained substrings, every query gram
    of the surface is a gram of the text — the property that makes the
    index an exact FILTER (superset of true matches)."""
    rng = random.Random(7)
    alphabet = "甲乙丙丁戊字號先生xyz ，。"
    rows, pairs = [], []
    for i in range(80):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        rows.append((f"c{i}", text))
        lo = rng.randrange(len(text))
        hi = min(len(text), lo + rng.randint(1, 6))
        pairs.append((f"c{i}", text[lo:hi]))
    turns = spark.createDataFrame(rows, "conv_id string, norm_text string")
    tg = {}
    for r in postings.conv_grams(turns).collect():
        tg.setdefault(r["conv_id"], set()).add(r["gram"])
    surf = spark.createDataFrame(
        [(s,) for _, s in pairs if s], "surface string"
    ).distinct()
    qg = {}
    for r in postings.surface_query_grams(surf).collect():
        qg.setdefault(r["surface"], set()).add(r["gram"])
    for cid, s in pairs:
        if not s:
            continue
        assert qg[s] <= tg[cid], f"false negative possible: {s!r} in conv {cid}"


def test_candidate_convs_min_df_and_absent_grams(spark):
    turns = spark.createDataFrame(
        [("c1", "abc"), ("c2", "bcd"), ("c3", "xyz")],
        "conv_id string, norm_text string",
    )
    idx = postings.conv_grams(turns)

    def cands(*surfaces):
        q = postings.surface_query_grams(
            spark.createDataFrame([(s,) for s in surfaces], "surface string")
        )
        return {r["conv_id"] for r in postings.candidate_convs(idx, q).collect()}

    # 'bc' occurs in c1 and c2 — its posting list is the candidate set
    assert cands("bc") == {"c1", "c2"}
    # 'abc' has grams {ab, bc}; df(ab)=1 < df(bc)=2 → only c1 verifies
    assert cands("abc") == {"c1"}
    # absent gram → the surface cannot match anywhere → no candidates
    assert cands("zz") == set()
    assert cands("zz", "xy") == {"c3"}
    # single-char surface queries its unigram
    assert cands("y") == {"c3"}


def test_stop_gram_split_and_unprunable(spark):
    """hot_grams drops exactly the over-cap grams; apply_stops filters
    both index and query sides; a surface whose every gram is stopped is
    flagged unprunable (the full-scan fallback trigger)."""
    turns = spark.createDataFrame(
        [("c1", "abx"), ("c2", "aby"), ("c3", "abz"), ("c4", "qq")],
        "conv_id string, norm_text string",
    )
    raw = postings.conv_grams(turns)
    stops = postings.hot_grams(raw, max_df=2)  # a, b, ab are in 3 convs
    assert {r["gram"] for r in stops.collect()} == {"a", "b", "ab"}
    kept = postings.apply_stops(raw, stops)
    assert {r["gram"] for r in kept.collect()} & {"a", "b", "ab"} == set()

    surf = spark.createDataFrame(
        [("ab",), ("abx",), ("qq",)], "surface string"
    )
    qg = postings.surface_query_grams(surf)
    unpr = {r["surface"] for r in postings.unprunable_surfaces(qg, stops).collect()}
    assert unpr == {"ab"}  # its only gram is stopped
    usable = postings.apply_stops(qg, stops)
    # 'abx' still prunable via its unstopped gram 'bx'
    cands = {
        r["conv_id"]
        for r in postings.candidate_convs(kept, usable).collect()
    }
    assert cands == {"c1", "c4"}


def test_indexed_exact_when_everything_stopped(spark, tmp_path):
    """Adversarial cap: gram_max_df=0 stops EVERY gram — the index holds
    nothing, every changed surface is unprunable, and detection must
    fall back to the full scan and still match the exact run table-for-
    table (the exactness keystone of the stop-gram design)."""
    fixture = fx.make_fixture(n_convs=16, seed=13)
    base_t, delta_t = _split_convs(spark, fixture, 11)
    wh = str(tmp_path / "wh")
    pipe = Pipeline(spark, wh, snapshot_id="s1", gram_max_df=0)
    pipe.run(base_t)
    assert pipe.store.read("turn_grams", "s1").count() == 0
    assert pipe.store.read("gram_stops", "s1").count() > 0
    inc = IncrementalPipeline(spark, wh, "s1", "s2").run(delta_t, rescan="indexed")
    full = Pipeline(spark, str(tmp_path / "f"), snapshot_id="f1").run(
        fx.transcripts_sdf(spark, fixture)
    )
    _assert_equal_results(inc, full)


def test_ensure_gram_index_backfill(spark, tmp_path):
    """A chain built WITHOUT the index (gram_index=False) gets it
    backfilled level-by-level; a subsequent indexed delta engages the
    index (no fallback) and matches the batch recompute."""
    from information_extraction_from_biographies_spark.plans.incremental import (
        chain_has,
        ensure_gram_index,
    )

    fixture = fx.make_fixture(n_convs=18, seed=17)
    sdf = fx.transcripts_sdf(spark, fixture)
    ids = [r["conv_id"] for r in sdf.select("conv_id").distinct().orderBy("conv_id").collect()]
    wh = str(tmp_path / "wh")
    p = Pipeline(spark, wh, snapshot_id="s1", gram_index=False)
    p.run(sdf.filter(F.col("conv_id").isin(ids[:9])))
    IncrementalPipeline(spark, wh, "s1", "s2").run(
        sdf.filter(F.col("conv_id").isin(ids[9:13])), rescan="exact"
    )
    store = p.store
    assert not chain_has(store, "turn_grams", "s2")
    done = ensure_gram_index(store, "s2")
    assert {d.split(":")[1] for d in done} == {"gram_stops", "turn_grams"}
    assert chain_has(store, "turn_grams", "s2")
    # idempotent
    assert ensure_gram_index(store, "s2") == []
    inc = IncrementalPipeline(spark, wh, "s2", "s3").run(
        sdf.filter(F.col("conv_id").isin(ids[13:])), rescan="indexed"
    )
    full = Pipeline(spark, str(tmp_path / "f"), snapshot_id="f1").run(sdf)
    _assert_equal_results(inc, full)


def test_compact_rebuilds_index(spark, tmp_path):
    """compact_snapshot re-derives gram_stops + turn_grams from the
    compacted turns (not a copy of the stop-filtered chain view); an
    indexed delta over the compacted base matches the batch recompute."""
    from information_extraction_from_biographies_spark.plans.incremental import (
        compact_snapshot,
        full_view_stops,
    )

    fixture = fx.make_fixture(n_convs=18, seed=19)
    sdf = fx.transcripts_sdf(spark, fixture)
    ids = [r["conv_id"] for r in sdf.select("conv_id").distinct().orderBy("conv_id").collect()]
    wh = str(tmp_path / "wh")
    # tiny cap at the base → real stops exist on the chain
    p = Pipeline(spark, wh, snapshot_id="s1", gram_max_df=3)
    p.run(sdf.filter(F.col("conv_id").isin(ids[:9])))
    store = p.store
    assert store.read("gram_stops", "s1").count() > 0
    IncrementalPipeline(spark, wh, "s1", "s2").run(
        sdf.filter(F.col("conv_id").isin(ids[9:13])), rescan="indexed"
    )
    compact_snapshot(store, "s2", "c1")
    assert store.is_committed("turn_grams", "c1")
    assert store.is_committed("gram_stops", "c1")
    # the rebuilt stoplist is derived at the DEFAULT cap over 13 convs —
    # max(200, ...) exceeds any df here, so the inherited tiny-cap stops
    # are healed away
    assert full_view_stops(store, "c1").count() == 0
    inc = IncrementalPipeline(spark, wh, "c1", "s3").run(
        sdf.filter(F.col("conv_id").isin(ids[13:])), rescan="indexed"
    )
    full = Pipeline(spark, str(tmp_path / "f"), snapshot_id="f1").run(sdf)
    _assert_equal_results(inc, full)


def test_indexed_rescan_matches_exact(spark, tmp_path):
    """indexed == exact on the committed excluded set AND every output
    table, against a bucketed base (pruned postings + turn reads) and a
    batch recompute as ground truth."""
    fixture = fx.make_fixture(n_convs=18, seed=3)
    base_t, delta_t = _split_convs(spark, fixture, 12)

    we = str(tmp_path / "exact")
    wi = str(tmp_path / "indexed")
    Pipeline(spark, we, snapshot_id="s1").run(base_t)
    Pipeline(spark, wi, snapshot_id="s1", buckets=8).run(base_t)
    exact = IncrementalPipeline(spark, we, "s1", "s2").run(delta_t, rescan="exact")
    pipe_i = IncrementalPipeline(spark, wi, "s1", "s2", buckets=8)
    indexed = pipe_i.run(delta_t, rescan="indexed")

    ex = {r["conv_id"] for r in IncrementalPipeline(
        spark, we, "s1", "x"
    ).store.read("excluded_convs", "s2").collect()}
    ix = {r["conv_id"] for r in pipe_i.store.read("excluded_convs", "s2").collect()}
    assert ix == ex, "indexed detection diverged from the exact scan"
    # the fixture guarantees a real historical rescan (shared aliases)
    delta_ids = {r["conv_id"] for r in delta_t.select("conv_id").distinct().collect()}
    assert ex - delta_ids, "scenario lost its historical-rescan coverage"

    _assert_equal_results(indexed, exact)
    full = Pipeline(spark, str(tmp_path / "f"), snapshot_id="f1").run(
        fx.transcripts_sdf(spark, fixture)
    )
    _assert_equal_results(indexed, full)


def test_indexed_falls_back_without_index(spark, tmp_path):
    """A base chain that predates turn_grams (simulated by dropping its
    lineage) must still produce the exact output — detection silently
    degrades to the full scan."""
    fixture = fx.make_fixture(n_convs=14, seed=5)
    base_t, delta_t = _split_convs(spark, fixture, 9)
    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="s1").run(base_t)
    pipe = IncrementalPipeline(spark, wh, "s1", "s2")
    os.remove(pipe.store._lineage_path("turn_grams", "s1"))
    from information_extraction_from_biographies_spark.plans.incremental import chain_has

    assert not chain_has(pipe.store, "turn_grams", "s1")
    inc = pipe.run(delta_t, rescan="indexed")
    full = Pipeline(spark, str(tmp_path / "f"), snapshot_id="f1").run(
        fx.transcripts_sdf(spark, fixture)
    )
    _assert_equal_results(inc, full)


def test_full_view_buckets_prunes_files(spark, tmp_path):
    """The pruned chained read must actually read fewer data files than
    the full view on an aligned bucketed snapshot (the I/O claim), and a
    misaligned bucket count must degrade to the full read, never a wrong
    subset."""
    from information_extraction_from_biographies_spark.plans.incremental import full_view_buckets
    from information_extraction_from_biographies_spark.sources.checkpoint import CheckpointStore

    store = CheckpointStore(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(f"g{i}", f"c{i % 5}") for i in range(200)], "gram string, conv_id string"
    )
    store.commit(df, "turn_grams", "s1", bucket_keys="gram", buckets=8)
    pruned = full_view_buckets(store, "turn_grams", "s1", "gram", 8, [0, 1])
    assert 0 < len(pruned.inputFiles()) < len(store.read("turn_grams", "s1").inputFiles())
    # aligned read returns exactly the two buckets' rows
    got = {r["gram"] for r in pruned.collect()}
    by_b = {
        r["gram"]
        for r in store.read("turn_grams", "s1")
        .select("gram", F.pmod(F.hash("gram"), F.lit(8)).alias("b"))
        .filter(F.col("b") < 2)
        .collect()
    }
    assert got == by_b
    # foreign count → full read (superset), never a wrong subset
    mis = full_view_buckets(store, "turn_grams", "s1", "gram", 16, [0, 1])
    assert mis.count() == 200


def test_indexed_chain_matches_full(spark, tmp_path):
    """Two chained indexed deltas over a bucketed base: the turn_grams
    REPLACE chain resolves through full_view_buckets at every level and
    the tip equals the batch recompute."""
    fixture = fx.make_fixture(n_convs=18, seed=11)
    sdf = fx.transcripts_sdf(spark, fixture)
    ids = [r["conv_id"] for r in sdf.select("conv_id").distinct().orderBy("conv_id").collect()]
    parts = [set(ids[:10]), set(ids[10:14]), set(ids[14:])]
    wh = str(tmp_path / "wh")
    Pipeline(spark, wh, snapshot_id="s1", buckets=8).run(
        sdf.filter(F.col("conv_id").isin(list(parts[0])))
    )
    IncrementalPipeline(spark, wh, "s1", "s2", buckets=8).run(
        sdf.filter(F.col("conv_id").isin(list(parts[1]))), rescan="indexed"
    )
    inc = IncrementalPipeline(spark, wh, "s2", "s3", buckets=8).run(
        sdf.filter(F.col("conv_id").isin(list(parts[2]))), rescan="indexed"
    )
    full = Pipeline(spark, str(tmp_path / "f"), snapshot_id="f1").run(sdf)
    _assert_equal_results(inc, full)
