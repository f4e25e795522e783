"""Skew smoke (SURVEY §5.6): one giant conversation among small ones —
the pipeline must complete with correct per-conv structure, the giant
conv's O(M²) pair generation included (AQE skew-join + explicit
repartition spread)."""

import pandas as pd

from information_extraction_from_biographies_spark import fixtures as fx
from information_extraction_from_biographies_spark.operators import (
    cooccurrence,
    mentions,
    normalize,
    scan,
)


def _skewed_transcripts(spark, n_small=20, giant_reps=60):
    f = fx.make_fixture(n_convs=n_small, seed=7)
    t = f.transcripts
    giant_conv = t[t.conv_id == f.truths[0].conv_id]
    career = giant_conv[giant_conv.turn_idx.isin([1, 2])]
    reps = [giant_conv]
    for r in range(giant_reps):
        c = career.copy()
        c["turn_idx"] = c["turn_idx"] + 2 * (r + 1)
        reps.append(c)
    skewed = pd.concat([t[t.conv_id != f.truths[0].conv_id], *reps], ignore_index=True)
    return (
        spark.createDataFrame(
            skewed,
            schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        ),
        f,
    )


def test_skewed_conv_completes_with_correct_structure(spark):
    tdf, f = _skewed_transcripts(spark)
    giant = f.truths[0].conv_id
    turns, meta = normalize.normalize(tdf)
    people, aliases = mentions.build_registry(*mentions.extract_people(turns, meta))
    index = scan.build_surface_index(mentions.registry_surfaces(people, aliases))
    rows = scan.scan_mentions(turns, index)
    cooc = cooccurrence.cooccurrence_scores(
        scan.occurrences(rows), scan.persons_in_conv(rows), meta
    ).persist()

    per_conv = {r.conv_id: r.n for r in cooc.groupBy("conv_id").count().withColumnRenamed("count", "n").collect()}
    # giant conv produced pairs and didn't crash; small convs unaffected
    assert per_conv[giant] > 0
    small = [v for k, v in per_conv.items() if k != giant]
    assert len(small) == 19 and all(v > 0 for v in small)

    # repeated-mention scoring: the giant conv's repeated pairs still obey
    # the closed-form depreciation (score is finite and positive)
    giant_scores = [r.score for r in cooc.filter(cooc.conv_id == giant).collect()]
    assert all(s > 0 and s == s for s in giant_scores)  # no NaN/inf blowup
    cooc.unpersist()


def test_iter_key_groups_raises_on_non_contiguous_key():
    """pre_sorted contract guard: a key recurring after its group closed
    (unsorted/mis-partitioned input) must raise, not silently fragment."""
    import pandas as pd
    import pytest

    from information_extraction_from_biographies_spark.functions.grouped import iter_key_groups

    def batches(frames):
        return iter([pd.DataFrame(f) for f in frames])

    # sorted input: fine, groups stay whole across batch boundaries
    ok = list(
        iter_key_groups(
            batches([
                {"conv_id": ["a", "a", "b"], "x": [1, 2, 3]},
                {"conv_id": ["b", "c"], "x": [4, 5]},
            ]),
            key="conv_id",
        )
    )
    assert [g["conv_id"].iloc[0] for g in ok] == ["a", "b", "c"]
    assert [len(g) for g in ok] == [2, 2, 1]

    # key 'a' recurs after 'b' closed it out -> fragmentation -> raise
    with pytest.raises(RuntimeError, match="recurred non-contiguously"):
        list(
            iter_key_groups(
                batches([
                    {"conv_id": ["a", "b"], "x": [1, 2]},
                    {"conv_id": ["a", "c"], "x": [3, 4]},
                ]),
                key="conv_id",
            )
        )


def test_cc_local_path_matches_distributed(spark):
    """The size-gated driver union-find and the iterative join loop agree
    exactly (component = minimum member) on random graphs, long chains,
    and string vertices."""
    import random

    from information_extraction_from_biographies_spark.operators.canonicalize import (
        connected_components,
    )

    rng = random.Random(9)
    edge_sets = [
        [(rng.randrange(120), rng.randrange(120)) for _ in range(150)],  # random
        [(i, i + 1) for i in range(80)],                                  # chain
        [],                                                               # empty
    ]
    for edges in edge_sets:
        df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
        if not edges:
            df = df.filter("src > 0")  # truly empty with schema
        local = {
            (r["vertex"], r["component"])
            for r in connected_components(df).collect()
        }
        dist = {
            (r["vertex"], r["component"])
            for r in connected_components(df, local_threshold=0).collect()
        }
        assert local == dist
    # string vertices: python code-point order == spark binary order
    sdf = spark.createDataFrame(
        [("陳一", "林二"), ("林二", "abc"), ("x", "y")], "src string, dst string"
    )
    local = {tuple(r) for r in connected_components(sdf).collect()}
    dist = {tuple(r) for r in connected_components(sdf, local_threshold=0).collect()}
    assert local == dist
