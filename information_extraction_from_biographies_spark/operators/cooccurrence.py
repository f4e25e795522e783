"""A2/A3/A4 — weighted depreciating co-occurrence scores.

The reference materializes every mention-pair distance, sorts, and folds
sequentially with a squared depreciation (Cooccurrence.py:92-111). The
fold LOOKS order-sensitive, but the weight of the k-th smallest distance
is closed-form:

    weight(1) = 1
    weight(k) = 0.65 ** (2 ** (k-2))      for k >= 2
    score     = Σ_k (4 / d_k) * weight(k)

so the engine computes it with `row_number()` over (pair, distance-rank)
plus `pow` — no collect_list, no ordered buffer, fully parallel, safe on
hot pairs (weights underflow to 0 by k≈40; no cap needed for float64).

Pair generation (A3) is a per-conversation self-join on the positioned
occurrences (O(M²) per conversation, bounded by conversation length; AQE
skew-join splits oversized post-shuffle partitions for giant convs).
The biographee prior (A4, distance 2) unions in before ranking, exactly
as the reference appends it before sorting (Cooccurrence.py:29).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from ..gazetteers import DEPRECIATE_FACTOR, DISTANCE2SCORE_FACTOR, DISTANCE_TO_BIOGRAPHEE


def pair_distances(occurrences: DataFrame) -> DataFrame:
    """A3: all unordered occurrence pairs within a conversation, distance =
    pos_j - pos_i + 1 (Cooccurrence.py:68-78). Occurrences are one row per
    (clause, person, surface) containment."""
    w = Window.partitionBy("conv_id").orderBy("pos", "person", "surface")
    occ = occurrences.withColumn("seq", F.row_number().over(w))
    o1 = occ.select(
        "conv_id",
        F.col("person").alias("p1"),
        F.col("pos").alias("pos1"),
        F.col("seq").alias("seq1"),
    )
    o2 = occ.select(
        "conv_id",
        F.col("person").alias("p2"),
        F.col("pos").alias("pos2"),
        F.col("seq").alias("seq2"),
    )
    return (
        o1.join(o2, "conv_id")
        .filter((F.col("seq1") < F.col("seq2")) & (F.col("p1") != F.col("p2")))
        .select(
            "conv_id",
            F.least("p1", "p2").alias("name1"),
            F.greatest("p1", "p2").alias("name2"),
            (F.col("pos2") - F.col("pos1") + F.lit(1)).cast("double").alias("distance"),
        )
    )


def biographee_priors(persons_in_conv: DataFrame, meta: DataFrame) -> DataFrame:
    """A4: constant distance-2 pair between every detected person and the
    conversation's biographee (Cooccurrence.py:81-89).

    No broadcast hint: both sides are per-conversation (corpus-scale), so
    a forced broadcast of meta is a driver OOM at 10^12 turns. The un-
    hinted equi-join on conv_id lets AQE broadcast only when the runtime
    size is actually under the threshold, and degrades to a co-partitioned
    shuffle join otherwise."""
    joined = persons_in_conv.join(
        meta.select("conv_id", "biographee"), "conv_id", "inner"
    ).filter(F.col("biographee").isNotNull())
    return joined.select(
        "conv_id",
        F.least("person", "biographee").alias("name1"),
        F.greatest("person", "biographee").alias("name2"),
        F.lit(float(DISTANCE_TO_BIOGRAPHEE)).alias("distance"),
    )


def score_pairs(distances: DataFrame) -> DataFrame:
    """A2: rank-weighted sum per (conv_id, name1, name2); see module doc."""
    w = Window.partitionBy("conv_id", "name1", "name2").orderBy("distance")
    ranked = distances.filter(F.col("name1") != F.col("name2")).withColumn(
        "k", F.row_number().over(w)
    )
    weight = F.when(F.col("k") == 1, F.lit(1.0)).otherwise(
        F.pow(F.lit(DEPRECIATE_FACTOR), F.pow(F.lit(2.0), F.col("k") - 2))
    )
    contrib = (F.lit(DISTANCE2SCORE_FACTOR) / F.col("distance")) * weight
    return (
        ranked.withColumn("contrib", contrib)
        .groupBy("conv_id", "name1", "name2")
        .agg(F.sum("contrib").alias("score"))
    )


def cooccurrence_scores(
    occurrences: DataFrame, persons_in_conv: DataFrame, meta: DataFrame
) -> DataFrame:
    """→ (conv_id, name1, name2, score), name1 < name2."""
    dists = pair_distances(occurrences).unionByName(biographee_priors(persons_in_conv, meta))
    return score_pairs(dists)


# ------------------------------------------------- in-UDF per-conv path
def fold_scores(distances: list[float]) -> float:
    """The reference's sequential fold (Cooccurrence.py:92-111): sorted
    ascending; first term full, k-th term depreciated by 0.65^(2^(k-2))."""
    ds = sorted(distances)
    if not ds:
        return 0.0
    score = DISTANCE2SCORE_FACTOR / ds[0]
    depre = DEPRECIATE_FACTOR
    for d in ds[1:]:
        score += DISTANCE2SCORE_FACTOR / d * depre
        depre **= 2
        if depre == 0.0:  # weights underflow; remaining terms are exact zero
            break
    return score


# 0.65^(2^(k-2)) < 5e-324 (double denormal floor) by k ≈ 12; keeping a few
# extra is free and guards the exact-parity fold above.
_TOP_K_DISTANCES = 64


def conv_pair_scores(
    positions_by_person: dict[str, list[int]],
    biographee: str | None,
    detected: list[str],
) -> list[tuple[str, str, float]]:
    """Per-conversation A3+A4+A2 without any shuffle: pairwise |Δpos|+1
    distances per unordered person pair + the distance-2 biographee prior,
    folded with the reference depreciation. Vectorized with numpy per pair
    so a giant (skewed) conversation stays O(|PA|·|PB|) flops, and only the
    _TOP_K_DISTANCES smallest distances feed the fold (all later weights
    underflow to exactly 0.0 in float64).

    Distance note: the reference orders occurrences and uses
    pos_j - pos_i + 1 for j > i (Cooccurrence.py:68-78); across two
    different persons that equals |pos_a - pos_b| + 1 for every cross pair,
    so the unordered cross product is semantics-exact."""
    import numpy as np

    persons = sorted(positions_by_person)
    out: list[tuple[str, str, float]] = []
    prior: dict[tuple[str, str], list[float]] = {}
    if biographee is not None:
        for p in detected:
            if p != biographee:
                key = (min(p, biographee), max(p, biographee))
                prior.setdefault(key, []).append(float(DISTANCE_TO_BIOGRAPHEE))

    # numpy only above the crossover: the typical conversation yields
    # 2-5 occurrence positions per person, where five numpy calls per
    # pair cost more than the whole cross product in a list comp; the
    # vectorized path exists for the skewed giant conversation. Arrays
    # build lazily inside the loop — only for persons whose pairs
    # actually cross the threshold — and cache for the person's
    # remaining pairs.
    _NP_CROSSOVER = 256
    arrays: dict[str, np.ndarray] = {}
    pair_dists: dict[tuple[str, str], list[float]] = dict(prior)
    for i, p1 in enumerate(persons):
        pa = positions_by_person[p1]
        for p2 in persons[i + 1 :]:
            pb = positions_by_person[p2]
            key = (p1, p2) if p1 < p2 else (p2, p1)
            if len(pa) * len(pb) <= _NP_CROSSOVER:
                d_list = [
                    float(x - y + 1) if x >= y else float(y - x + 1)
                    for x in pa
                    for y in pb
                ]
                if len(d_list) > _TOP_K_DISTANCES:
                    d_list.sort()
                    d_list = d_list[:_TOP_K_DISTANCES]
                pair_dists.setdefault(key, []).extend(d_list)
                continue
            a = arrays.get(p1)
            if a is None:
                a = arrays[p1] = np.asarray(pa, dtype=np.int64)
            b = arrays.get(p2)
            if b is None:
                b = arrays[p2] = np.asarray(pb, dtype=np.int64)
            d = (np.abs(a[:, None] - b[None, :]) + 1).ravel()
            if d.size > _TOP_K_DISTANCES:
                d = np.partition(d, _TOP_K_DISTANCES)[:_TOP_K_DISTANCES]
            pair_dists.setdefault(key, []).extend(d.tolist())
    for (n1, n2), ds in pair_dists.items():
        out.append((n1, n2, fold_scores(ds)))
    return out
