"""Property tests for the in-UDF co-occurrence kernel (no Spark):
conv_pair_scores must equal a brute-force reference-fold implementation."""

import random

from information_extraction_from_biographies_spark.operators.cooccurrence import (
    conv_pair_scores,
    fold_scores,
)


def brute_force(positions_by_person, biographee, detected):
    pairs = {}
    persons = sorted(positions_by_person)
    for i, p1 in enumerate(persons):
        for p2 in persons[i + 1 :]:
            ds = [
                abs(a - b) + 1
                for a in positions_by_person[p1]
                for b in positions_by_person[p2]
            ]
            key = (min(p1, p2), max(p1, p2))
            pairs.setdefault(key, []).extend(ds)
    if biographee is not None:
        for p in detected:
            if p != biographee:
                key = (min(p, biographee), max(p, biographee))
                pairs.setdefault(key, []).append(2.0)
    # reference sequential fold (Cooccurrence.py:92-111)
    out = {}
    for key, ds in pairs.items():
        ds = sorted(ds)
        score = 4.0 / ds[0]
        depre = 0.65
        for d in ds[1:]:
            score += 4.0 / d * depre
            depre **= 2
            if depre == 0.0:
                break
        out[key] = score
    return out


def test_fold_matches_reference_weight_sequence():
    ds = [2.0, 3.0, 5.0, 7.0, 11.0]
    want = 4 / 2 + 4 / 3 * 0.65 + 4 / 5 * 0.65**2 + 4 / 7 * 0.65**4 + 4 / 11 * 0.65**8
    assert abs(fold_scores(ds) - want) < 1e-12
    # order-insensitive (sorted internally)
    assert fold_scores([11.0, 2.0, 7.0, 3.0, 5.0]) == fold_scores(ds)


def test_conv_pair_scores_matches_brute_force_random():
    rng = random.Random(17)
    for trial in range(25):
        persons = [f"p{i}" for i in range(rng.randint(1, 8))]
        pos = {
            p: [rng.randint(1, 60) for _ in range(rng.randint(1, 12))]
            for p in persons
            if rng.random() > 0.1
        }
        detected = [p for p in persons if rng.random() > 0.3]
        bio = rng.choice(persons + [None])
        got = {(a, b): s for a, b, s in conv_pair_scores(pos, bio, detected)}
        want = brute_force(pos, bio, detected)
        assert set(got) == set(want), (trial, got.keys() ^ want.keys())
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, (trial, k, got[k], want[k])


def test_top_k_truncation_exact_on_many_duplicates():
    # a hub pair with hundreds of occurrences — truncation must not change
    # the score (weights beyond ~13th term underflow to exactly 0.0)
    pos = {"a": list(range(1, 300)), "b": list(range(1, 300))}
    got = {(a, b): s for a, b, s in conv_pair_scores(pos, None, [])}
    want = brute_force(pos, None, [])
    ((k, v),) = want.items()
    assert abs(got[k] - v) < 1e-12
