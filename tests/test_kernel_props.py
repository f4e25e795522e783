"""Property tests (Hypothesis) for the scan/clause kernels.

The J1 automaton and the X4/W1 clause splitter carry the engine's
position-sensitive semantics; both have independent oracles — naive
substring containment and the simulator's literal re-scan loop
(`reference_simulator.clause_positions`, a structurally different
implementation of Cooccurrence.py:35-65). Hypothesis drives them over a
deliberately tiny alphabet so surfaces overlap densely (shared prefixes
/ suffixes are what stress Aho-Corasick failure links) and delimiter
runs collide (。 vs 。\\n\\n backtracking).

Pure-Python kernels — no SparkSession needed.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import reference_simulator as sim
from information_extraction_from_biographies_spark.functions.clauses import (
    split_clauses_with_positions,
)
from information_extraction_from_biographies_spark.functions.matcher import (
    SurfaceIndex,
)

# 5 CJK chars → length-≤4 surfaces collide constantly
ALPHA = "甲乙丙丁戊"
SURFACE = st.text(alphabet=ALPHA, min_size=1, max_size=4)
TEXT = st.text(alphabet=ALPHA + "，。\n一a ", max_size=80)

REGISTRY = st.lists(
    st.tuples(SURFACE, st.sampled_from(["陳一", "林二", "黃三"]),
              st.sampled_from(["name", "字", "號"])),
    min_size=1,
    max_size=12,
)


def _naive_persons_in(rows, text):
    """Insertion-order-of-first-occurrence surfaces, `in` containment,
    payloads sorted — the documented persons_in contract, recomputed
    without an automaton."""
    surfaces: list[str] = []
    payloads: dict[str, list] = {}
    for surface, person, kind in rows:
        if not surface:
            continue
        if surface not in payloads:
            surfaces.append(surface)
            payloads[surface] = []
        payloads[surface].append((person, kind))
    out = []
    for s in surfaces:
        if s in text:
            for person, kind in sorted(payloads[s]):
                out.append((person, s, kind))
    return out


@settings(max_examples=300, deadline=None)
@given(REGISTRY, TEXT)
def test_persons_in_matches_naive_containment(rows, text):
    idx = SurfaceIndex(rows)
    assert idx.persons_in(text) == _naive_persons_in(rows, text)
    assert idx.any_in(text) == bool(_naive_persons_in(rows, text))


@settings(max_examples=300, deadline=None)
@given(REGISTRY, TEXT)
def test_distinct_persons_match_simulator_containment(rows, text):
    """repeatOK=False person SET equals the simulator's literal
    `any(s in text)` probe (order differs by contract: engine is
    first-hit order, simulator sorts)."""
    idx = SurfaceIndex(rows)
    registry: dict[str, list[str]] = {}
    for surface, person, _k in rows:
        if surface:
            registry.setdefault(person, []).append(surface)
    assert set(idx.distinct_persons_in(text)) == set(
        sim.people_in_text(text, registry)
    )


@settings(max_examples=200, deadline=None)
@given(REGISTRY, st.lists(TEXT, max_size=6))
def test_persons_in_clauses_equals_per_clause_scan(rows, clauses):
    """The one-pass NUL-joined batch scan must be indistinguishable from
    scanning each clause separately."""
    idx = SurfaceIndex(rows)
    assert idx.persons_in_clauses(clauses) == [idx.persons_in(c) for c in clauses]


# surfaces that may CONTAIN clause delimiters: a match on one can
# straddle a clause boundary in the full text — present in the detection
# set, rejected by every per-clause bound check (messy registries carry
# such aliases; the fused path must reject them exactly as the isolated
# per-clause scan never sees them)
STRADDLE_SURFACE = st.text(alphabet=ALPHA + "，。", min_size=1, max_size=4)
STRADDLE_REGISTRY = st.lists(
    st.tuples(STRADDLE_SURFACE, st.sampled_from(["陳一", "林二", "黃三"]),
              st.sampled_from(["name", "字", "號"])),
    min_size=1,
    max_size=12,
)


@settings(max_examples=300, deadline=None)
@given(STRADDLE_REGISTRY, TEXT)
def test_scan_text_clauses_equals_two_pass(rows, text):
    """The fused one-pass scan (detection + per-clause occurrences off a
    single full-text automaton walk, bucketed by clause char offsets)
    must be indistinguishable — order included — from the two-pass
    reference: distinct_persons_in(text) + persons_in on each isolated
    clause substring. Covers matches that straddle delimiters (in the
    detection set, absent per-clause) and the dropped trailing remainder
    (detection-only territory)."""
    from information_extraction_from_biographies_spark.functions.clauses import (
        split_clauses_with_offsets,
    )

    idx = SurfaceIndex(rows)
    clause_off = split_clauses_with_offsets(text)
    for c, _pos, s in clause_off:  # offsets contract: verbatim substrings
        assert text[s : s + len(c)] == c
    detected, per = idx.scan_text_clauses(
        text, [(s, s + len(c)) for c, _pos, s in clause_off]
    )
    assert detected == idx.distinct_persons_in(text)
    assert per == [idx.persons_in(c) for c, _pos, _s in clause_off]


@settings(max_examples=100, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=4))
def test_persons_in_clauses_nul_surface_fallback(clauses):
    """A surface containing NUL forces the per-clause fallback; results
    must still equal the per-clause scan."""
    rows = [("甲\x00乙", "陳一", "name"), ("甲", "林二", "name")]
    idx = SurfaceIndex(rows)
    assert idx.persons_in_clauses(clauses) == [idx.persons_in(c) for c in clauses]


# delimiter-dense text: bare 。 before \n fails the trailing \w and must
# backtrack into the 。\n\n alternative — the X4 quirk both
# implementations encode differently (finditer vs search+slice loop)
CLAUSE_TEXT = st.text(alphabet="甲乙，。\n", max_size=120)


@settings(max_examples=400, deadline=None)
@given(CLAUSE_TEXT)
def test_clause_split_matches_simulator_rescan_loop(text):
    assert split_clauses_with_positions(text) == sim.clause_positions(text)


@settings(max_examples=200, deadline=None)
@given(CLAUSE_TEXT)
def test_clause_split_reconstruction_invariant(text):
    """Every emitted clause is a verbatim slice of the input at
    monotonically increasing offsets, and positions are non-decreasing
    starting at 1 (W1 running counter)."""
    got = split_clauses_with_positions(text)
    cursor = 0
    prev_pos = 1
    for clause, pos in got:
        at = text.find(clause, cursor)
        assert at >= cursor
        cursor = at + len(clause) + 1  # +1: the consumed delimiter head
        assert pos >= prev_pos
        prev_pos = pos
