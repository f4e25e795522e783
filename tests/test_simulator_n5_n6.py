"""N5/N6 vs the independent reference simulator (r4 verdict item 6).

The verb-relation cascade and timeline are the richest quirk carriers;
until now they were checked only against generation-time template
goldens. Here the full pipeline's `triples` (source='verb') and
`timeline` tables are asserted IDENTICAL to reference_simulator's
literal transcriptions of Relationship.py:35-189 and
Get_Timeline.py:17-83 over 120 fixture conversations (6 independent
20-conv corpora — the style pool caps a single uniform corpus at 24),
plus a function-level identity for the concise timeline mode.
"""

import pytest

from information_extraction_from_biographies_spark import fixtures as fx
from information_extraction_from_biographies_spark.plans.pipeline import Pipeline

import reference_simulator as sim

CORPORA = [  # (seed, given_offset) per independent 20-conv corpus
    (7, 0), (101, 5), (202, 11), (303, 17), (404, 23), (505, 29),
]
N_PER = 20


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    out = []
    for i, (seed, off) in enumerate(CORPORA):
        fixture = fx.make_fixture(n_convs=N_PER, seed=seed, given_offset=off)
        wh = str(tmp_path_factory.mktemp(f"wh{i}"))
        res = Pipeline(spark, wh, snapshot_id=f"s{i}").run(
            fx.transcripts_sdf(spark, fixture)
        )
        out.append((fixture, res))
    return out


def _mature_texts(fixture):
    turn_texts = {}
    for r in sorted(
        fixture.transcripts.itertuples(), key=lambda r: (r.conv_id, r.turn_idx)
    ):
        turn_texts.setdefault(r.conv_id, []).append(r.text)
    return {
        t.conv_id: sim.mature_text(
            turn_texts[t.conv_id], sim.biographee_from_conv_id(t.conv_id)
        )
        for t in fixture.truths
    }


def test_verb_triples_match_simulator(runs):
    """Engine stage-2 verb channel == the simulator's literal
    Relationship.py loops, per conversation, across all 120 convs."""
    checked = 0
    nonempty = 0
    for fixture, res in runs:
        texts = _mature_texts(fixture)
        got = {}
        for r in res.tables["triples"].filter("source = 'verb'").collect():
            got.setdefault(r.conv_id, set()).add((r.subj, r.pred, r.obj))
        for t in fixture.truths:
            want = sim.verb_relations_for_conv(
                texts[t.conv_id], t.biographee, fixture.registry
            )
            assert got.get(t.conv_id, set()) == want, t.conv_id
            checked += 1
            nonempty += bool(want)
    assert checked == len(CORPORA) * N_PER
    # the comparison must not be vacuous
    assert nonempty >= checked // 2, f"only {nonempty}/{checked} convs had verb triples"


def test_timeline_matches_simulator(runs):
    """Engine `timeline` table (A6 last-wins + O2 sort) == the simulator's
    get_timeline dict-overwrite, across all 120 convs."""
    for fixture, res in runs:
        texts = _mature_texts(fixture)
        got = {}
        for r in res.tables["timeline"].collect():
            got.setdefault(r.conv_id, {})[r.year] = r.event
        want = {
            t.conv_id: sim.timeline(texts[t.conv_id]) for t in fixture.truths
        }
        want = {k: v for k, v in want.items() if v}
        assert got == want
        assert any(want.values())  # non-vacuous


def test_concise_timeline_matches_simulator(runs):
    """Function-level N6 concise identity: the engine's extract_timeline
    (lexicon-index annotator) == the simulator's transcription (dict-vocab
    annotator) on every conversation text, with the registry vocabulary."""
    from information_extraction_from_biographies_spark.functions.relations import (
        build_lex_index,
    )
    from information_extraction_from_biographies_spark.functions.timeline import (
        extract_timeline,
    )

    condensed = 0
    for fixture, _res in runs:
        texts = _mature_texts(fixture)
        surfaces = [s for ss in fixture.registry.values() for s in ss]
        lex = build_lex_index(surfaces)
        vocab = sim.build_vocab(surfaces)
        for t in fixture.truths:
            got: dict[int, str] = {}
            for year, event, _start in extract_timeline(
                texts[t.conv_id], concise=True, lex_index=lex
            ):
                got[year] = event  # dict overwrite = reference last-wins
            want = sim.timeline(texts[t.conv_id], concise=True, vocab=vocab)
            assert got == want, t.conv_id
            raw = sim.timeline(texts[t.conv_id])
            condensed += sum(1 for y in want if want[y] != raw.get(y))
    # fixture events happen to carry no condensable dependencies — prove the
    # condensation path itself on hand-built spans (dobj: 創辦+公司;
    # nsubj via 被-agent with a registry surface)
    probe = "明治33年（1900），創辦公司並發表論文。昭和5年（1930），被陳泗治推薦入學。"
    surfaces = ["陳泗治"]
    lex = build_lex_index(surfaces)
    got = {
        y: e for y, e, _s in extract_timeline(probe, concise=True, lex_index=lex)
    }
    want = sim.timeline(probe, concise=True, vocab=sim.build_vocab(surfaces))
    assert got == want
    raw = sim.timeline(probe)
    changed = {y for y in want if want[y] != raw.get(y)}
    assert changed, "probe spans must actually condense"
    assert condensed >= 0  # corpus-level identity held above either way
