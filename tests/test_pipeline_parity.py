"""End-to-end parity gate (BASELINE.json): the engine's outputs vs
template-derived goldens and the independent reference simulator."""

import pytest

from information_extraction_from_biographies_spark import fixtures as fx
from information_extraction_from_biographies_spark.plans.pipeline import Pipeline

import reference_simulator as sim

N_CONVS = 10


@pytest.fixture(scope="module")
def fixture():
    return fx.make_fixture(n_convs=N_CONVS)


@pytest.fixture(scope="module")
def result(spark, fixture, tmp_path_factory):
    tdf = fx.transcripts_sdf(spark, fixture)
    pipe = Pipeline(spark, str(tmp_path_factory.mktemp("wh")), snapshot_id="p1")
    return pipe.run(tdf)


def test_per_turn_text_equality(spark, fixture, result):
    """input_hint invariant: stage-0 output text equals input text row-for-row
    under Window.partitionBy(conv_id).orderBy(turn_idx)."""
    out = {
        (r.conv_id, r.turn_idx): r.text
    for r in result.tables["turns"].select("conv_id", "turn_idx", "text").collect()
    }
    for row in fixture.transcripts.itertuples():
        assert out[(row.conv_id, row.turn_idx)] == row.text


def test_triples_precision_recall(result, fixture):
    triples = {(r.subj, r.pred, r.obj) for r in result.tables["triples"].collect()}
    golden = fx.golden_triples(fixture)
    tp = triples & golden
    precision = len(tp) / max(len(triples), 1)
    recall = len(tp) / max(len(golden), 1)
    assert precision >= 0.95, f"P={precision}: extra={sorted(triples - golden)[:10]}"
    assert recall >= 0.95, f"R={recall}: missing={sorted(golden - triples)[:10]}"


def test_timeline_matches_golden(result, fixture):
    got = {(r.conv_id, r.year, r.event) for r in result.tables["timeline"].collect()}
    assert got == fx.golden_timeline(fixture)


def test_meta_matches_template_truth(result, fixture):
    meta = {r.conv_id: r for r in result.tables["meta"].collect()}
    for t in fixture.truths:
        m = meta[t.conv_id]
        assert m.biographee == t.biographee
        assert m.english_name == t.english_name  # incl. trailing ，quirk
        assert m.birth == t.birth and m.death == t.death
        assert list(m.authors or []) == t.authors


def test_cooccurrence_matches_simulator(result, fixture):
    turn_texts = {}
    for r in sorted(fixture.transcripts.itertuples(), key=lambda r: (r.conv_id, r.turn_idx)):
        turn_texts.setdefault(r.conv_id, []).append(r.text)
    expected = {}
    for t in fixture.truths:
        mt = sim.mature_text(turn_texts[t.conv_id], sim.biographee_from_conv_id(t.conv_id))
        for (n1, n2), s in sim.cooccurrence_scores(mt, fixture.registry, t.biographee).items():
            expected[(t.conv_id, n1, n2)] = s
    got = {(r.conv_id, r.name1, r.name2): r.score for r in result.tables["cooccurrence"].collect()}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_mentions_match_simulator(result, fixture):
    turn_texts = {}
    for r in sorted(fixture.transcripts.itertuples(), key=lambda r: (r.conv_id, r.turn_idx)):
        turn_texts.setdefault(r.conv_id, []).append(r.text)
    expected = set()
    for t in fixture.truths:
        mt = sim.mature_text(turn_texts[t.conv_id], sim.biographee_from_conv_id(t.conv_id))
        for pos, person, surface in sim.occurrences_in_text(mt, fixture.registry):
            expected.add((t.conv_id, pos, person, surface))
    got = {
        (r.conv_id, r.pos, r.person, r.surface)
        for r in result.tables["mentions"].collect()
        if r.kind == "occ"
    }
    assert got == expected


def test_entity_components_match_golden(result, fixture):
    ent = {r.name: r.entity_id for r in result.tables["entities"].collect()}
    by_comp = {}
    for t in fixture.truths:
        by_comp.setdefault(ent[t.biographee], set()).add(t.biographee)
    got = sorted([frozenset(v) for v in by_comp.values()], key=sorted)
    want = sorted([frozenset(g) for g in fx.golden_components(fixture)], key=sorted)
    assert got == want


def test_registry_people_cover_all_template_persons(result, fixture):
    people = {r.name for r in result.tables["people"].collect()}
    assert set(fixture.registry) <= people
