"""Unit tests for the pure-Python kernels (no Spark)."""

import random

from information_extraction_from_biographies_spark.functions.clauses import (
    relation_lines,
    split_clauses_with_positions,
)
from information_extraction_from_biographies_spark.functions.extraction import (
    HEART,
    extract_title,
    get_kin_name,
    prepend_family_name,
    process_and_filter_names,
    surname_of,
)
from information_extraction_from_biographies_spark.functions.matcher import AhoCorasick, SurfaceIndex
from information_extraction_from_biographies_spark.functions.relations import (
    build_dep_dict,
    filter_relations,
    relation_cascade,
)
from information_extraction_from_biographies_spark.functions.timeline import extract_timeline


# ---------------------------------------------------------------- matcher
def test_aho_corasick_equals_naive_find():
    rng = random.Random(3)
    alphabet = "陳林黃泗治平安王字號大明"
    patterns = list({"".join(rng.choices(alphabet, k=rng.randint(1, 4))) for _ in range(30)})
    ac = AhoCorasick(patterns)
    for _ in range(50):
        text = "".join(rng.choices(alphabet, k=rng.randint(0, 60)))
        expected = {i for i, p in enumerate(ac.patterns) if p in text}
        assert ac.contained(text) == expected


def test_surface_index_shared_surface_maps_to_all_persons():
    idx = SurfaceIndex([("石泉", "陳一", "號"), ("石泉", "林二", "字"), ("陳一", "陳一", "name")])
    hits = idx.persons_in("先生號石泉。")
    assert ("陳一", "石泉", "號") in hits and ("林二", "石泉", "字") in hits
    assert idx.distinct_persons_in("先生號石泉。") == ["林二", "陳一"]


def test_persons_in_clauses_equals_per_clause_scan():
    """The single-pass batched clause scan must equal [persons_in(c) for c
    in clauses] exactly — order included — on random clause streams, incl.
    patterns shared across clauses, empty clauses, and no-match clauses."""
    rng = random.Random(11)
    alphabet = "陳林黃泗治平安王字號大明"
    rows = []
    for i in range(40):
        surf = "".join(rng.choices(alphabet, k=rng.randint(1, 4)))
        rows.append((surf, f"人{i % 7}", "name" if i % 2 else "號"))
    idx = SurfaceIndex(rows)
    for _ in range(30):
        clauses = [
            "".join(rng.choices(alphabet, k=rng.randint(0, 30)))
            for _ in range(rng.randint(0, 12))
        ]
        assert idx.persons_in_clauses(clauses) == [idx.persons_in(c) for c in clauses]

    # boundary isolation: a surface split across two clauses must NOT match
    idx2 = SurfaceIndex([("陳大明", "陳大明", "name")])
    assert idx2.persons_in_clauses(["甲陳大", "明乙"]) == [[], []]
    assert idx2.persons_in_clauses(["甲陳大明乙"]) == [[("陳大明", "陳大明", "name")]]

    # a NUL-bearing surface forces the per-clause fallback, same results
    idx3 = SurfaceIndex([("陳\x00明", "怪", "name"), ("陳一", "陳一", "name")])
    assert idx3._has_nul
    assert idx3.persons_in_clauses(["陳一之", ""]) == [idx3.persons_in("陳一之"), []]


# ---------------------------------------------------------------- clauses
def test_clause_split_increments_and_trailing_drop():
    # ，→ +1, 。→ +2, 。\n\n → +3; trailing clause after the last matched
    # delimiter is dropped (Cooccurrence.py:51-53).
    text = "甲，乙。丙。\n\n丁，戊尾巴"
    got = split_clauses_with_positions(text)
    assert got == [("甲", 1), ("乙", 2), ("丙", 4), ("丁", 7)]
    # '戊尾巴' (after the last ，) never gets a position.


def test_clause_split_paragraph_delimiter_backtrack():
    # 。 before \n\n must match the 。\n\n alternative (increment 3),
    # not plain 。 (the trailing \w forces the backtrack).
    got = split_clauses_with_positions("甲。\n\n乙，丙")
    assert got == [("甲", 1), ("乙", 4)]


def test_relation_lines_strip_parens():
    lines = relation_lines("王一，與陳二（Peter）合作。\n\n王一再會", "陳二")
    assert lines == ["與陳二合作"]


# ------------------------------------------------------------- extraction
def test_title_dead_branch_keeps_trailing_comma():
    info = extract_title("陳泗治（Tan Su-tin，1911.04.14-1992.09.23），士林人。")
    assert info.biographee == "陳泗治"
    assert info.english_name == "Tan Su-tin，"  # trailing ，(Preprocess.py:163-171)
    assert info.birth == "1911.04.14"
    assert info.death == "1992.09.23"
    assert info.norm_text == "，士林人。"


def test_title_without_english():
    info = extract_title("陳泗治（1911-1992），士林人。")
    assert info.english_name is None
    assert info.birth == "1911"


def test_author_extraction_and_removal():
    info = extract_title("陳泗治（1911-1992）（王甲、李乙撰），士林人。")
    assert info.authors == ["王甲", "李乙"]
    assert info.norm_text == "，士林人。"


def test_get_kin_name_requires_punct_and_surname():
    names, tuples = get_kin_name("父親|父", "他日。父陳大山是商人。", "父")
    assert names == {"陳大山"}
    assert ("陳大山", "父", None) in tuples
    # no legal surname → rejected (unless 兒子/女兒)
    names2, _ = get_kin_name("父親|父", "他日。父毅大山是商人。", "父")
    assert names2 == set()


def test_heart_marker_and_prepend_with_original_form():
    # 💗 child keeps own name (no prepend); plain child gets family name +
    # an 原形 alias (NER.py:415-447)
    res = prepend_family_name({HEART + "羅賓", "小寶"}, "孫")
    assert res == {"羅賓", "孫小寶"}
    tuples = prepend_family_name({(HEART + "羅賓", "兒子", None), ("小寶", "兒子", None)}, "孫")
    assert ("羅賓", "兒子", None) in tuples
    assert ("孫小寶", "兒子", None) in tuples
    assert ("孫小寶", "原形", "小寶") in tuples


def test_filter_names_substring_dominance_and_rules():
    names = {
        "陳泗治",  # ok
        "陳泗",  # substring of 陳泗治 → dropped
        "臺北",  # place name → dropped
        "福建人",  # place+人 → dropped
        "某某寺",  # ends 寺 → dropped
        "X陳一",  # ascii start → dropped
        "治平",  # no surname → dropped
        "圓光法師",  # monk suffix → kept without surname
    }
    assert process_and_filter_names(names) == {"陳泗治", "圓光法師"}


def test_surname_longest_match():
    assert surname_of("歐陽修文") == "歐陽"
    assert surname_of("陳大明") == "陳"
    assert surname_of("治平") is None


# ---------------------------------------------------------------- cascade
def test_cascade_bei_agent():
    d = build_dep_dict("被王小明殺害", ["王小明"])
    out = relation_cascade(d, "王世慶", "王小明")
    assert out == ["王小明 殺害 王世慶"]


def test_cascade_verb_dobj():
    d = build_dep_dict("與史威廉合作發表論文", ["史威廉"])
    out = relation_cascade(d, "王世慶", "史威廉")
    assert "王世慶 合作 史威廉" in out
    assert "王世慶 發表論文 史威廉" in out


def test_cascade_copula_rule_i():
    d = build_dep_dict("恩師為林大同", ["林大同"])
    assert relation_cascade(d, "王世慶", "林大同") == ["王世慶 恩師 林大同"]


def test_cascade_nmod_assmod():
    d = build_dep_dict("因田武雅的推薦", ["田武雅"])
    assert relation_cascade(d, "王世慶", "田武雅") == ["田武雅 推薦 王世慶"]


def test_cascade_sentinel_dropped_by_filter():
    d = build_dep_dict("字伯禹", ["伯禹"])
    out = relation_cascade(d, "王世慶", "伯禹")
    assert out == "there has no relationships"
    # the sentinel extends char-wise then every 1-char token fails the
    # 3-token filter (Relationship.py:145,46,170-171)
    assert filter_relations(list(out)) == []


def test_filter_relations_kinship_and_self():
    rels = ["甲 娶 乙", "甲 合作 甲", "甲 合作 乙", "甲 太 多 tokens"]
    assert filter_relations(rels) == [("甲", "合作", "乙")]


# --------------------------------------------------------------- timeline
def test_timeline_extraction_and_quirks():
    text = "大正10年（1921），任職臺北書局。民國40年（1951），當選會長。"
    rows = extract_timeline(text)
    assert (1921, "任職臺北書局", 0) in rows
    years = {y for y, _, _ in rows}
    assert years == {1921, 1951}


def test_timeline_requires_western_year():
    assert extract_timeline("大正10年，任職臺北書局。") == []


def test_timeline_last_wins_candidates_emitted_with_positions():
    text = "民國40年（1951），任職甲。民國40年（1951），任職乙。"
    rows = extract_timeline(text)
    assert len(rows) == 2
    assert rows[0][2] < rows[1][2]  # start positions ordered


# ------------------------------------------------ A2 closed-form weights
def test_depreciation_weight_sequence():
    # reference fold: 1, 0.65, 0.65^2, 0.65^4, 0.65^8 (Cooccurrence.py:103-109)
    from information_extraction_from_biographies_spark.gazetteers import DEPRECIATE_FACTOR

    weights = [1.0]
    depre = DEPRECIATE_FACTOR
    for _ in range(4):
        weights.append(depre)
        depre **= 2
    closed = [1.0] + [DEPRECIATE_FACTOR ** (2 ** (k - 2)) for k in range(2, 6)]
    assert weights == closed


def test_timeline_concise_mode():
    """Get_Timeline.py:63-83: dobj/iobj => gov+dep, nsubj/csubj => dep+gov,
    ，-joined; no qualifying dependency => stripped raw event."""
    from information_extraction_from_biographies_spark.functions.relations import build_lex_index

    # dobj: 創立(VV) 報社(NN) adjacency -> condensed to gov+dep
    text = "民國40年（1951），與友人創立報社而聞名。"
    (year, event, _pos), = extract_timeline(text, concise=True)
    assert (year, event) == (1951, "創立報社")
    # non-concise keeps the full span
    (_, full_event, _), = extract_timeline(text)
    assert full_event == "與友人創立報社而聞名"

    # nsubj (copula 為 with a known NR surface): dep+gov ordering
    lex = build_lex_index(["王大明"])
    text2 = "民國41年（1952），恩師為王大明。"
    (_, event2, _), = extract_timeline(text2, concise=True, lex_index=lex)
    assert event2 == "恩師王大明"

    # fallback: no qualifying dependency -> raw (comma-stripped) event
    text3 = "民國42年（1953），聲名遠播。"
    (_, event3, _), = extract_timeline(text3, concise=True)
    assert event3 == "聲名遠播"


def test_n1_dictionary_segmentation_channel():
    """NER.py:8-10,132-139: a user-dict name with NO trigger-window context
    is recalled only via dictionary segmentation."""
    from information_extraction_from_biographies_spark.functions.extraction import (
        build_name_dict_index,
        extract_names_from_conv,
        segment_names,
    )

    idx = build_name_dict_index(["林俊傑", "王大明"])
    text = "某日林俊傑抵達台北。"  # no N2 trigger char precedes the name
    assert segment_names(text, idx) == {"林俊傑"}

    names_with_dict, _ = extract_names_from_conv(text, None, idx)
    assert "林俊傑" in names_with_dict
    names_without, _ = extract_names_from_conv(text, None, None)
    assert "林俊傑" not in names_without


def test_n1_longest_match_consumes_span():
    from information_extraction_from_biographies_spark.functions.extraction import (
        build_name_dict_index,
        segment_names,
    )

    # 王大明 must win over 王大 (longest match), and the consumed span
    # cannot re-trigger the shorter entry
    idx = build_name_dict_index(["王大", "王大明"])
    assert segment_names("王大明到訪。", idx) == {"王大明"}


def test_concise_timeline_lexicon_threading(spark):
    """timeline_table(concise=True, surfaces=...) reaches the dependency
    annotator with the conversation's person lexicon: a known surface
    segments as NR and nsubj condensation fires; without the lexicon the
    event falls back to the raw span (round-2 ADVICE: the lex_index
    parameter was unreachable from the operator)."""
    from information_extraction_from_biographies_spark.operators.triples import timeline_table

    turns = spark.createDataFrame(
        [("c1", 0, "民國35年（1946），被陳泗治推薦任教。")],
        "conv_id string, turn_idx int, norm_text string",
    )
    with_lex = timeline_table(turns, concise=True, surfaces=["陳泗治"]).collect()
    assert [r["event"] for r in with_lex] == ["陳泗治推薦"]
    without = timeline_table(turns, concise=True).collect()
    assert [r["event"] for r in without] == ["被陳泗治推薦任教"]


def test_zhconv_preexisting_pua_placeholders_stripped():
    """Text already containing the s2t phrase-layer PUA placeholder
    codepoints must not be rewritten into phrase targets (round-2
    ADVICE): the guard strips them before the phrase pass."""
    from information_extraction_from_biographies_spark.functions.zhconv import (
        _S2T_ORDER,
        _S2T_PLACEHOLDER,
        s2t,
    )

    hostile = _S2T_PLACEHOLDER[_S2T_ORDER[0]] + "后来发展"
    out = s2t(hostile)
    assert _S2T_ORDER[0] not in out  # placeholder did not resurrect a phrase
    assert out == s2t("后来发展")  # equivalent to the clean input


def _ref_filter_by_date(val, op, year, month, day):
    """Line-for-line port of the reference's filter_biography_by_date
    (Biographee_Info.py:91-114): zip-shortest over the ROW's dotted
    components, int() failure on a REACHED component excludes, all-equal
    falls through to relate(1,1)."""
    import operator as _op

    relate = {">": _op.gt, "<": _op.lt, "=": _op.eq, ">=": _op.ge, "<=": _op.le}[op]
    if val is None:
        return False
    for left, right in zip(val.split("."), [year, month, day]):
        if right is not None:
            try:
                left = int(left)
            except Exception:
                return False
            if left == right:
                continue
            elif relate(left, right):
                return True
            else:
                return False
    return relate(1, 1)


def test_componentwise_date_matches_reference(spark):
    """componentwise_date_predicate == the reference simulator on
    adversarial rows: missing components (zip-shortest: equal), an
    unparsable component that the compare REACHES (excluded), one it
    never reaches (ignored), empty components, None."""
    from pyspark.sql import functions as F  # noqa: N812

    from information_extraction_from_biographies_spark.operators.biographee import (
        componentwise_date_predicate,
    )

    vals = [
        "1900", "1900.05", "1900.05.10", "1900.ab", "1899.12.31", "1901",
        "1900.04", "1900.06", "1900.05.09", "1900.05.11", "abcd", None,
        "1900.", "1900..05", "1900.05.xx", "1905.ab.10",
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, d string"
    )
    cases = [
        (">=", 1900, 5, None), (">", 1900, 5, None), ("<=", 1900, 5, None),
        ("=", 1900, 5, 10), ("<", 1900, None, None), ("=", 1900, None, None),
        (">", 1899, 12, 30), ("<=", 1905, 1, None),
    ]
    for op, y, m, d in cases:
        got = {
            r["i"]
            for r in df.filter(
                componentwise_date_predicate(F.col("d"), op, y, m, d)
            ).collect()
        }
        want = {i for i, v in enumerate(vals) if _ref_filter_by_date(v, op, y, m, d)}
        assert got == want, (op, y, m, d, sorted(got), sorted(want))
