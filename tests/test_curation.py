"""Training-data curation operators: PII scrubbing, deterministic
shuffle, stratified quota sampling, token-budget sequence packing
(operators/curation.py)."""

import pytest
from pyspark.sql import functions as F

from information_extraction_from_biographies_spark.operators.curation import (
    deterministic_shuffle,
    pack_sequences,
    scrub_pii,
    stratified_quota,
)


def test_scrub_pii_replaces_and_counts(spark):
    rows = [
        ("d1", "mail me at jo.doe+x@example.co.uk or call 555-123-4567 ok"),
        ("d2", "card 4111 1111 1111 1111 from 10.0.0.1"),
        ("d3", "no pii here, just prose with numbers like 42 and 2026."),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert "<PII:email>" in out["d1"]["text"] and "@" not in out["d1"]["text"]
    assert "<PII:phone>" in out["d1"]["text"]
    assert out["d1"]["n_email"] == 1 and out["d1"]["n_phone"] == 1
    assert "<PII:card>" in out["d2"]["text"] and "<PII:ip>" in out["d2"]["text"]
    assert "4111" not in out["d2"]["text"]
    assert out["d2"]["text"].endswith("from <PII:ip>")  # ip intact, not phone-mangled
    assert out["d3"]["text"] == rows[2][1]  # prose untouched
    assert out["d3"]["n_email"] == out["d3"]["n_card"] == out["d3"]["n_ip"] == 0


def test_scrub_pii_is_pure_expressions(spark):
    import contextlib
    import io

    df = spark.createDataFrame([("d", "t")], "doc_id string, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scrub_pii(df).explain("formatted")
    plan = buf.getvalue()
    # no shuffle, no Python UDF eval node (the local-relation scan itself
    # mentions Python — only the eval operators matter)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_deterministic_shuffle_reproducible_and_seed_sensitive(spark):
    df = spark.range(300).select(F.col("id").cast("string").alias("doc_id"))
    o1 = [r["doc_id"] for r in deterministic_shuffle(df, seed=1).collect()]
    o2 = [r["doc_id"] for r in deterministic_shuffle(df.repartition(7), seed=1).collect()]
    o3 = [r["doc_id"] for r in deterministic_shuffle(df, seed=2).collect()]
    assert o1 == o2  # same seed, any partitioning → identical order
    assert o1 != o3  # seed changes the order
    assert sorted(o1) == sorted(o3)  # …but not the membership


def test_stratified_quota_uniform_and_per_stratum(spark):
    df = spark.range(1000).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    uni = stratified_quota(df, "source", 50, seed=3)
    by = {r["source"]: r["n"] for r in uni.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by == {"s0": 50, "s1": 50, "s2": 50, "s3": 50}

    per = stratified_quota(df, "source", {"s0": 10, "s1": 300, "s2": 0}, seed=3)
    by2 = {r["source"]: r["n"] for r in per.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # s1's quota exceeds its population (250) → capped by population;
    # s3 has no quota entry → dropped entirely
    assert by2 == {"s0": 10, "s1": 250}

    # deterministic: same seed picks the same documents
    a = {r["doc_id"] for r in uni.collect()}
    b = {r["doc_id"] for r in stratified_quota(df.repartition(11), "source", 50, seed=3).collect()}
    assert a == b


def test_stratified_quota_salted_identical_to_plain(spark):
    """The two-phase hot-stratum path must select the exact same set as
    the plain window — salting changes the plan, never the sample."""
    df = spark.range(2000).select(
        F.col("id").cast("string").alias("doc_id"),
        # one hot stratum holding 95% of rows
        F.when(F.col("id") % 20 == 0, F.lit("rare")).otherwise(F.lit("hot")).alias("source"),
    )
    plain = {r["doc_id"] for r in stratified_quota(df, "source", 75, seed=5).collect()}
    salted = {
        r["doc_id"]
        for r in stratified_quota(df, "source", 75, seed=5, salt=8).collect()
    }
    assert plain == salted and len(salted) == 150
    per = {
        r["doc_id"]
        for r in stratified_quota(df, "source", {"hot": 40, "rare": 5}, seed=5, salt=8).collect()
    }
    per_plain = {
        r["doc_id"]
        for r in stratified_quota(df, "source", {"hot": 40, "rare": 5}, seed=5).collect()
    }
    assert per == per_plain and len(per) == 45


@pytest.mark.parametrize("budget", [100, 1000])
def test_pack_sequences_respects_budget(spark, budget):
    df = spark.range(500).select(
        F.col("id").cast("string").alias("doc_id"),
        ((F.xxhash64("id") % 90 + 95) % 90 + 5).alias("n_tokens"),  # 5..94
    )
    out = pack_sequences(df, budget=budget).collect()
    assert len(out) == 500  # every document packed exactly once
    packs = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r)
    for members in packs.values():
        total = sum(r["n_tokens"] for r in members)
        assert total <= budget
        assert all(r["pack_tokens"] == total for r in members)


def test_pack_sequences_oversized_doc_gets_singleton(spark):
    df = spark.createDataFrame(
        [("big", 5000), ("a", 30), ("b", 40)], "doc_id string, n_tokens long"
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=100, partitions=1).collect()}
    big_pack = out["big"]["pack_id"]
    assert out["a"]["pack_id"] != big_pack and out["b"]["pack_id"] != big_pack
    assert out["big"]["pack_tokens"] == 5000
    assert out["a"]["pack_id"] == out["b"]["pack_id"]  # 30+40 fit together


def test_pack_sequences_packing_efficiency(spark):
    """FFD on one partition must approach the token-sum lower bound (≤ 1.5x
    bins is FFD's worst case; random sizes land much closer)."""
    df = spark.range(400).select(
        F.col("id").cast("string").alias("doc_id"),
        ((F.xxhash64("id", F.lit(9)) % 50 + 60) % 50 + 10).alias("n_tokens"),
    )
    rows = pack_sequences(df, budget=128, partitions=4).collect()
    n_bins = len({r["pack_id"] for r in rows})
    lower = -(-sum(r["n_tokens"] for r in rows) // 128)
    assert n_bins <= 1.3 * lower + 4  # +1 open bin per partition slack


def test_pack_sequences_matches_naive_first_fit(spark):
    """The bin-closing optimization must not change any assignment: compare
    against a naive first-fit-decreasing that scans every bin ever opened."""
    import random

    rng = random.Random(17)
    rows = [(f"d{i}", rng.choice([3, 40, 70, 90, 130])) for i in range(300)]
    budget = 128

    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    naive_bins: list[int] = []  # remaining per bin, never closed
    naive: dict[str, int] = {}
    for doc, tok in order:
        for i, rem in enumerate(naive_bins):
            if tok <= rem:
                naive_bins[i] -= tok
                naive[doc] = i
                break
        else:
            naive[doc] = len(naive_bins)
            naive_bins.append(max(budget - tok, 0))

    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    got = {
        r["doc_id"]: int(r["pack_id"].split("-")[1])
        for r in pack_sequences(df, budget=budget, partitions=1).collect()
    }
    assert got == naive


def test_pack_sequences_closes_full_bins_linear(spark):
    """A partition where every doc exceeds budget/2 (each opens a singleton
    bin) must stay linear: with bin closing, 20k such docs pack in seconds;
    the pre-fix open-bin list would do ~2*10^8 probes here."""
    import time

    df = spark.range(20_000).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.lit(70) + F.abs(F.xxhash64("id")) % 29).alias("n_tokens"),  # 70..98 of 128
    )
    t0 = time.monotonic()
    out = pack_sequences(df, budget=128, partitions=1).collect()
    wall = time.monotonic() - t0
    assert len(out) == 20_000
    assert len({r["pack_id"] for r in out}) == 20_000  # all singletons
    assert wall < 30  # quadratic path took minutes


# --- decontamination ---------------------------------------------------


def _norm_tokens(text: str) -> list[str]:
    import re as _re

    # [\W_]+ matches the kernel: underscore is a separator, not a word char
    return [t for t in _re.sub(r"[\W_]+", " ", text.lower()).split() if t]


def _grams(text: str, n: int) -> set[tuple[str, ...]]:
    toks = _norm_tokens(text)
    if not toks:
        return set()
    if len(toks) < n:
        return {tuple(toks)}
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _expected_contaminated(docs, cont, n, min_hits):
    block = set().union(*(_grams(t, n) for _i, t in cont)) if cont else set()
    out = {}
    for i, t in docs:
        hits = len(_grams(t, n) & block)
        if hits >= min_hits:
            out[i] = hits
    return out


@pytest.fixture(scope="module")
def decon_data():
    # eval items, and docs that embed their spans verbatim / edited
    eval_items = [
        ("e1", "The quick brown fox jumps over the lazy dog near the old river bank today."),
        ("e2", "Paris is the capital of France, and Berlin is the capital of Germany!"),
    ]
    docs = [
        # verbatim containment of e1 (with different punctuation/casing)
        ("d1", "intro text THE QUICK brown fox, jumps over the lazy dog near the old river bank today... outro"),
        # clean doc sharing a few words but no 6-gram
        ("d2", "the quick red fox sleeps under a new river bridge tomorrow at dawn"),
        # contains e2's span once
        ("d3", "trivia: paris is the capital of france and berlin is the capital of germany (wiki)"),
        # clean long doc
        ("d4", " ".join(f"word{i}" for i in range(40))),
        # empty text
        ("d5", ""),
    ]
    return eval_items, docs


def test_decontaminate_drop_and_flag_match_python_oracle(spark, decon_data):
    from information_extraction_from_biographies_spark.operators.curation import decontaminate

    eval_items, docs = decon_data
    n = 6
    cont = spark.createDataFrame(eval_items, "item_id string, text string")
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    expected = _expected_contaminated(docs, eval_items, n, 1)
    assert set(expected) == {"d1", "d3"}  # fixture sanity

    kept = {r["doc_id"] for r in decontaminate(corpus, cont, n=n).collect()}
    assert kept == {i for i, _ in docs} - set(expected)

    flagged = {
        r["doc_id"]: (r["contaminated"], r["n_contaminated_grams"])
        for r in decontaminate(corpus, cont, n=n, mode="flag").collect()
    }
    assert len(flagged) == len(docs)  # flag mode keeps every row
    for i, _t in docs:
        assert flagged[i][0] == (i in expected)
        assert flagged[i][1] == expected.get(i, 0)


def test_decontaminate_min_hits_thresholds(spark, decon_data):
    from information_extraction_from_biographies_spark.operators.curation import decontaminate

    eval_items, docs = decon_data
    n = 6
    cont = spark.createDataFrame(eval_items, "item_id string, text string")
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    exp2 = _expected_contaminated(docs, eval_items, n, 2)
    kept = {r["doc_id"] for r in decontaminate(corpus, cont, n=n, min_hits=2).collect()}
    assert kept == {i for i, _ in docs} - set(exp2)
    # d1 embeds a 15-token span -> 10 distinct 6-grams; survives only huge thresholds
    assert "d1" not in kept and exp2["d1"] == 10
    # flag mode reports RAW counts below the threshold (the audit view):
    # at min_hits=11, d1's 10 hits keep it un-contaminated but visible
    exp1 = _expected_contaminated(docs, eval_items, n, 1)
    flagged = {
        r["doc_id"]: (r["contaminated"], r["n_contaminated_grams"])
        for r in decontaminate(corpus, cont, n=n, min_hits=11, mode="flag").collect()
    }
    for i, _t in docs:
        assert flagged[i][1] == exp1.get(i, 0)
        assert flagged[i][0] == (exp1.get(i, 0) >= 11)
    assert flagged["d1"] == (False, 10)
    # flag mode refuses docs already carrying its output columns
    with pytest.raises(ValueError, match="contaminated"):
        decontaminate(
            decontaminate(corpus, cont, n=n, mode="flag"), cont, n=n, mode="flag"
        )


def test_decontaminate_short_eval_item_full_sequence_gram(spark):
    from information_extraction_from_biographies_spark.operators.curation import decontaminate

    # eval item shorter than n: its FULL 3-word sequence is the gram, and
    # a doc shorter than n matching it exactly is caught; a doc merely
    # CONTAINING those 3 words inside a longer text is NOT (its grams are
    # all full-width) — symmetric short-text rule
    cont = spark.createDataFrame([("e", "rare answer token")], "item_id string, text string")
    docs = [("short_exact", "Rare ANSWER token!"), ("long_contains", "x " * 10 + "rare answer token " + "y " * 10)]
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    kept = {r["doc_id"] for r in decontaminate(corpus, cont, n=13).collect()}
    assert kept == {"long_contains"}


def test_decontaminate_corpus_side_plan_shape(spark, decon_data):
    import contextlib
    import io

    from information_extraction_from_biographies_spark.operators.curation import decontaminate

    eval_items, docs = decon_data
    cont = spark.createDataFrame(eval_items, "item_id string, text string")
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decontaminate(corpus, cont, n=6, mode="flag").explain("formatted")
    plan = buf.getvalue()
    # blocklist reaches the semi join as a broadcast; gram hashing is the
    # Arrow-vectorized kernel (MapInPandas), never row-at-a-time python
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    # the corpus path shuffles once, for the per-doc hit count — never
    # for the gram rows (blocklist distinct is on the small side)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 4  # distinct(2: partial/final reuse) + hit-agg + flag join


def test_ngram_kernel_matches_prefix_hash_family():
    # the vectorized substring-hash algebra must equal the fingerprint
    # family's prefix_hash on each gram's text — the property that keeps
    # the kernel SQL-mirrorable (hashing.prefix_hash_sql)
    import re

    import numpy as np

    from information_extraction_from_biographies_spark.functions import hashing as H
    from information_extraction_from_biographies_spark.operators.curation import (
        PowTable,
        _ngram_poly_hashes,
    )

    pows = PowTable()
    rng = np.random.RandomState(5)
    vocab = ["alpha", "Beta", "γάμμα", "d-4", "e.5", "KAPPA7", "z"]
    for trial in range(30):
        k = int(rng.randint(0, 12))
        text = " , ".join(vocab[i] for i in rng.randint(0, len(vocab), size=k))
        n = int(rng.randint(2, 6))
        got = set(_ngram_poly_hashes(text, n, pows).tolist())
        toks = [t for t in re.sub(r"[\W_]+", " ", text.lower()).split() if t]
        if not toks:
            expected = set()
        elif len(toks) < n:
            expected = {H.prefix_hash64(H.codepoints(" ".join(toks)))}
        else:
            expected = {
                H.prefix_hash64(H.codepoints(" ".join(toks[i : i + n])))
                for i in range(len(toks) - n + 1)
            }
        assert got == expected, (trial, text, n)


def test_curate_corpus_end_to_end(spark):
    from information_extraction_from_biographies_spark.operators.curation import (
        curate_corpus,
    )

    lorem = (
        "the quick brown fox jumps over the lazy dog while the river "
        "runs past the old stone mill and the miller watches quietly"
    )
    eval_span = "this exact benchmark passage must never appear in training data at all"
    rows = []
    # 3 identical near-dup copies (one keeper survives)
    for i in range(3):
        rows.append((f"dup{i}", "web", lorem + " tail" + "x" * i))
    # a contaminated doc
    rows.append(("cont", "web", lorem[:40] + " " + eval_span + " trailing words"))
    # clean docs with PII, two sources
    rows.append(("pii", "web", "contact me at a.b@example.com about " + lorem[::-1]))
    rows.append(("clean_books", "books", " ".join(f"tok{j}" for j in range(60))))
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    cont = spark.createDataFrame([("e1", eval_span)], "item_id string, text string")

    curated, packed, audit = curate_corpus(
        docs, contamination=cont, budget=64, quotas=10, n_gram=6
    )
    out = packed.collect()
    kept_ids = {r["doc_id"] for r in out}

    assert audit["input_docs"] == 6
    assert audit["pii_matches"]["n_email"] == 1
    assert audit["after_decontaminate"] == 5          # cont dropped
    assert audit["after_dedup"] == 3                  # dup1/dup2 dropped
    assert "cont" not in kept_ids
    # exactly one of the near-dup triplet survives (keeper = lowest
    # 64-bit surrogate — deterministic but not alphabetical)
    assert len(kept_ids & {"dup0", "dup1", "dup2"}) == 1
    assert {"pii", "clean_books"} <= kept_ids
    # packing respects the budget and covers every curated doc
    assert audit["packs"] >= 1
    assert all(r["pack_tokens"] <= 64 or r["n_tokens"] > 64 for r in out)
    assert len(out) == 3
    # the curated table carries the SCRUBBED text (exporting the raw
    # input would re-introduce the PII the audit counted as removed)
    cur = {r["doc_id"]: r["text"] for r in curated.collect()}
    assert set(cur) == kept_ids
    assert "<PII:email>" in cur["pii"] and "@" not in cur["pii"]


def test_curate_corpus_short_and_custom_text_col(spark):
    """Docs shorter than the MinHash shingle width still exact-dedup, and
    a non-default text column threads through every stage."""
    from information_extraction_from_biographies_spark.operators.curation import (
        curate_corpus,
    )

    rows = [(f"s{i}", "web", "hi") for i in range(5)]          # 2-char dups
    rows += [("u1", "web", "completely different content here")]
    docs = spark.createDataFrame(rows, "doc_id string, source string, content string")
    curated, packed, audit = curate_corpus(docs, budget=32, text_col="content")
    kept = {r["doc_id"] for r in packed.collect()}
    assert audit["after_dedup"] == 2                  # 5 "hi" docs -> 1
    assert len(kept & {f"s{i}" for i in range(5)}) == 1
    assert "u1" in kept
    assert {r["doc_id"] for r in curated.collect()} == kept


def test_incremental_decontaminate_matches_batch(spark, decon_data):
    """Two increments (docs batch 1 + eval set 1, then docs batch 2 +
    eval set 2 with a history rescan) must keep exactly the doc set the
    batch operator keeps over the unions."""
    from information_extraction_from_biographies_spark.operators.curation import (
        decontaminate,
        incremental_decontaminate,
    )

    eval_items, docs = decon_data
    n = 6
    cont1 = spark.createDataFrame([eval_items[0]], "item_id string, text string")
    cont2 = spark.createDataFrame([eval_items[1]], "item_id string, text string")
    batch1 = spark.createDataFrame(docs[:3], "doc_id string, text string")  # d1-d3
    batch2 = spark.createDataFrame(docs[3:], "doc_id string, text string")  # d4-d5

    # increment 1: empty store, eval set 1, no history
    clean1, delta1, hist1 = incremental_decontaminate(
        batch1, None, new_contamination=cont1, n=n
    )
    assert hist1 is None
    store = delta1
    kept1 = {r["doc_id"] for r in clean1.collect()}
    assert kept1 == {"d2", "d3"}  # d1 overlaps eval 1; d3's eval arrives later

    # increment 2: eval set 2 arrives with batch 2 — history (the kept
    # batch-1 docs) must be rescanned against ONLY the new grams
    clean2, delta2, hist2 = incremental_decontaminate(
        batch2, store, new_contamination=cont2, history_docs=clean1, n=n
    )
    store = store.unionByName(delta2)
    kept2 = {r["doc_id"] for r in clean2.collect()}
    newly_hit = {r["doc_id"] for r in hist2.collect()}
    assert newly_hit == {"d3"}  # retroactively contaminated by eval 2

    survivors = (kept1 - newly_hit) | kept2
    cont_all = cont1.unionByName(cont2)
    docs_all = batch1.unionByName(batch2)
    batch_kept = {r["doc_id"] for r in decontaminate(docs_all, cont_all, n=n).collect()}
    assert survivors == batch_kept

    # increment 3: new docs against the accumulated store, no new eval —
    # no blockgram delta, no rescan
    d6 = spark.createDataFrame(
        [("d6", docs[0][1]), ("d7", "fresh words only never seen anywhere")],
        "doc_id string, text string",
    )
    clean3, delta3, hist3 = incremental_decontaminate(d6, store, n=n)
    assert delta3.count() == 0 and hist3 is None
    assert {r["doc_id"] for r in clean3.collect()} == {"d7"}


def test_incremental_decontaminate_min_hits_counts_full_blocklist(spark):
    """A historical doc whose overlap reaches min_hits only when OLD and
    NEW grams are combined must be reported on the rescan."""
    from information_extraction_from_biographies_spark.operators.curation import (
        incremental_decontaminate,
    )

    n = 3
    old_eval = spark.createDataFrame(
        [("e1", "alpha beta gamma")], "item_id string, text string"
    )
    new_eval = spark.createDataFrame(
        [("e2", "delta epsilon zeta")], "item_id string, text string"
    )
    # one old-gram hit + one new-gram hit = 2 >= min_hits only combined
    hist = spark.createDataFrame(
        [("h1", "alpha beta gamma filler delta epsilon zeta"),
         ("h2", "alpha beta gamma alone with words")],
        "doc_id string, text string",
    )
    empty = spark.createDataFrame([], "doc_id string, text string")
    _c, store, _h = incremental_decontaminate(empty, None, new_contamination=old_eval, n=n)
    _c2, _d2, hit = incremental_decontaminate(
        empty, store, new_contamination=new_eval, history_docs=hist, n=n, min_hits=2
    )
    got = {r["doc_id"]: r["n_contaminated_grams"] for r in hit.collect()}
    # h1 reaches 2 with one new-gram hit -> reported; h2 has no new hit
    assert got == {"h1": 2}


def test_incremental_decontaminate_returns_original_id_type(spark):
    """hit_history must carry the CALLER's id column type (the gram
    kernel works on string-cast ids; leaking those out makes a long-id
    tombstone set silently match nothing)."""
    from information_extraction_from_biographies_spark.operators.curation import (
        incremental_decontaminate,
    )

    hist = spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "unrelated words here")],
        "doc_id long, text string",
    )
    new_eval = spark.createDataFrame(
        [("e", "alpha beta gamma")], "item_id string, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    _c, _d, hit = incremental_decontaminate(
        empty, None, new_contamination=new_eval, history_docs=hist, n=3
    )
    assert dict(hit.dtypes)["doc_id"] == "bigint"
    assert {r["doc_id"] for r in hit.collect()} == {10}


# ---- CJK-aware token counting feeding pack budgets ---------------------


def test_token_count_cjk_mixed_text(spark):
    """Hand-computed counts on mixed zh/en text: each CJK codepoint is one
    token; Latin words, digit runs, and punctuation count as BPE-ish
    pre-tokens. ws mode on the same zh text collapses to ~1 token/doc —
    the unit mismatch the cjk mode exists to fix."""
    from information_extraction_from_biographies_spark.operators.textstats import (
        token_count,
    )

    rows = [
        # 4 CJK + "GPT" + "4" + "。" = 7
        (0, "王安石讀GPT4。"),
        # 6 CJK, no spaces = 6
        (1, "字介甫號半山"),
        # pure-English control: words + punct behave like the BPE split = 5
        (2, "hello world, 42 ok"),
        # katakana + hangul are CJK classes too: 3 + 2 + 1 = 6
        (3, "カタカ한국!"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in token_count(docs, mode="cjk").collect()}
    assert got == {0: 7, 1: 6, 2: 5, 3: 6}
    ws = {r["doc_id"]: r["ws_tokens"] for r in token_count(docs, mode="ws").collect()}
    assert ws[1] == 1  # whitespace tokens are meaningless on zh
    chars = {r["doc_id"]: r["n_tokens"] for r in token_count(docs, mode="chars").collect()}
    assert chars[2] == len("hello world, 42 ok".replace(" ", ""))
    with pytest.raises(ValueError, match="mode"):
        token_count(docs, mode="bogus")


def test_pack_sequences_budget_over_zh_fixtures(spark):
    """pack_sequences driven by mode='cjk' counts respects the token
    budget on spaceless Chinese documents; driven by ws_tokens every doc
    would count 1 and a 'budget-8' pack could hold unbounded text."""
    from information_extraction_from_biographies_spark.operators.curation import (
        pack_sequences,
    )
    from information_extraction_from_biographies_spark.operators.textstats import (
        token_count,
    )

    zh = ["王安石字介甫", "號半山臨川人", "慶曆二年進士", "神宗熙寧二年", "拜參知政事", "推行新法", "世稱王荊公", "卒諡文"]
    docs = spark.createDataFrame(list(enumerate(zh)), "doc_id long, text string")
    counted = token_count(docs, mode="cjk")
    packed = pack_sequences(counted, budget=8, tokens_col="n_tokens")
    per_pack = {
        r["pack_id"]: r["pack_tokens"]
        for r in packed.select("pack_id", "pack_tokens").distinct().collect()
    }
    assert per_pack and all(v <= 8 for v in per_pack.values())
    # every doc's n_tokens is its codepoint count here (pure CJK)
    n = {r["doc_id"]: r["n_tokens"] for r in counted.collect()}
    assert n == {i: len(t) for i, t in enumerate(zh)}
    # the ws unit really is degenerate on this corpus
    ws = token_count(docs, mode="ws")
    assert all(r["ws_tokens"] == 1 for r in ws.collect())


def test_curate_corpus_token_mode_cjk(spark):
    """curate_corpus(token_mode='cjk') packs spaceless Chinese documents
    under the budget in CJK-token units; the default ws unit counts every
    such doc as ~1 token and the budget constrains nothing."""
    from information_extraction_from_biographies_spark.operators.curation import (
        curate_corpus,
    )

    zh = ["王安石字介甫", "號半山臨川人", "慶曆二年進士", "神宗熙寧二年",
          "拜參知政事推行新法", "世稱王荊公", "卒諡文", "著有臨川集"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(zh)], "doc_id long, text string"
    )
    _, packed, _ = curate_corpus(docs, budget=9, audit=False, token_mode="cjk")
    per_pack = {
        r["pack_id"]: r["pack_tokens"]
        for r in packed.select("pack_id", "pack_tokens").distinct().collect()
    }
    assert per_pack and all(v <= 9 for v in per_pack.values())
    # ws mode really would be degenerate here: every spaceless doc counts
    # as ONE token, so the budget never splits anything. (Assert on the
    # per-doc token unit, not the pack count — FFD packing is partition-
    # local by design, so the number of packs a 8-row toy corpus lands in
    # depends on the runtime partition layout, which AQE may vary.)
    _, packed_ws, _ = curate_corpus(docs, budget=9, audit=False)
    ws_rows = packed_ws.select("n_tokens", "pack_tokens").collect()
    assert all(r["n_tokens"] == 1 for r in ws_rows)
    # and with every doc at 1 token, no pack comes close to the budget
    # boundary the cjk mode had to respect
    assert all(r["pack_tokens"] <= len(zh) for r in ws_rows)
