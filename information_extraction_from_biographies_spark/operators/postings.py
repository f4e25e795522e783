"""Character-gram posting index over conversation text — the access path
that turns affected-history detection from an O(history-bytes) scan into
an O(postings-touched) lookup.

The ``rescan="exact"`` mode (plans/incremental.py) finds historical
conversations whose text contains any CHANGED probe surface. Without an
index that is a full read of the base turn table per delta — shuffle-free
and CPU-trivial, but every delta pays the corpus in read bytes. This
module maintains ``turn_grams``: the distinct code-point unigrams and
bigrams of each conversation's normalized text, one (conv_id, gram) row
per distinct pair, committed as a REPLACE-group corpus table (the delta
holds the grams of delivered conversations only; the snapshot chain
resolves the full view exactly like ``stage0_turns``) and bucketed on
``gram`` so a changed-surface lookup is a file-pruned read.

Why unigrams + bigrams are sufficient and exact as a FILTER: the mention
probe is exact code-point substring containment (functions/matcher.py —
no case folding, no width normalization), and probe surfaces never
contain a newline (asserted upstream), so a surface that matches a
conversation matches inside a single turn, and every unigram (|s| = 1)
or bigram (|s| ≥ 2) of the surface is therefore a gram of that turn's
text. Candidate conversations — those whose gram set contains the
surface's least-frequent gram — are a SUPERSET of the true matches; the
existing Aho-Corasick probe then verifies candidates only. No false
negatives by construction; false positives cost only verify time.

Scale posture: the index is corpus-scale in rows (O(total distinct
(conv, gram)) ≈ O(corpus chars)) — a space-for-read tradeoff like
``cc_members`` — but per-delta MAINTENANCE is O(delta chars) (grams of
delivered conversations only) and per-delta QUERY is O(changed-surface
grams × their posting lists) after bucket pruning, independent of
history size. Measured raw at 24k convs, the index was 7× the turn
table's parquet bytes because Zipf's head (grams in nearly every
conversation) contributes most rows while pruning nothing — so builds
apply a max-df STOP-GRAM cap (``hot_grams``): hot grams are dropped
from the index and recorded in a small ``gram_stops`` table; the query
side treats stopped grams as unusable (not absent) and falls back to
the full scan for any surface whose every gram is stopped
(``unprunable_surfaces``) — the standard stop-word posting design,
still exact end-to-end (tests/test_postings.py).

Reference anchor: the reference has no incremental mode at all (it
recomputes — SURVEY.md §7); this is the standard n-gram posting design
(e.g. Navarro & Baeza-Yates substring filters) applied to the rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

# distinct unigrams + bigrams of a string column, as one array expression
# (JVM-side, codegen; code-point semantics match Python's str indexing,
# which is what the Aho-Corasick probe walks)
_GRAMS_EXPR = (
    "array_distinct(concat("
    " case when length({c}) >= 1"
    "  then transform(sequence(1, length({c})), i -> substring({c}, i, 1))"
    "  else array() end,"
    " case when length({c}) >= 2"
    "  then transform(sequence(1, length({c})-1), i -> substring({c}, i, 2))"
    "  else array() end))"
)


def grams_of(col: str) -> "F.Column":
    """Distinct unigram+bigram array of a string column (NULL → empty)."""
    return F.expr(_GRAMS_EXPR.format(c=col))


def conv_grams(turns: DataFrame) -> DataFrame:
    """(conv_id, gram) distinct — the posting rows of a turn table slice.
    Per-turn array extraction stays in codegen; the only shuffle is the
    distinct, over O(input chars) rows."""
    return (
        turns.select("conv_id", F.explode(grams_of("norm_text")).alias("gram"))
        .distinct()
    )


def hot_grams(raw_postings: DataFrame, max_df: int) -> DataFrame:
    """Grams whose document frequency exceeds ``max_df`` → (gram).

    The stop-gram cap: Zipf's head — grams present in most conversations
    — contributes most posting ROWS while carrying no pruning power (a
    near-universal gram's posting list IS the corpus). Dropping them
    shrinks the index several-fold; exactness is preserved because the
    query side treats a STOPPED gram as *unusable* (unknown membership),
    never as *absent* (see ``usable_query_grams`` — a surface whose every
    gram is stopped falls back to the full scan).

    The result is vocabulary-bounded (≤ alphabet² distinct bigrams, and
    only the ones hotter than the cap), not corpus-bounded — broadcastable
    by construction."""
    return (
        raw_postings.groupBy("gram")
        .count()
        .filter(F.col("count") > max_df)
        .select("gram")
    )


def apply_stops(postings_or_query: DataFrame, stops: DataFrame) -> DataFrame:
    """Drop rows whose ``gram`` is in the stoplist (broadcast anti-join —
    the stoplist is vocabulary-bounded, the left side is not)."""
    return postings_or_query.join(F.broadcast(stops), "gram", "left_anti")


def unprunable_surfaces(query_grams: DataFrame, stops: DataFrame) -> DataFrame:
    """Surfaces whose EVERY query gram is stopped → (surface). For these
    the index holds no information — membership of a stopped gram is
    unknown, not false — so the caller must fall back to the full scan
    (exactness keystone of the stop-gram cap)."""
    all_s = query_grams.select("surface").distinct()
    usable_s = apply_stops(query_grams, stops).select("surface").distinct()
    return all_s.join(usable_s, "surface", "left_anti")


def surface_query_grams(surfaces: DataFrame) -> DataFrame:
    """(surface, gram) — the grams a changed surface queries the index
    with: its bigrams when |s| ≥ 2 (strictly more selective than its
    unigrams), else the single unigram."""
    g = F.expr(
        "case when length(surface) >= 2"
        " then array_distinct(transform(sequence(1, length(surface)-1),"
        "  i -> substring(surface, i, 2)))"
        " else array(surface) end"
    )
    return surfaces.select("surface", F.explode(g).alias("gram"))


def candidate_convs(postings: DataFrame, query_grams: DataFrame) -> DataFrame:
    """Conversations that MAY contain some queried surface → (conv_id).

    For each surface, only its least-frequent gram's posting list is
    taken (document-frequency computed over the already-pruned postings
    slice); a surface with any zero-df gram contributes nothing — no
    conversation can contain it. The result is a superset of the true
    match set (see module docstring); callers verify with the exact
    probe.

    ``postings`` may be any superset slice of the index restricted to at
    least the queried grams' buckets — an explicit semijoin here makes
    over-wide slices (unbucketed fallbacks) correct, just slower.

    When the index was built with a stop-gram cap (``hot_grams``), the
    caller MUST pass only usable query grams (``apply_stops``) and
    full-scan any ``unprunable_surfaces`` separately: a stopped gram has
    no posting rows, and this function reads df = 0 as "cannot match
    anywhere" — true only for genuinely absent grams."""
    q = query_grams.distinct()
    touched = postings.join(
        F.broadcast(q.select("gram").distinct()), "gram", "leftsemi"
    )
    df_counts = touched.groupBy("gram").count()
    ranked = (
        q.join(df_counts, "gram", "left")
        .withColumn("_df", F.coalesce(F.col("count"), F.lit(0)))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("surface").orderBy("_df", "gram")
            ),
        )
        .filter((F.col("_rk") == 1) & (F.col("_df") > 0))
        .select("gram")
        .distinct()
    )
    return (
        touched.join(F.broadcast(ranked), "gram", "leftsemi")
        .select("conv_id")
        .distinct()
    )
