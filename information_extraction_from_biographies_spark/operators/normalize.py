"""Stage 0 — normalize.

Splits conv metadata (N8 title/author extraction, Preprocess.py:151-174)
out of turn 0 and carries every turn through unchanged (`text`) alongside
its normalized form (`norm_text`). The per-turn text equality invariant
(input_hint) holds by construction: `text` is never modified.

Shuffle profile: NONE. Turn-0 rows are enriched in a single mapInPandas
pass and unioned with the untouched rest — no join, no shuffle. At 10^12
turns this stage is a pure map over the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from ..functions.extraction import extract_title

TURN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_ENRICHED_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, norm_text string, biographee string, english_name string, "
    "birth string, death string, authors array<string>"
)


def _enrich_turn0(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        infos = [extract_title(t if isinstance(t, str) else "") for t in pdf["text"]]
        out = pdf.copy()
        out["norm_text"] = [i.norm_text for i in infos]
        out["biographee"] = [i.biographee for i in infos]
        out["english_name"] = [i.english_name for i in infos]
        out["birth"] = [i.birth for i in infos]
        out["death"] = [i.death for i in infos]
        out["authors"] = [i.authors for i in infos]
        yield out


def normalize(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (turns, conv_meta).

    turns: transcripts + `norm_text` (turn 0 has title/authors stripped).
    conv_meta: one row per conversation with the N8 fields.
    """
    turns, meta, _enriched = normalize_shared(transcripts)
    return turns, meta


def normalize_shared(
    transcripts: DataFrame, persist_enriched: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (turns, conv_meta, enriched0). Both outputs are projections of
    the single turn-0 mapInPandas frame; callers that materialize turns
    AND meta (the pipeline) pass ``persist_enriched=True`` and unpersist
    the returned ``enriched0`` handle afterwards, so the extraction pass
    runs once instead of once per output table.

    ``turns`` carries ``biographee`` on its turn-0 row (null elsewhere):
    every downstream per-conversation stage groups on conv_id and sorts by
    turn_idx anyway, so the biographee rides the group for free — no
    turns↔meta join at all. (Before round 4 those stages broadcast-joined
    ``meta``, a table that grows linearly with the corpus: a driver-side
    collect of ~10^10 rows at the 10^12-turn posture. Threading the column
    here removes the join instead of merely de-hinting it.)"""
    base = transcripts.select(*TURN_COLS)
    enriched0 = base.filter(F.col("turn_idx") == 0).mapInPandas(_enrich_turn0, schema=_ENRICHED_SCHEMA)
    if persist_enriched:
        enriched0 = enriched0.persist()
    meta = enriched0.select("conv_id", "biographee", "english_name", "birth", "death", "authors")
    rest = (
        base.filter(F.col("turn_idx") != 0)
        .withColumn("norm_text", F.col("text"))
        .withColumn("biographee", F.lit(None).cast("string"))
    )
    turns = enriched0.select(*TURN_COLS, "norm_text", "biographee").unionByName(rest)
    return turns, meta, enriched0


def with_biographee(turns: DataFrame, meta: DataFrame | None) -> DataFrame:
    """(conv_id, turn_idx, norm_text, biographee) for the per-conversation
    grouped stages. When stage 0 threaded ``biographee`` onto turns (the
    normal path) this is a pure projection — zero join, zero shuffle, and
    it preserves any pre-shuffled/pre-sorted layout the caller staged.
    Legacy inputs without the column fall back to a plain equi-join on
    conv_id with NO broadcast hint: ``meta`` is one row per conversation
    (corpus-scale), so a forced broadcast is a driver OOM at 10^12 turns;
    an un-hinted join lets AQE broadcast only when the runtime size is
    actually small."""
    if "biographee" in turns.columns:
        return turns.select("conv_id", "turn_idx", "norm_text", "biographee")
    if meta is None:
        raise ValueError(
            "turns has no biographee column and no meta table was given — "
            "run stage 0 (normalize) first or pass meta"
        )
    return turns.select("conv_id", "turn_idx", "norm_text").join(
        meta.select("conv_id", "biographee"), "conv_id", "left"
    )


def group_footnotes(
    lines: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "line_idx",
    line_col: str = "line",
) -> DataFrame:
    """A5 — footnote line grouping (Preprocess.py:134-148 semantics):
    a line containing a space starts a new footnote — numbering = the
    first space-separated token, initial text = the SECOND token only
    (the reference's ``pair[1]`` drops anything past a second space; the
    quirk is reproduced) — and a line with no space appends ``\\n + line``
    to the footnote opened by the most recent numbered line. Continuation
    lines before any numbered line have no anchor (the reference would
    index [-1] into an empty list) and are dropped.

    Pure window + ordered-aggregate: ``last(numbered line_idx,
    ignorenulls)`` anchors each line, one hash aggregate per footnote —
    no per-row Python, one shuffle. → (conv_id, numbering,
    footnote_text), plus ``_anchor`` for stable ordering."""
    has_num = F.size(F.split(F.col(line_col), " ")) != 1
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    anchored = lines.withColumn(
        "_anchor",
        F.last(F.when(has_num, F.col(idx_col)), ignorenulls=True).over(w),
    ).filter(F.col("_anchor").isNotNull())
    arr = F.array_sort(F.collect_list(F.struct(F.col(idx_col).alias("i"), F.col(line_col).alias("l"))))
    grouped = anchored.groupBy(conv_col, "_anchor").agg(arr.alias("_arr"))
    first_line = F.col("_arr")[0]["l"]
    head_text = F.element_at(F.split(first_line, " "), 2)
    tail = F.transform(
        F.slice(F.col("_arr"), 2, F.greatest(F.size("_arr") - 1, F.lit(0))),
        lambda s: s["l"],
    )
    return grouped.select(
        conv_col,
        "_anchor",
        F.split_part(first_line, F.lit(" "), F.lit(1)).alias("numbering"),
        F.array_join(F.concat(F.array(head_text), tail), "\n").alias("footnote_text"),
    )


def footnotes_array(footnotes: DataFrame, conv_col: str = "conv_id") -> DataFrame:
    """→ (conv_id, footnotes array<struct<numbering,footnote_text>>) in
    text order — the documented docs-schema ``Footnotes`` array
    (Convert_And_Extract.py:79-81 upsert shape)."""
    arr = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("_anchor").alias("a"), F.struct("numbering", "footnote_text").alias("f")))
        ),
        lambda s: s["f"],
    )
    return footnotes.groupBy(conv_col).agg(arr.alias("footnotes"))


def normalize_with_footnotes(
    transcripts: DataFrame, footnote_role: str = "footnote"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Stage-0 variant that routes footnote turns (role ==
    ``footnote_role``) out of the main turn stream into the grouped
    Footnotes table: → (turns, meta + footnotes column, footnotes).
    Content turns flow through normalize() unchanged, so the per-turn
    text-equality invariant still holds on the content stream."""
    content = transcripts.filter(F.col("role") != footnote_role)
    fn_lines = transcripts.filter(F.col("role") == footnote_role).select(
        "conv_id", F.col("turn_idx").alias("line_idx"), F.col("text").alias("line")
    )
    turns, meta = normalize(content)
    footnotes = group_footnotes(fn_lines)
    meta = meta.join(footnotes_array(footnotes), "conv_id", "left")
    return turns, meta, footnotes
