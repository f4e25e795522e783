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
from pyspark.sql import DataFrame
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
    runs once instead of once per output table."""
    base = transcripts.select(*TURN_COLS)
    enriched0 = base.filter(F.col("turn_idx") == 0).mapInPandas(_enrich_turn0, schema=_ENRICHED_SCHEMA)
    if persist_enriched:
        enriched0 = enriched0.persist()
    meta = enriched0.select("conv_id", "biographee", "english_name", "birth", "death", "authors")
    rest = base.filter(F.col("turn_idx") != 0).withColumn("norm_text", F.col("text"))
    turns = enriched0.select(*TURN_COLS, "norm_text").unionByName(rest)
    return turns, meta, enriched0
