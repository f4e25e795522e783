"""J1 — the mention-scan join (people registry ⋈ conversation text).

Semantically ``transcripts JOIN registry ON contains(text, surface)`` — a
BroadcastNestedLoopJoin if written in SQL. The scalable physical strategy
(SURVEY.md §4) is an Aho-Corasick automaton over the broadcast registry,
one pass per conversation inside applyInPandas.

Emits two row kinds per conversation:
- 'occ'    — clause-positioned occurrences (repeatOK=True semantics:
             one row per (clause, person, surface) containment,
             Utilities.py:49-67 + Cooccurrence.py:35-53, incl. the
             dropped-trailing-clause quirk)
- 'person' — distinct persons found anywhere in the full text
             (repeatOK=False scan; feeds A4 biographee priors and N5)

Scale notes: the automaton is built once on the driver and shipped in the
UDF closure (≈100 B/surface; a 10^7-surface registry is ~1 GB — at that
scale it would be built per-executor from a registry parquet via a
mapPartitions initializer; the algorithmic shape is unchanged).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..functions.clauses import split_clauses_with_positions
from ..functions.grouped import grouped_map
from ..functions.extraction import KIN_TEMP_TYPE
from ..functions.matcher import SurfaceIndexHandle, cached_index

_SCAN_SCHEMA = "conv_id string, kind string, pos int, person string, surface string"


def build_surface_index(surfaces_df: DataFrame) -> SurfaceIndexHandle:
    """Collect the registry and broadcast the raw surface rows; executors
    build the automaton once per worker (matcher.cached_index).

    親屬關係暫存-packed pseudo-aliases are kept — the reference probes them
    too (Utilities.py:58-63); they simply never match text."""
    # Arrow toPandas, NOT collect(): py4j row collection of a 10^5-surface
    # registry costs ~10s of serial driver time; the Arrow path is ~30x
    # faster and this sits on the pipeline's critical path.
    pdf = surfaces_df.toPandas()
    rows = [
        (s, p, k)
        for s, p, k in zip(pdf["surface"], pdf["person"], pdf["kind"])
        if s is not None
    ]
    return SurfaceIndexHandle(surfaces_df.sparkSession, rows)


def scan_mentions(turns: DataFrame, index: SurfaceIndexHandle) -> DataFrame:
    """→ (conv_id, kind, pos, person, surface); see module docstring."""
    bc = index.broadcast

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = cached_index(bc)
        conv_id = pdf["conv_id"].iloc[0]
        ordered = pdf.sort_values("turn_idx")
        text = "\n\n".join(str(t) for t in ordered["norm_text"] if t is not None)
        rows = []
        for person in idx.distinct_persons_in(text):
            rows.append((conv_id, "person", -1, person, None))
        for clause, pos in split_clauses_with_positions(text):
            for person, surface, _k in idx.persons_in(clause):
                rows.append((conv_id, "occ", pos, person, surface))
        return pd.DataFrame(rows, columns=["conv_id", "kind", "pos", "person", "surface"])

    return grouped_map(
        turns.select("conv_id", "turn_idx", "norm_text"), _scan, _SCAN_SCHEMA
    )


def occurrences(scan: DataFrame) -> DataFrame:
    return scan.filter(F.col("kind") == "occ").select("conv_id", "pos", "person", "surface")


def persons_in_conv(scan: DataFrame) -> DataFrame:
    return scan.filter(F.col("kind") == "person").select("conv_id", "person")
