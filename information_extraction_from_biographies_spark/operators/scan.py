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

Scale notes: two distribution paths for the probe dictionary, identical
scan output (tests/test_scan_paths.py). Default: raw registry rows are
broadcast and each worker builds the automaton once (≈100 B/surface).
Huge registries (≥10^7 surfaces, where the driver collect + broadcast
re-ship is the bottleneck): ``build_surface_index(via_file=...)`` leaves
the registry on parquet and each worker reads + builds locally.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..functions.clauses import split_clauses_with_offsets
from ..functions.grouped import grouped_map, ordered_group
from ..functions.matcher import SurfaceIndexHandle

_SCAN_SCHEMA = "conv_id string, kind string, pos int, person string, surface string"


def build_surface_index(surfaces_df: DataFrame, via_file: str | None = None):
    """Build the J1 probe-dictionary handle.

    Default: collect the registry (Arrow toPandas — py4j row collection of
    a 10^5-surface registry costs ~10s of serial driver time; the Arrow
    path is ~30x faster and this sits on the pipeline's critical path) and
    broadcast the raw rows; executors build the automaton once per worker
    (matcher.cached_index).

    ``via_file=<path>``: the huge-registry path (≥10^7 surfaces, where the
    driver collect + broadcast re-ship would be the bottleneck) — write
    the registry to parquet and return a FileSurfaceIndexHandle; each
    worker reads the parquet itself and builds the automaton locally.
    Scan output is identical on both paths (tests/test_scan_paths.py).

    親屬關係暫存-packed pseudo-aliases are kept — the reference probes them
    too (Utilities.py:58-63); they simply never match text."""
    if via_file is not None:
        from ..functions.matcher import FileSurfaceIndexHandle

        surfaces_df.select("surface", "person", "kind").write.mode("overwrite").parquet(
            via_file
        )
        return FileSurfaceIndexHandle(via_file)
    pdf = surfaces_df.toPandas()
    rows = [
        (s, p, k)
        for s, p, k in zip(pdf["surface"], pdf["person"], pdf["kind"])
        if s is not None
    ]
    return SurfaceIndexHandle(surfaces_df.sparkSession, rows)


def scan_mentions(turns: DataFrame, index) -> DataFrame:
    """→ (conv_id, kind, pos, person, surface); see module docstring.
    ``index``: SurfaceIndexHandle or FileSurfaceIndexHandle."""
    getter = index.worker_getter()

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = getter()
        conv_id = pdf["conv_id"].iloc[0]
        ordered = ordered_group(pdf)
        text = "\n\n".join(str(t) for t in ordered["norm_text"] if t is not None)
        rows = []
        # one automaton pass serves detection + per-clause occurrences
        # (see SurfaceIndex.scan_text_clauses)
        clause_off = split_clauses_with_offsets(text)
        detected, clause_matches = idx.scan_text_clauses(
            text, [(s, s + len(c)) for c, _pos, s in clause_off]
        )
        for person in detected:
            rows.append((conv_id, "person", -1, person, None))
        for (_clause, pos, _s), matches in zip(clause_off, clause_matches):
            for person, surface, _k in matches:
                rows.append((conv_id, "occ", pos, person, surface))
        return pd.DataFrame(rows, columns=["conv_id", "kind", "pos", "person", "surface"])

    return grouped_map(
        turns.select("conv_id", "turn_idx", "norm_text"), _scan, _SCAN_SCHEMA
    )


def occurrences(scan: DataFrame) -> DataFrame:
    return scan.filter(F.col("kind") == "occ").select("conv_id", "pos", "person", "surface")


def persons_in_conv(scan: DataFrame) -> DataFrame:
    return scan.filter(F.col("kind") == "person").select("conv_id", "person")
