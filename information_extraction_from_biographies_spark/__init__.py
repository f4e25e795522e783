"""PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the *capabilities* of
``richarddwang/Information_Extraction_from_Biographies`` (reference, read-only
at ``/root/reference/``) as an idiomatic PySpark pipeline over a table of
multi-turn transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Four stages (SURVEY.md §7):

0. normalize    — per-turn text cleanup, stable turn ordering (W4)
1. mentions     — multi-pattern mention detection + entity-link scoring
                  against a broadcast alias dictionary (J1/J2/J3, N1-N4)
2. triples      — candidate (subj, pred, obj) extraction per turn
                  (N3 kinship, N5 verb-phrase, N6 timeline, N7 born-in, N8)
3. canonicalize — connected components over the mention-alias graph (J7)
4. materialize  — nodes / edges / cooccurrence / timeline tables (A2-A7)

This is NOT a port: the reference is a single-machine MongoDB-backed
thread-parallel pipeline; this engine is DataFrame/Arrow end-to-end with
explicit partitioning, broadcast joins, skew salting, and per-stage
checkpoints with lineage for mid-pipeline resume.
"""

__version__ = "0.1.0"
