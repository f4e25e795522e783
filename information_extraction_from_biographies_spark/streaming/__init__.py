"""Structured Streaming surface (SURVEY §2.10).

The reference is strictly batch; the engine's input table carries ``ts``,
so stage 0-1 are additionally exposed as streaming transformations for
continuously-arriving transcripts. Batch remains the parity path.
"""
