"""Pure-Python kernels executed inside Arrow-batched pandas UDFs.

Nothing in this package touches Spark: each module is a deterministic,
picklable algorithm (multi-pattern matcher, clause splitter, extraction
rules) that the operators in ``..operators`` ship to executors inside
``applyInPandas`` / ``mapInPandas`` closures.
"""
