"""Similarity search over an embedding column (vec_id, embedding:array<float>).

- brute_force_topk — exact cosine top-k: broadcast the (small) query set,
  compute the dot product with zip_with/aggregate (JVM-side higher-order
  functions — no Python in the hot path), rank with a window.
- lsh_topk — random-hyperplane LSH: sign-bit bucket join prunes the
  candidate set before the exact cosine, the scale path when the corpus
  is 10^9+ vectors (brute force stays the per-bucket verifier).

Scale notes: brute force is a broadcast nested-loop by construction —
correct baseline, O(|corpus|·|queries|). LSH replaces it with an equi-join
on bucket id; recall is tunable via tables × bits.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """(query_id, vec_id, cosine, rank): exact top-k per query.

    ``queries``: (query_id, query_vec array<float>) — broadcast side."""
    joined = embeddings.join(F.broadcast(queries))
    scored = joined.select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("query_vec"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplanes(dim: int, bits: int = 12, seed: int = 13) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim)).tolist()


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from fixed hyperplanes — a pure column expr."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(vec_col, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: join on LSH bucket, exact cosine within bucket."""
    planes = hyperplanes(dim, bits, seed)
    emb_b = embeddings.withColumn("bucket", lsh_bucket_expr(F.col("embedding"), planes))
    q_b = queries.withColumn("bucket", lsh_bucket_expr(F.col("query_vec"), planes))
    joined = emb_b.join(F.broadcast(q_b), "bucket")
    scored = joined.select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("query_vec"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
