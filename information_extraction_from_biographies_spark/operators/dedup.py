"""Deduplication operators over a documents table (doc_id, text, ...).

Beyond the reference's scope (its dedup is name-set U1/F5); these are the
operations a large-scale training-data pipeline needs, built Spark-first:

- exact_dedup          — hash-groupBy on md5(text); one shuffle, map-side
                         partial agg; survivor = min(doc_id).
- minhash_signatures   — char-shingle MinHash, k hash functions, computed
                         as k conditional aggregates over an exploded
                         shingle table (all JVM-side: xxhash64 + min).
- lsh_candidate_pairs  — band the signature, self-join on (band, bucket):
                         the classic MinHash-LSH blocking join. Candidate
                         pairs only — verification is a separate operator
                         so the expensive exact Jaccard runs on the
                         blocked set, not n².
- ngram_jaccard_pairs  — exact shingle-set Jaccard for candidate pairs
                         (array_intersect/array_union sizes).
- simhash              — 64-bit SimHash over word tokens; vectorized
                         numpy inside mapInPandas (bit-vote matrix),
                         near-dups = hamming distance ≤ t via banded
                         equality join on 16-bit chunks.

Scale notes: every join is an equi-join on a derived key (bucket, band,
chunk) — shuffle-partitionable, no nested-loop anywhere. Shingling
explodes ~|text| rows per doc; at 100 TB you shard by doc_id range first
(the operators take pre-filtered frames, so callers control scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (content_hash, n_dups, keep_id)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


def shingles(docs: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle): distinct char n-grams per document — built with
    sequence + transform + explode, no Python."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(text_col) - n + 1, F.lit(1))),
                    lambda i: F.substring(F.col(text_col), i, F.lit(n)),
                )
            )
        ).alias("shingle"),
    ).filter(F.length("shingle") == n)


def minhash_signatures(shingle_df: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(doc_id, h0..h{k-1}): k independent min-hashes, one aggregate pass."""
    aggs = [
        F.min(F.xxhash64(F.concat(F.lit(f"s{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingle_df.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """Band the signature and self-join on (band, bucket) → candidate
    near-duplicate pairs (doc1 < doc2), distinct."""
    hash_cols = [c for c in signatures.columns if c.startswith("h")]
    rows_per_band = len(hash_cols) // bands
    band_rows = []
    for b in range(bands):
        cols = hash_cols[b * rows_per_band : (b + 1) * rows_per_band]
        band_rows.append(
            signatures.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(c) for c in cols]).alias("bucket"),
            )
        )
    banded = band_rows[0]
    for br in band_rows[1:]:
        banded = banded.unionByName(br)
    left = banded.select("band", "bucket", F.col("doc_id").alias("doc1"))
    right = banded.select("band", "bucket", F.col("doc_id").alias("doc2"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )


def ngram_jaccard_pairs(
    shingle_df: DataFrame, candidates: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs:
    (doc1, doc2, jaccard)."""
    sets = shingle_df.groupBy("doc_id").agg(F.collect_set("shingle").alias("sh"))
    j = (
        candidates.join(sets.withColumnRenamed("doc_id", "doc1").withColumnRenamed("sh", "sh1"), "doc1")
        .join(sets.withColumnRenamed("doc_id", "doc2").withColumnRenamed("sh", "sh2"), "doc2")
        .select(
            "doc1",
            "doc2",
            (
                F.size(F.array_intersect("sh1", "sh2"))
                / F.size(F.array_union("sh1", "sh2"))
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens (vectorized numpy bit votes):
    (doc_id, simhash)."""
    import numpy as np
    import pandas as pd

    def _sim(batches):
        for pdf in batches:
            out_ids, out_hashes = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                tokens = str(text).lower().split()
                if not tokens:
                    out_ids.append(did)
                    out_hashes.append(0)
                    continue
                # deterministic 64-bit token hashes (FNV-1a)
                hs = np.empty(len(tokens), dtype=np.uint64)
                for t_i, tok in enumerate(tokens):
                    h = np.uint64(0xCBF29CE484222325)
                    for ch in tok.encode("utf-8"):
                        h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                    hs[t_i] = h
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sh = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
                out_ids.append(did)
                out_hashes.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_hashes})

    return docs.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        _sim, schema="doc_id long, simhash long"
    )


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate pairs by SimHash: block on the four 16-bit chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal), verify with
    bit_count(xor)."""
    chunks = sim
    for c in range(4):
        chunks = chunks.withColumn(
            f"c{c}", F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF))
        )
    pairs = None
    for c in range(4):
        left = chunks.select(F.col("doc_id").alias("doc1"), F.col("simhash").alias("s1"), F.col(f"c{c}").alias("k"))
        right = chunks.select(F.col("doc_id").alias("doc2"), F.col("simhash").alias("s2"), F.col(f"c{c}").alias("k"))
        p = left.join(right, "k").filter(F.col("doc1") < F.col("doc2")).select("doc1", "doc2", "s1", "s2")
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.distinct()
        .withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )
