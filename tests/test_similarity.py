"""Similarity operators: centroid-assignment path parity and near-dup
bucket cap."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F  # noqa: N812

from information_extraction_from_biographies_spark.operators import similarity as sim


def _emb_df(spark, n=40, dim=8, seed=5):
    rng = np.random.RandomState(seed)
    rows = [(i, rng.normal(size=dim).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pandas_assignment_matches_expression_path(spark):
    """The large-k numpy assignment must agree with the literal-expression
    assignment (same argmax semantics) on well-separated data."""
    emb = _emb_df(spark)
    ids = np.arange(40)
    vecs = np.asarray(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    cents = sim.kmeans_centroids_np(vecs, ids, k=4, iters=2)

    via_expr = {
        r["vec_id"]: r["c"]
        for r in emb.withColumn(
            "c", sim._nearest_centroid_expr(F.col("embedding"), cents)
        ).collect()
    }
    via_pandas = {
        r["vec_id"]: r["c"] for r in sim._assign_centroids_pandas(emb, cents).collect()
    }
    assert via_expr == via_pandas


def test_ivf_topk_with_precomputed_centroids(spark):
    emb = _emb_df(spark)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ids = np.arange(40)
    vecs = np.asarray(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    cents = sim.kmeans_centroids_np(vecs, ids, k=4, iters=2)
    out = sim.ivf_topk(emb, q, k=3, centroids=cents, nprobe=2).collect()
    assert {r["query_id"] for r in out} == {0, 1}
    # a query's own vector lives in its probed list -> rank 1, cosine ~1
    best = {r["query_id"]: r for r in out if r["rank"] == 1}
    assert best[0]["vec_id"] == 0 and abs(best[0]["cosine"] - 1.0) < 1e-9


def test_embedding_near_dup_cap_bounds_bucket(spark):
    # 30 identical vectors land in one LSH bucket; cap=5 bounds the pairs
    base = np.ones(8).tolist()
    rows = [(i, base) for i in range(30)] + [(100, (-np.ones(8)).tolist())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = sim.embedding_near_dup(emb, threshold=0.9, bits=4, dim=8, cap=5).count()
    uncapped = sim.embedding_near_dup(emb, threshold=0.9, bits=4, dim=8, cap=None).count()
    assert uncapped == 30 * 29 // 2
    assert capped == 5 * 4 // 2


def test_ivf_persisted_index_partition_pruning(spark, tmp_path):
    """ivf_build/ivf_query: persisted index queries prune to the probed
    inverted lists (PartitionFilters on c), and results match the
    in-memory ivf_topk with the same centroids."""
    import contextlib
    import io

    emb = _emb_df(spark, n=60)
    ids = np.arange(60)
    vecs = np.asarray(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    cents = sim.kmeans_centroids_np(vecs, ids, k=4, iters=2)
    path = str(tmp_path / "ivf_index")
    sim.ivf_build(emb, path, centroids=cents)

    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = sim.ivf_query(spark, path, q, k=3, nprobe=2)
    got = {(r["query_id"], r["vec_id"], r["rank"]) for r in out.collect()}
    expect = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in sim.ivf_topk(emb, q, k=3, centroids=cents, nprobe=2).collect()
    }
    assert got == expect and len(got) > 0

    # the index scan carries partition filters on c (pruned to probed lists)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    scan_sections = [s for s in plan.split("Scan parquet") if "PartitionFilters" in s]
    assert scan_sections, plan
    assert any("c#" in s.split("PartitionFilters", 1)[1].split("]", 1)[0] for s in scan_sections)


def test_sample_embeddings_pq_bounded_read(tmp_path):
    """The centroid-fitting driver read is O(max_rows), not O(file): on a
    file bigger than the cap, sample_embeddings_pq stops early (round-2
    verdict: the full-corpus pq.read_table would OOM the driver at scale)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n, dim = 5000, 4
    rng = np.random.RandomState(11)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(rng.normal(size=(n, dim)).tolist()),
        }
    )
    path = str(tmp_path / "emb.parquet")
    pq.write_table(tbl, path)

    ids, vecs, rows_read = sim.sample_embeddings_pq(path, max_rows=256, batch_size=128)
    assert len(ids) == 256 and vecs.shape == (256, dim)
    assert rows_read <= 256 + 128  # at most one extra batch past the cap
    # deterministic: file order, so the sample is exactly the first rows
    assert ids.tolist() == list(range(256))


def test_ivf_oracle_survives_missing_sf_dir(monkeypatch):
    """A missing testdata dir must cost only the ann_ivf_topk oracle, not
    the whole oracle_sql() dict (round-2 ADVICE: the hardcoded-path read
    used to raise during dict construction, killing every oracle)."""
    import __spark_entry__ as entry

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/nonexistent/sfX")
    oracles = entry.oracle_sql()
    assert "ann_ivf_topk" not in oracles
    assert "dedup_minhash_lsh" in oracles and "q1_pricing_summary" in oracles
