"""Multimodal plumbing: the binary-payload feature extractors hash-match
their relational oracles because synth_media's payload bytes are an
arithmetic series ((i*31 + j*17 + seed) % 256) a SQL engine regenerates
from range() — the same contract the driver's CORRECTNESS harness checks
(__spark_entry__.oracle_sql: mm_image_features / mm_audio_features)."""

import duckdb
import numpy as np
import pytest

from information_extraction_from_biographies_spark.operators import multimodal as mm


def _canon(pdf):
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True).astype(str)


@pytest.mark.parametrize("name", ["mm_image_features", "mm_audio_features"])
def test_feature_oracle_parity(spark, name):
    import __spark_entry__ as entry

    sdf = entry.queries()[name](spark, "unused-sf-dir").toPandas()
    odf = duckdb.connect().execute(entry.oracle_sql()[name]).df()
    assert list(_canon(sdf).columns) == list(_canon(odf).columns)
    assert _canon(sdf).equals(_canon(odf)), f"{name}: Spark vs DuckDB oracle mismatch"


def test_payload_bytes_are_the_documented_series(spark):
    rows = mm.synth_media(spark, n=9, seed=3).select("media_id", "payload").collect()
    for r in rows:
        i = r["media_id"]
        raw = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        expect = (np.arange(len(raw), dtype=np.int64) * 17 + i * 31 + 3) % 256
        assert (raw == expect).all()
        assert len(raw) == 128 + (i % 5) * 64


def test_decode_audio_is_float64():
    pcm = mm.FakeCodec().decode_audio(bytes([0, 255, 128]), 16000)
    assert pcm.dtype == np.float64
    assert pcm[0] == (0 - 127.5) / 127.5 and pcm[1] == (255 - 127.5) / 127.5


def test_resize_meta_carries_output_dims(spark):
    """resize_images keeps the media schema shape: meta rides along with
    width/height REWRITTEN to the output dims — without them the resized
    raw bytes are undecodable (nothing else records the new geometry)."""
    out = mm.resize_images(mm.synth_media(spark, n=12), out_w=4, out_h=4).collect()
    assert out
    for r in out:
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4
        assert r["meta"]["sample_rate"] is None  # image rows, untouched fields
        assert len(r["payload"]) == 16
