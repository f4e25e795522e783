"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition-friendly batch shape, Arrow
transfer, UDF signatures) is real and tested; the codec step itself is a
deterministic fake behind ``DecodeBackend`` because the image/audio
libraries are not in this container — swap ``FakeCodec`` for a
Pillow/soundfile-backed implementation on a real cluster without touching
the Spark plumbing.

Schema convention:
    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

# single source of truth for the typed-metadata struct: every schema that
# carries `meta` derives from this, so adding a field can't silently
# diverge a mapInPandas output schema from MEDIA_SCHEMA
META_STRUCT = "struct<width:int, height:int, sample_rate:int, n_frames:int>"
MEDIA_SCHEMA = f"media_id long, kind string, payload binary, meta {META_STRUCT}"


class FakeCodec:
    """Deterministic stand-in: 'decodes' a payload into a pseudo pixel/PCM
    array derived from its bytes. Real backend: Pillow / soundfile / ffmpeg
    (NOT installed here — this class is the explicitly-marked stub)."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        raw = np.frombuffer(payload, dtype=np.uint8)
        need = width * height
        reps = int(np.ceil(need / max(len(raw), 1)))
        return np.tile(raw, reps)[:need].reshape(height, width)

    def decode_audio(self, payload: bytes, sample_rate: int) -> np.ndarray:
        # float64 so the PCM arithmetic is bit-identical to any engine
        # doing the same ops in double (the relational oracle relies on it)
        raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        return (raw - 127.5) / 127.5


def synth_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic binary fixtures (no external data).

    Payload byte j of row i is ``(i*31 + j*17 + seed) % 256`` — an
    arithmetic series, so a relational oracle can regenerate the exact
    pixel/PCM arrays from ``range()`` without ever seeing the binary
    (the feature queries are hash-checked against DuckDB on this)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        size = 128 + (i % 5) * 64
        payload = (
            ((np.arange(size, dtype=np.int64) * 17 + i * 31 + seed) % 256)
            .astype(np.uint8)
            .tobytes()
        )
        meta = {
            "width": 8 + i % 8 if kind != "audio" else None,
            "height": 8 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 10 + i % 4 if kind == "video" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def image_features(media: DataFrame, codec: FakeCodec | None = None) -> DataFrame:
    """Decode + feature-extract images: (media_id, mean_px, std_px, histo8).
    mapInPandas: one Arrow batch of binaries in, one feature frame out."""
    codec = codec or FakeCodec()

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mean_px": [], "std_px": [], "histo8": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                img = codec.decode_image(bytes(payload), w, h)
                hist, _ = np.histogram(img, bins=8, range=(0, 256))
                out["media_id"].append(mid)
                out["mean_px"].append(float(img.mean()))
                out["std_px"].append(float(img.std()))
                out["histo8"].append(hist.astype("int64").tolist())
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "meta")
        .mapInPandas(_feat, schema="media_id long, mean_px double, std_px double, histo8 array<long>")
    )


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Decode → nearest-neighbour resize → re-encode as raw bytes.
    (media_id, payload binary, meta) — same media schema shape out, with
    meta.width/height REWRITTEN to the output dimensions (without them
    the resized payload is undecodable: nothing else records that the
    raw bytes are now out_w×out_h)."""
    codec = FakeCodec()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                img = codec.decode_image(bytes(payload), w, h)
                ys = (np.arange(out_h) * h // out_h)[:, None]
                xs = (np.arange(out_w) * w // out_w)[None, :]
                small = img[ys, xs]
                ids.append(mid)
                payloads.append(small.astype(np.uint8).tobytes())
                metas.append({**dict(meta), "width": out_w, "height": out_h})
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "meta")
        .mapInPandas(
            _resize,
            schema=f"media_id long, payload binary, meta {META_STRUCT}",
        )
    )


def frame_sample(media: DataFrame, every: int = 3) -> DataFrame:
    """Video frame sampling: explode (media_id, frame_idx) for every k-th
    frame — pure relational (sequence + explode), the decode of individual
    frames stays behind the codec boundary."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
        )
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Decode audio → (media_id, rms, n_samples)."""
    codec = FakeCodec()

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rms, ns = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                pcm = codec.decode_audio(bytes(payload), int(meta["sample_rate"] or 16000))
                ids.append(mid)
                rms.append(float(np.sqrt((pcm**2).mean())))
                ns.append(len(pcm))
            yield pd.DataFrame({"media_id": ids, "rms": rms, "n_samples": ns})

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload", "meta")
        .mapInPandas(_feat, schema="media_id long, rms double, n_samples long")
    )
