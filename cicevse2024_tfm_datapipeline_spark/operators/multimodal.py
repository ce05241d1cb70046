"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata.

The container has no image/audio codecs, so the decode step is STUBBED
(clearly marked) — but the Spark-side plumbing is real and tested:
schema, Arrow batch shape, partition sizing, UDF signatures. Swap
``_decode_stub`` for a real decoder (PIL/torchaudio/ffmpeg) in
production; nothing else changes.

Scale notes: payloads stay in the executor (never collected); decode is
``mapInPandas`` so each Arrow batch amortizes Python overhead; batch
size is bounded via ``spark.sql.execution.arrow.maxRecordsPerBatch`` for
large payloads (set it down for video).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_hash string, "
    "byte_mean double, byte_entropy double, feature array<double>"
)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload with
    typed metadata — exercises the binary-column path end to end."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB: real deployments decode image/audio here. Raises for media
    types that would need codecs; text payloads get a deterministic fake
    'decode' (byte array) so the downstream plumbing is testable."""
    if media_type.startswith("text/"):
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"decoder for {media_type!r} requires codec libraries not present "
        "in this environment (PIL / torchaudio / ffmpeg)"
    )


def extract_features(media: DataFrame, n_feature_bins: int = 16) -> DataFrame:
    """Decode → feature-extract over Arrow batches. Features here are a
    deterministic stand-in (byte histogram + entropy); a real pipeline
    would emit CNN embeddings / mel spectrogram stats with the SAME
    signature and schema."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                arr = _decode_stub(payload, r["media_type"])
                hist = np.bincount(arr % n_feature_bins, minlength=n_feature_bins).astype(float)
                p = hist / max(1.0, hist.sum())
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "media_type": r["media_type"],
                        "n_bytes": len(payload),
                        "content_hash": hashlib.md5(payload).hexdigest(),
                        "byte_mean": float(arr.mean()) if len(arr) else 0.0,
                        "byte_entropy": entropy,
                        "feature": (hist / max(1.0, hist.sum())).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each payload row into frame
    timestamps (decode stubbed — emits the sampling plan, which is the
    Spark-side part: one row per frame to extract, partitioned by media)."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / F.lit(every_ms)).cast("int")
    return media.select(
        "media_id",
        "media_type",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms))
