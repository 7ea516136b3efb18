"""Multimodal columns — image/audio/video as opaque BINARY + typed metadata.

The training-data pipeline treats media as `payload BINARY` with typed
metadata columns; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over `mapInPandas`. No image/audio codec library
exists in this environment, so the DECODE step is a clearly-marked
DETERMINISTIC FAKE (`fake_decode_*` — dimensions and durations derived
arithmetically from the payload bytes); everything Spark-side — schemas,
column pruning, batch shapes, UDF signatures, partitioning — is real and
tested. Swapping in PIL/ffmpeg touches only the `fake_decode_*` bodies.

Scale notes: payloads never pass through a shuffle — every operator here is
a narrow map (mapInPandas) over the scan, and outputs carry metadata (or
per-frame slices), not the original blob, so a 100 TB media table streams
through without widening any exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

FRAME_BYTES = 256        # fake fixed-size "frame" for video sampling
AUDIO_BYTES_PER_MS = 16  # fake audio bitrate


# --- deterministic fake decoders (the stubbed non-Spark part) ----------------


def fake_decode_image(payload: bytes) -> tuple[int, int, str]:
    """STUB decoder — no codec libs in this env. Deterministic dims from the
    byte length (swap in PIL here for real decoding)."""
    n = len(payload)
    return (n % 640 + 1, (n // 640) % 480 + 1, "L")


def fake_decode_audio_ms(payload: bytes) -> int:
    """STUB — fake constant-bitrate duration."""
    return len(payload) // AUDIO_BYTES_PER_MS


def real_decode_image(payload: bytes):
    """The genuine decode path, gated on a library this container lacks."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decoding needs PIL; this environment ships none — "
            "use fake_decode_image for plumbing tests") from e
    import io

    from PIL import Image
    return Image.open(io.BytesIO(payload))


# --- media table derivation ---------------------------------------------------


def media_from_documents(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Deterministic media fixture: payload = utf-8 bytes of `text`.
    Pure Catalyst (encode/length/md5) — reproducible in the DuckDB oracle."""
    return docs.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


META_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("fp", StringType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("mode", StringType(), False),
])


def image_metadata(media: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, fp, width, height, mode) via one mapInPandas pass.
    Column-pruned to (doc_id, payload); the payload does not survive."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, mode = fake_decode_image(b)
                rows.append((int(doc_id), len(b),
                             hashlib.md5(b).hexdigest(), w, h, mode))
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(fn, schema=META_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("payload", BinaryType(), False),
])


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: batch in, batch out with the target dims stamped.
    The pixel transform is the stubbed part (payload passes through,
    truncated proportionally to the fake dimension change — deterministic)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, _ = fake_decode_image(b)
                scale = min(1.0, (target_w * target_h) / max(1, w * h))
                out = b[: max(1, int(len(b) * scale))]
                rows.append((int(doc_id), target_w, target_h, out))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(fn, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), False),
])


def sample_frames(media: DataFrame, every_n: int = 4,
                  frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Video frame sampling (UDTF-shaped: one row in, many out). The payload
    is treated as concatenated fixed-size frames (fake container format);
    every_n-th frame is emitted."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    frames.append(b[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"),
                 "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame": frames})

    return media.select("doc_id", "payload").mapInPandas(fn, schema=FRAME_SCHEMA)


def frame_counts(media: DataFrame, every_n: int = 4,
                 frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """(doc_id, n_frames, n_sampled) — metadata-only, pure Catalyst."""
    n_frames = F.ceil(F.length("payload") / F.lit(frame_bytes)).cast("long")
    n_sampled = F.ceil(n_frames / F.lit(every_n)).cast("long")
    return media.select("doc_id", n_frames.alias("n_frames"),
                        n_sampled.alias("n_sampled"))


def audio_durations(media: DataFrame) -> DataFrame:
    """(doc_id, duration_ms) — fake constant-bitrate model, pure Catalyst."""
    return media.select(
        "doc_id",
        (F.length("payload") / F.lit(AUDIO_BYTES_PER_MS)).cast("long")
        .alias("duration_ms"))
