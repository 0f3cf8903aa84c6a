"""Multimodal column plumbing (SURVEY §2.5 Q20 [EXT]).

Images/audio/video ride through the engine as opaque ``BinaryType``
payloads with typed metadata columns; per-asset compute (decode,
resize, feature-extract, frame-sample) runs as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python
row-by-row.

This container has no image/audio libraries, so the decode step is a
clearly-marked STUB: ``decode_media(..., stub=True)`` produces
deterministic fake features derived from the payload bytes (stable
for tests), and ``stub=False`` raises ``NotImplementedError`` where a
real decoder (PIL/libav) would plug in. Everything Spark-side —
schema, batching, partitioning — is real and tested.

Scale notes (100 TB of media): payloads are the wide column; plans
must project them away before any shuffle (decode → drop payload →
aggregate). ``mapInPandas`` keeps the decode pipelined per input
partition — no collect, no per-row Python. Partition count is driven
by input file splits; target ~128 MB of payload per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Asset-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

# Output schema of the decode/feature step.
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Stand-in asset table: document text as an opaque binary payload
    (the schema is what matters — image bytes would slot in as-is)."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _stub_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: dimensions and an 8-dim feature from
    payload bytes. Replaced wholesale by a real decoder; the batch
    shape (pandas in, pandas out, column names = FEATURES_SCHEMA) is
    the contract."""
    out = {
        "asset_id": pdf["asset_id"],
        "media_type": pdf["media_type"],
        "width": [],
        "height": [],
        "n_frames": [],
        "feature": [],
    }
    for raw in pdf["payload"]:
        b = bytes(raw)
        out["width"].append(b[0] % 64 + 1 if b else 0)
        out["height"].append(b[-1] % 64 + 1 if b else 0)
        out["n_frames"].append(len(b) % 30 + 1)
        # 8 byte-histogram-ish floats — deterministic, unit-free
        out["feature"].append(
            [float(sum(b[i::8]) % 997) / 997.0 for i in range(8)] if b else [0.0] * 8
        )
    return pd.DataFrame(out)


def decode_media(assets: DataFrame, stub: bool = True) -> DataFrame:
    """Decode/feature-extract assets via Arrow-batched ``mapInPandas``.

    ``stub=False`` is the seam for a real decoder and raises
    ``NotImplementedError`` here (no media libraries in this
    environment).
    """
    if not stub:
        raise NotImplementedError(
            "real media decode needs PIL/libav — not available; use stub=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _stub_decode_batch(pdf)

    return assets.mapInPandas(run, FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# resize / frame-sample stubs (same mapInPandas contract as decode)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_media(assets: DataFrame, width: int = 32, height: int = 32, stub: bool = True) -> DataFrame:
    """Thumbnail stub: emits a deterministic fixed-size byte block per
    asset (a real implementation decodes + PIL-resizes inside the same
    batch loop). One output row per input row; payload column dropped
    before any downstream shuffle."""
    if not stub:
        raise NotImplementedError("real resize needs PIL — not available; use stub=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                bytes((b[i % max(len(b), 1)] if len(b) else 0) for i in range(width * height // 256 + 1))
                for b in (bytes(x) for x in pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "thumb": thumbs,
                }
            )

    return assets.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 10, max_frames: int = 3, stub: bool = True) -> DataFrame:
    """Frame-sampling stub (video → k frames): fans each asset out to
    ≤ max_frames rows, one per sampled frame — the row-explosion shape
    a real ffmpeg-based sampler produces. Deterministic: frame bytes
    are fixed slices of the payload."""
    if not stub:
        raise NotImplementedError("real frame sampling needs libav — use stub=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"asset_id": [], "frame_idx": [], "frame": []}
            for aid, raw in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(raw)
                n = min(max_frames, max(1, len(b) // max(every_n, 1)))
                for i in range(n):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(b[i * every_n : (i + 1) * every_n])
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, FRAMES_SCHEMA)
