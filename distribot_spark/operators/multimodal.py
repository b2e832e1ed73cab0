"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB:
- payload is a BinaryType column (or a content-addressed pointer when
  payloads exceed row-size budgets) with a metadata StructType beside it;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  `mapInPandas` stages so the (C-implemented) codec gets whole batches;
- partitioning is by content hash → uniform task sizes regardless of the
  original file layout.

The decode step is STUBBED here (no image/audio libs in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which
case a deterministic byte-level feature extractor stands in. The Spark
plumbing — schema, batching, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Metadata carried beside every payload.
MEDIA_META_SCHEMA = (
    "payload BINARY, media_type STRING, payload_bytes BIGINT, content_key STRING"
)


def attach_payload(
    df: DataFrame, source_col: str, media_type: str = "text/plain"
) -> DataFrame:
    """Wrap a column as a multimodal payload: binary bytes + metadata +
    content-addressed storage key (md5 of the payload — dedup-friendly,
    uniform partition key)."""
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.withColumns(
        {
            "payload": payload,
            "media_type": F.lit(media_type),
            "payload_bytes": F.length(payload).cast("bigint"),
            "content_key": F.md5(payload),
        }
    )


DECODED_SCHEMA = (
    "doc_id LONG, content_key STRING, n_bytes LONG, "
    "byte_mean DOUBLE, byte_histogram ARRAY<INT>, head_hex STRING"
)


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Batch 'decode' of binary payloads via mapInPandas.

    Real decode (PIL/libjpeg/ffmpeg) is unavailable in this container —
    with fake=False this raises NotImplementedError at execution time.
    fake=True runs a deterministic byte-level feature extractor with the
    exact same batching/schema shape a real decoder would use.
    """
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image/audio codecs are not installed; pass fake=True "
                    "for the deterministic byte-feature stand-in"
                )
            rows = []
            for doc_id, key, payload in zip(
                pdf["doc_id"], pdf["content_key"], pdf["payload"]
            ):
                buf = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(buf % 16, minlength=16).astype("int32")
                rows.append(
                    {
                        "doc_id": doc_id,
                        "content_key": key,
                        "n_bytes": len(buf),
                        "byte_mean": float(buf.mean()) if len(buf) else 0.0,
                        "byte_histogram": hist,
                        "head_hex": bytes(buf[:8]).hex(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "content_key", "payload").mapInPandas(
        batches, DECODED_SCHEMA
    )


RESIZED_SCHEMA = "doc_id LONG, content_key STRING, payload BINARY, width INT, height INT"


def resize_image(df: DataFrame, width: int = 8, height: int = 8, fake: bool = False) -> DataFrame:
    """Batch 'resize' via mapInPandas. Real resampling needs PIL/opencv
    (not in this container; fake=False raises at execution time). The fake
    path strided-samples the payload down to width×height bytes — same
    batching, schema, and output-size contract a real resizer has."""
    import numpy as np
    import pandas as pd

    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image codecs are not installed; pass fake=True for the "
                    "deterministic strided-sampling stand-in"
                )
            rows = []
            for doc_id, key, payload in zip(
                pdf["doc_id"], pdf["content_key"], pdf["payload"]
            ):
                buf = np.frombuffer(payload, dtype=np.uint8)
                if len(buf) == 0:
                    out = np.zeros(target, dtype=np.uint8)
                else:
                    idx = (np.arange(target) * len(buf)) // target
                    out = buf[idx]
                rows.append(
                    {"doc_id": doc_id, "content_key": key,
                     "payload": out.tobytes(), "width": width, "height": height}
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "content_key", "payload").mapInPandas(
        batches, RESIZED_SCHEMA
    )


FRAME_SCHEMA = (
    "doc_id LONG, frame_idx INT, frame_offset LONG, frame_bytes INT, frame_md5 STRING"
)


def frame_sample(df: DataFrame, n_frames: int = 4, frame_size: int = 32) -> DataFrame:
    """Sample N fixed-size 'frames' (byte windows at even offsets) per
    payload — the video-keyframe-sampling shape: one input row fans out to
    n_frames rows, batch-processed in mapInPandas. Fully deterministic, so
    it runs as-is (a real codec would replace the window slicing)."""
    import hashlib

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                for k in range(n_frames):
                    off = (k * max(len(buf) - frame_size, 0)) // max(n_frames - 1, 1)
                    frame = buf[off : off + frame_size]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": k,
                            "frame_offset": off,
                            "frame_bytes": len(frame),
                            "frame_md5": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)
