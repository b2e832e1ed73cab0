"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB:
- payload is a BinaryType column (or a content-addressed pointer when
  payloads exceed row-size budgets) with a metadata StructType beside it;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  `mapInPandas` stages so the codec gets whole batches;
- partitioning is by content hash → uniform task sizes regardless of the
  original file layout.

The decode/resize steps are REAL: `operators/codecs.py` implements binary
PPM (P6) and 24-bit BMP from their byte-layout specs with numpy + stdlib
struct (no PIL/ffmpeg in this environment — a production deployment would
swap the codec module, not this plumbing). `synthesize_image` renders a
deterministic per-doc image whose pixel function is plain integer
arithmetic, so the full encode → decode → aggregate path is
hash-checkable against a DuckDB oracle that reproduces the arithmetic.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distribot_spark.operators import codecs

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


def synth_pixel_channels(x, y, d):
    """The deterministic pixel function behind `synthesize_image` — plain
    integer arithmetic so a SQL oracle can reproduce every aggregate of
    the decoded image: r,g,b = f(x, y, doc_id) mod 256."""
    r = (7 * x + 13 * y + d) % 256
    g = (3 * x + 5 * y + 2 * d) % 256
    b = (11 * x + 2 * y + 3 * d) % 256
    return r, g, b


def synthesize_image(
    df: DataFrame, width: int = 24, height: int = 16, fmt: str = "ppm"
) -> DataFrame:
    """Render a real encoded image per doc (payload = valid P6 PPM or
    24-bit BMP bytes; pixels from `synth_pixel_channels`). This is the
    test-harness stand-in for an ingest step that reads real image files —
    everything downstream of it (decode, resize, feature extraction) runs
    the same code a real corpus would."""
    import numpy as np
    import pandas as pd

    encode = {"ppm": codecs.encode_ppm, "bmp": codecs.encode_bmp}[fmt]
    media_type = {"ppm": "image/x-portable-pixmap", "bmp": "image/bmp"}[fmt]
    ys, xs = np.mgrid[0:height, 0:width]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                r, g, b = synth_pixel_channels(xs, ys, d)
                img = np.stack([r, g, b], axis=-1).astype(np.uint8)
                payload = encode(img)
                rows.append({"doc_id": d, "payload": payload})
            yield pd.DataFrame(rows)

    imgs = df.select("doc_id").mapInPandas(batches, "doc_id LONG, payload BINARY")
    return imgs.withColumns(
        {
            "media_type": F.lit(media_type),
            "payload_bytes": F.length("payload").cast("bigint"),
            "content_key": F.md5("payload"),
        }
    )


DECODED_SCHEMA = (
    "doc_id LONG, format STRING, width INT, height INT, n_pixels LONG, "
    "mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE"
)


def decode_image(df: DataFrame) -> DataFrame:
    """Batch decode of binary image payloads via mapInPandas: sniff the
    format by magic bytes, parse with the real PPM/BMP codec, emit true
    dimensions + per-channel means (rounded to 4 dp for cross-engine
    determinism). Unsupported payloads decode to format='unknown' with
    null dims — task isolation, a corrupt file must not kill the scan."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                try:
                    fmt, img = codecs.decode(buf)
                    h, w = img.shape[:2]
                    means = img.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                    # FLOOR(x*1e4 + 0.5)/1e4 — the exact half-up formula
                    # the oracle spells out (CLAUDE.md determinism rules)
                    r4 = [float(np.floor(m * 10000 + 0.5) / 10000) for m in means]
                    rows.append(
                        {
                            "doc_id": doc_id, "format": fmt,
                            "width": w, "height": h, "n_pixels": h * w,
                            "mean_r": r4[0], "mean_g": r4[1], "mean_b": r4[2],
                        }
                    )
                except (ValueError, struct.error):
                    # struct.error: payload sniffs as BMP (b'BM' prefix)
                    # but is shorter than the header unpack needs
                    rows.append(
                        {
                            "doc_id": doc_id, "format": "unknown",
                            "width": None, "height": None, "n_pixels": None,
                            "mean_r": None, "mean_g": None, "mean_b": None,
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id LONG, payload BINARY, width INT, height INT, "
    "mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE"
)


def resize_image(df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Batch resize via mapInPandas: real decode → nearest-neighbor
    resample (integer index math, codecs.resize_nearest) → re-encode as
    PPM. Emits the resized payload plus its channel means so the resample
    arithmetic is oracle-checkable."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, img = codecs.decode(bytes(payload))
                small = codecs.resize_nearest(img, width, height)
                means = small.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                r4 = [float(np.floor(m * 10000 + 0.5) / 10000) for m in means]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": codecs.encode_ppm(small),
                        "width": width, "height": height,
                        "mean_r": r4[0], "mean_g": r4[1], "mean_b": r4[2],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


BYTE_FEATURES_SCHEMA = (
    "doc_id LONG, content_key STRING, n_bytes LONG, "
    "byte_mean DOUBLE, byte_histogram ARRAY<INT>, head_hex STRING"
)


def byte_features(df: DataFrame) -> DataFrame:
    """Format-agnostic byte-level features (histogram/mean/head) — the
    cheap first-pass stats a media pipeline computes before (or instead
    of) a full decode, e.g. for corruption triage and content clustering."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
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
        batches, BYTE_FEATURES_SCHEMA
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


# -- audio --------------------------------------------------------------------


def synth_audio_sample(i, d):
    """Deterministic int16 sample function behind `synthesize_audio` —
    integer arithmetic only, so a SQL oracle reproduces every aggregate
    of the decoded audio: s_i = (37·i + 11·doc_id) mod 65536 − 32768."""
    return (37 * i + 11 * d) % 65536 - 32768


def synthesize_audio(
    df: DataFrame, n_samples: int = 480, sample_rate: int = 8000
) -> DataFrame:
    """Render a real PCM WAV per doc (stdlib wave container, samples from
    `synth_audio_sample`) — the audio twin of `synthesize_image`:
    everything downstream runs exactly what a real audio corpus would."""
    import numpy as np
    import pandas as pd

    idx = np.arange(n_samples, dtype=np.int64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                samples = synth_audio_sample(idx, d).astype(np.int16)
                rows.append(
                    {"doc_id": d, "payload": codecs.encode_wav(samples, sample_rate)}
                )
            yield pd.DataFrame(rows)

    wavs = df.select("doc_id").mapInPandas(batches, "doc_id LONG, payload BINARY")
    return wavs.withColumns(
        {
            "media_type": F.lit("audio/wav"),
            "payload_bytes": F.length("payload").cast("bigint"),
            "content_key": F.md5("payload"),
        }
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id LONG, sample_rate INT, n_samples LONG, duration_sec DOUBLE, "
    "mean_amp DOUBLE, rms DOUBLE"
)


def audio_features(df: DataFrame) -> DataFrame:
    """Batch audio feature extraction via mapInPandas: REAL WAV parse
    (stdlib wave), then mean amplitude and RMS in float64. int16 sums
    stay exact in float64 (< 2^53), so AVG/SQRT match any engine's
    summation order bit-for-bit; the half-up 4-dp round is the same
    FLOOR formula the oracle spells out. Corrupt payloads yield
    sample_rate=null rows instead of killing the scan."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rate, samples = codecs.decode_wav(bytes(payload))
                    v = samples.astype(np.float64)
                    mean_amp = float(np.floor(v.mean() * 10000 + 0.5) / 10000)
                    rms = float(
                        np.floor(np.sqrt((v * v).mean()) * 10000 + 0.5) / 10000
                    )
                    rows.append(
                        {
                            "doc_id": doc_id, "sample_rate": rate,
                            "n_samples": len(v),
                            "duration_sec": len(v) / rate,
                            "mean_amp": mean_amp, "rms": rms,
                        }
                    )
                except ValueError:
                    rows.append(
                        {
                            "doc_id": doc_id, "sample_rate": None,
                            "n_samples": None, "duration_sec": None,
                            "mean_amp": None, "rms": None,
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


PHASH_SCHEMA = "doc_id LONG, phash_hi LONG, phash_lo LONG"


def phash_image(df: DataFrame) -> DataFrame:
    """Perceptual hash (aHash variant) per image: decode → integer
    grayscale ((r+g+b)//3) → 8×8 nearest-neighbor downsample → 64-bit
    signature, bit j set iff its cell is brighter than the image mean
    (compared as 64·g > Σg — pure integers, no float mean). Near-dup
    images differ in a few bits; unrelated images in ~32. Packed as two
    int32 halves so every shift stays < 2^32 (the bloom/CMS overflow
    discipline). Batch Arrow path over the payload column; pair search
    composes with the SimHash banded-join machinery (operators/dedup)."""
    import numpy as np
    import pandas as pd

    # job-invariant bit-position masks, built once (not per image)
    j = np.arange(8)[:, None] * 8 + np.arange(8)[None, :]
    lo_mask = (j < 32) << np.clip(j, 0, 31)
    hi_mask = (j >= 32) << np.clip(j - 32, 0, 31)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    _, img = codecs.decode(bytes(payload))
                except (ValueError, struct.error):
                    continue
                gray = (
                    img[:, :, 0].astype(np.int64)
                    + img[:, :, 1]
                    + img[:, :, 2]
                ) // 3
                small = codecs.resize_nearest(gray, 8, 8)
                total = int(small.sum())
                bits = (64 * small > total).astype(np.int64)
                lo = int((bits * lo_mask).sum())
                hi = int((bits * hi_mask).sum())
                rows.append(
                    {"doc_id": int(doc_id), "phash_hi": hi, "phash_lo": lo}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "phash_hi", "phash_lo"])

    return df.select("doc_id", "payload").mapInPandas(batches, PHASH_SCHEMA)
