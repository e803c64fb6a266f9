"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): ``FAKE_CODEC`` parses a deterministic synthetic header so the
Spark-side plumbing — schema, partitioning, mapInPandas batch shape,
metadata propagation — is real and tested. Swapping in PIL/ffmpeg later
only replaces the two ``_decode_*`` functions.

Synthetic binary layout (produced by make_fake_image/make_fake_audio):
  image: b"IMG|<width>|<height>|<channels>|" + payload bytes
  audio: b"AUD|<sample_rate>|<n_samples>|" + payload bytes
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)

FEATURE_DIM = 8

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def make_fake_image(width: int, height: int, channels: int = 3) -> bytes:
    payload = bytes((width * height + i) % 251 for i in range(32))
    return f"IMG|{width}|{height}|{channels}|".encode() + payload


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def make_fake_audio(sample_rate: int, n_samples: int) -> bytes:
    payload = bytes((n_samples + i) % 251 for i in range(16))
    return f"AUD|{sample_rate}|{n_samples}|".encode() + payload


def audio_metadata(media: DataFrame) -> DataFrame:
    """STUB audio decode: parse the synthetic AUD header into typed
    metadata (sample rate, sample count, duration). Same Arrow-batched
    plumbing as image_metadata; a real build swaps in soundfile/ffprobe."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for b in pdf["content"]:
                if b is None or not b.startswith(b"AUD|"):
                    out.append(None)
                    continue
                try:
                    _, sr, n, _rest = b.split(b"|", 3)
                    out.append((int(sr), int(n)))
                except (ValueError, IndexError):
                    out.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [d[0] if d else None for d in out],
                    "n_samples": [d[1] if d else None for d in out],
                    "duration_s": [
                        d[1] / d[0] if d and d[0] else None for d in out
                    ],
                    "decode_ok": [d is not None for d in out],
                }
            )

    return media.mapInPandas(batches, AUDIO_META_SCHEMA)


def _decode_image_header(content: bytes):
    """STUB decode: parse the synthetic header. A real build replaces this
    with PIL.Image.open; everything around it stays identical."""
    if content is None or not content.startswith(b"IMG|"):
        return None
    try:
        _, w, h, c, _rest = content.split(b"|", 4)
        return int(w), int(h), int(c)
    except (ValueError, IndexError):
        return None


def image_metadata(media: DataFrame) -> DataFrame:
    """Extract typed metadata from binary image columns via mapInPandas
    (Arrow-batched; never a per-row Python UDF).

    Scale: embarrassingly parallel per input partition; the binary column
    never shuffles — only the small metadata projection leaves the scan
    stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_image_header(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": [d[0] if d else None for d in decoded],
                    "height": [d[1] if d else None for d in decoded],
                    "channels": [d[2] if d else None for d in decoded],
                    "n_bytes": [
                        len(b) if b is not None else None for b in pdf["content"]
                    ],
                    "decode_ok": [d is not None for d in decoded],
                }
            )

    return media.mapInPandas(batches, IMAGE_META_SCHEMA)


def image_features(media: DataFrame) -> DataFrame:
    """STUB feature extraction: deterministic FEATURE_DIM-dim vector from
    the payload bytes (stands in for a CNN/CLIP embedding; the batch shape,
    Arrow transfer, and output schema are the real thing)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf["content"]:
                if b is None or not b.startswith(b"IMG|"):
                    feats.append(None)
                    continue
                payload = b.split(b"|", 4)[4]
                feats.append(
                    [
                        float(sum(payload[i::FEATURE_DIM]) % 997) / 997.0
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields) + [T.StructField("decode_ok", T.BooleanType())]
)


def _pil_module():
    """Real-codec hook: PIL if installed in the cluster image, else None
    (this environment ships no image libraries — import-gated, never a
    hard dependency)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def resize_images(media: DataFrame, max_dim: int) -> DataFrame:
    """Aspect-preserving resize to ``max_dim``. FAKE_CODEC binaries get
    their synthetic header rewritten (payload untouched); real formats use
    PIL when the cluster image ships it. Undecodable rows — real formats
    with no codec installed, truncated bytes, NULLs — pass through
    UNCHANGED with ``decode_ok=false`` instead of failing the job: a mixed
    100 TB corpus always contains garbage, and a resize job must report it,
    not die on it.

    Scale: mapInPandas (Arrow-batched); binary content stays in its input
    partition — no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _pil_module()
        for pdf in it:
            out, ok = [], []
            for b in pdf["content"]:
                hdr = _decode_image_header(b)
                if hdr is not None:
                    w, h, c = hdr
                    scale = min(1.0, max_dim / max(w, h))
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    payload = b.split(b"|", 4)[4]
                    out.append(f"IMG|{nw}|{nh}|{c}|".encode() + payload)
                    ok.append(True)
                    continue
                if b is not None and pil is not None:
                    try:
                        import io

                        img = pil.open(io.BytesIO(b))
                        img.thumbnail((max_dim, max_dim))
                        buf = io.BytesIO()
                        img.save(buf, format=img.format or "PNG")
                        out.append(buf.getvalue())
                        ok.append(True)
                        continue
                    except Exception:
                        pass  # fall through to pass-through-with-flag
                out.append(b)
                ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "content": out,
                    "decode_ok": ok,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_index) rows for
    frames a real decoder would extract — pure column ops (sequence +
    explode), no decode needed for planning.

    The decode-and-extract step is the stubbed part; the fan-out shape
    (one row per sampled frame, partitioned by media_id) is real.
    """
    n_frames = (F.length("content") % 100 + 1).alias("n_frames")  # stub count
    return (
        media.select("media_id", n_frames)
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_index"),
        )
    )
