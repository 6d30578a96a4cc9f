"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Task-brief contract: the decode step itself is STUBBED (image/audio
libraries are not in this container) but the Spark-side plumbing —
schema, partitioning, Arrow batch shape, mapInPandas signatures — is
real and tested.

Data model: a `media` table

  media(media_ref: string, kind: string,           -- image|audio|video
        payload: binary, meta: struct<...>)

joined from `documents.spans` rows with kind='media' via media_ref
(the span contract in BASELINE.json input_hint). At 100 TB the media
table is bucketed by xxhash64(media_ref) so the span→payload join is
co-partitioned and payload bytes never shuffle more than once.

Decode tiers:
- `FakeCodec` (default): deterministic header parse of the fixture
  payload format (`FAKE<kind><w,h,...>` packed header + pseudo-pixel
  bytes) — lets every downstream stage (resize plan, frame sampling,
  feature extraction) run for real on synthetic data.
- `RealCodec`: import-gated PIL/av hook; raises NotImplementedError
  in this container, marking exactly where production decode plugs in.

Feature extraction is a genuine computation either way: a normalized
256-bin byte histogram per payload (numpy over Arrow batches) — a
real, library-free embedding the ANN operators can consume.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("payload_bytes", LongType()),
        StructField("ok", StringType()),  # 'ok' | error message
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("kind", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

_MAGIC = b"FAKE"
_HDR = struct.Struct(">4s1sIIII")  # magic, kind byte, w, h, duration_ms, n_frames


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


class FakeCodec:
    """Deterministic stand-in codec for the fixture payload format."""

    @staticmethod
    def encode(kind: str, width: int, height: int, duration_ms: int,
               n_frames: int, seed: int) -> bytes:
        body_len = min(4096, max(16, (width * height) // 64))
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        body = rng.randint(0, 256, size=body_len, dtype=np.int64).astype(np.uint8)
        return _HDR.pack(
            _MAGIC, kind[:1].encode(), width, height, duration_ms, n_frames
        ) + body.tobytes()

    @staticmethod
    def decode(payload: bytes) -> dict:
        if payload is None or len(payload) < _HDR.size or payload[:4] != _MAGIC:
            return {"width": None, "height": None, "duration_ms": None,
                    "n_frames": None, "ok": "decode error: bad magic"}
        _, _k, w, h, dur, nf = _HDR.unpack(payload[: _HDR.size])
        return {"width": w, "height": h, "duration_ms": dur, "n_frames": nf,
                "ok": "ok"}


_SOF_MARKERS = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)


class HeaderCodec:
    """REAL image metadata decode — pure-stdlib header parsing for
    PNG / JPEG / GIF payloads. Dimensions come from the actual byte
    format (PNG IHDR, GIF logical screen descriptor, JPEG SOFn scan),
    so this path works on genuine image files with no library at all.
    Pixel decode / audio / video still need PIL/av — ``RealCodec``
    below stays the import-gated hook for those."""

    @staticmethod
    def decode(payload: bytes) -> dict:
        none = {"width": None, "height": None, "duration_ms": None,
                "n_frames": None}
        if payload is None or len(payload) < 10:
            return {**none, "ok": "decode error: truncated payload"}
        b = bytes(payload)
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            if len(b) < 24 or b[12:16] != b"IHDR":
                return {**none, "ok": "decode error: bad PNG IHDR"}
            w, h = struct.unpack(">II", b[16:24])
            return {"width": w, "height": h, "duration_ms": None,
                    "n_frames": 1, "ok": "ok"}
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            # frame count = number of image descriptors (animated GIFs)
            nf = max(1, b.count(b"\x2c\x00"))  # cheap lower-bound scan
            return {"width": w, "height": h, "duration_ms": None,
                    "n_frames": nf, "ok": "ok"}
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in _SOF_MARKERS:
                    h = int.from_bytes(b[i + 5 : i + 7], "big")
                    w = int.from_bytes(b[i + 7 : i + 9], "big")
                    return {"width": w, "height": h, "duration_ms": None,
                            "n_frames": 1, "ok": "ok"}
                i += 2 + seg_len
            return {**none, "ok": "decode error: no JPEG SOF segment"}
        return {**none, "ok": "decode error: unsupported format"}


class RealCodec:
    """Full pixel/audio/video decode hook. Image HEADERS already decode
    for real via HeaderCodec (pure stdlib); this class is where PIL/av
    pixel access plugs in on clusters that ship those libraries."""

    @staticmethod
    def decode(payload: bytes) -> dict:
        meta = HeaderCodec.decode(payload)
        if meta["ok"] == "ok":
            return meta  # header-derived metadata needs no library
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "pixel/audio/video decode requires PIL/av, absent here; "
                "HeaderCodec covers PNG/JPEG/GIF metadata without them"
            ) from exc
        raise NotImplementedError("wire PIL pixel decode here in production")


# ---------------------------------------------------------------------------
# mapInPandas stages (Arrow-batched; payload bytes stay executor-side)
# ---------------------------------------------------------------------------


def decode_media(media: DataFrame, codec=FakeCodec) -> DataFrame:
    """media → typed metadata rows. One Arrow batch in, one out; the
    payload column is dropped on output so downstream stages never
    carry bytes they don't need (column pruning by construction)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [codec.decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "ok": [m["ok"] for m in metas],
                }
            )
            yield out

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, bins: int = 64) -> DataFrame:
    """Payload → normalized byte-histogram feature vector (real math,
    no external libs; numpy over Arrow batches)."""
    schema = FEATURES_SCHEMA

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    feats.append([0.0] * bins)
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
                v = hist.astype(np.float64)
                n = np.linalg.norm(v)
                feats.append((v / n if n > 0 else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "kind": pdf["kind"],
                 "features": feats}
            )

    return media.mapInPandas(_feat, schema=schema)


def resize_plan(decoded: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize as a *plan* (target dims native-computed from metadata);
    the pixel transform itself belongs to the stubbed codec layer."""
    scale = F.when(
        F.greatest("width", "height") > max_dim,
        max_dim / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return decoded.withColumn(
        "target_width", F.round(F.col("width") * scale).cast("int")
    ).withColumn("target_height", F.round(F.col("height") * scale).cast("int"))


def sample_frames(decoded: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling as a native lateral explode of frame
    timestamps — one output row per sampled frame offset."""
    v = decoded.filter((F.col("kind") == "video") & (F.col("ok") == "ok"))
    return v.select(
        "media_ref",
        "duration_ms",
        "n_frames",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    ).withColumn(
        "frame_idx",
        F.least(
            (F.col("frame_ts_ms") / F.greatest("duration_ms", F.lit(1))
             * F.col("n_frames")).cast("int"),
            F.col("n_frames") - 1,
        ),
    )


def media_refs_from_documents(docs: DataFrame) -> DataFrame:
    """documents(spans) → distinct media_ref rows (span kind='media')."""
    return (
        docs.select(
            F.explode(
                F.filter("spans", lambda s: s["kind"] == F.lit("media"))
            ).alias("s")
        )
        .select(F.col("s.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull())
        .distinct()
    )


def bucket_media(media: DataFrame, num_buckets: int = 64) -> DataFrame:
    """Scale path: co-partition payloads by media_ref hash so the
    span→payload join is a single co-located shuffle."""
    return media.repartition(num_buckets, F.xxhash64("media_ref"))
