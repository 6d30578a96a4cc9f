"""Deterministic synthetic media table for the multimodal operators.

Payloads use the FakeCodec packed-header format so decode /
feature-extract / resize / frame-sample run for real on fixture data
(no image/audio libraries in this container). `generate_real_images`
emits GENUINE PNG / GIF / JPEG byte streams built with the stdlib
(zlib + struct) for the HeaderCodec real-decode path.
"""

from __future__ import annotations

import struct
import zlib

import pandas as pd

from web_crawler_spark.operators.multimodal import FakeCodec


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """A complete, spec-valid 8-bit grayscale PNG (IHDR+IDAT+IEND)."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((seed + x + y * width) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_gif(width: int, height: int) -> bytes:
    """A minimal spec-valid single-frame GIF89a."""
    header = b"GIF89a" + struct.pack("<HH", width, height) + b"\xf0\x00\x00"
    palette = b"\x00\x00\x00\xff\xff\xff"
    img_desc = b"\x2c\x00\x00\x00\x00" + struct.pack("<HH", width, height) + b"\x00"
    # 2-bit LZW minimum code size + one clear+end block (blank image)
    data = b"\x02\x02\x44\x01\x00"
    return header + palette + img_desc + data + b"\x3b"


def encode_jpeg(width: int, height: int) -> bytes:
    """A JPEG byte stream with valid SOI/APP0/SOF0/EOI framing (header
    metadata is real; entropy data is empty)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def generate_real_images(n: int = 12, seed: int = 7) -> pd.DataFrame:
    """Genuine PNG/GIF/JPEG payloads for the HeaderCodec path."""
    rows = []
    encoders = [("png", encode_png), ("gif", encode_gif), ("jpeg", encode_jpeg)]
    for i in range(n):
        fmt, enc = encoders[i % 3]
        w, h = 8 + 4 * (i % 9), 6 + 3 * (i % 7)
        payload = enc(w, h, seed + i) if fmt == "png" else enc(w, h)
        rows.append(
            {
                "media_ref": f"https://host{i % 3}.example.test/img/{i}.{fmt}",
                "kind": "image",
                "payload": payload,
                "true_width": w,
                "true_height": h,
            }
        )
    return pd.DataFrame(rows)


def generate_media(n: int = 60, seed: int = 42) -> pd.DataFrame:
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = (64 + 16 * (i % 40), 48 + 8 * (i % 50)) if kind == "image" else (0, 0)
        dur = 0 if kind == "image" else 500 + 250 * (i % 20)
        nf = 0 if kind != "video" else 10 + (i % 30)
        rows.append(
            {
                "media_ref": f"https://host{i % 3}.example.test/media/{i}.bin",
                "kind": kind,
                "payload": FakeCodec.encode(kind, w, h, dur, nf, seed * 10_007 + i),
            }
        )
    # one corrupt payload to exercise the error branch
    rows.append(
        {
            "media_ref": "https://host0.example.test/media/corrupt.bin",
            "kind": "image",
            "payload": b"\x00\x01notmagic",
        }
    )
    return pd.DataFrame(rows)
