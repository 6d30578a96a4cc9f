"""Deterministic synthetic media table for the multimodal operators.

Payloads use the FakeCodec packed-header format so decode /
feature-extract / resize / frame-sample run for real on fixture data
(no image/audio libraries in this container).
"""

from __future__ import annotations

import pandas as pd

from web_crawler_spark.operators.multimodal import FakeCodec


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
