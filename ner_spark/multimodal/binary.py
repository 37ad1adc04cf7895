"""Multimodal plumbing over opaque ``binary`` columns.

Images/audio/video are carried as ``binary`` payloads with a typed metadata
struct; feature extraction runs in Arrow-batched ``mapInPandas`` so payloads
never round-trip through Python row objects.  The container has no
image/audio libraries, so the *codec* step is gated: ``decode_image`` raises
``NotImplementedError`` unless PIL is importable.  Everything that can be
computed without a codec is real and tested: byte histograms, payload
hashing, deterministic frame sampling (fixed-stride byte slicing stands in
for keyframe extraction, same schema and batching as the real thing).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("id long, media binary, mime string, width int, height int, "
                "duration_ms int")
FEATURE_SCHEMA = ("id long, n_bytes long, sha_prefix string, entropy double, "
                  "histogram array<int>")
FRAME_SCHEMA = "id long, frame_no int, frame_bytes binary"


def decode_image(payload: bytes):  # pragma: no cover - codec not in image
    """Real decode path, gated on PIL availability."""
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "byte-level features below are the tested path") from exc
    return Image.open(io.BytesIO(payload))


def featurize(df: DataFrame, id_col: str = "id",
              media_col: str = "media") -> DataFrame:
    """Codec-free features per payload: size, digest prefix, byte entropy,
    16-bin byte histogram.  One numpy pass per Arrow batch."""
    src = df.select(F.col(id_col).alias("id"), F.col(media_col).alias("media"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"id": [], "n_bytes": [], "sha_prefix": [], "entropy": [],
                   "histogram": []}
            for i, payload in zip(pdf["id"], pdf["media"]):
                b = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=16) if b.size else np.zeros(16, int)
                p = hist / hist.sum() if hist.sum() else hist
                ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
                out["id"].append(i)
                out["n_bytes"].append(int(b.size))
                out["sha_prefix"].append(
                    hashlib.sha256(bytes(payload or b"")).hexdigest()[:16])
                out["entropy"].append(round(ent, 6))
                out["histogram"].append(hist.astype(int).tolist())
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, id_col: str = "id",
                  media_col: str = "media") -> DataFrame:
    """Deterministic fixed-stride "frame" sampling of a binary payload —
    the plumbing (schema, batch shape, explode) of real keyframe sampling."""
    src = df.select(F.col(id_col).alias("id"), F.col(media_col).alias("media"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for i, payload in zip(pdf["id"], pdf["media"]):
                b = bytes(payload or b"")
                step = max(1, len(b) // n_frames)
                for fno in range(n_frames):
                    ids.append(i)
                    nos.append(fno)
                    frames.append(b[fno * step:(fno + 1) * step])
            yield pd.DataFrame({"id": ids, "frame_no": nos, "frame_bytes": frames})

    return src.mapInPandas(fn, schema=FRAME_SCHEMA)
