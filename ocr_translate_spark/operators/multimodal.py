"""Multimodal (image/audio/video) column plumbing.

The reference's true payloads are images (PIL decode at
ref views.py:271, crop at ref models/ocr.py:54-66).  This container has no
image/audio libraries, so the DECODE step is stubbed — but the Spark-side
plumbing is real and tested: binary columns + typed metadata structs,
Arrow-batched header parsing, deterministic fake feature extraction with
correct schemas/batch shapes, and partition-friendly layout.

Real today (pure byte parsing, no libs):
* ``image_metadata`` — container sniffing + width/height from PNG IHDR,
  JPEG SOFx, GIF header bytes.

Stubbed behind NotImplementedError (clearly marked):
* ``decode_image`` — would use PIL/libvips on a real cluster.

Deterministic fake (real plumbing, fake math):
* ``fake_image_features`` — hash-seeded feature vector standing in for a
  CNN/CLIP embedding; exercises schema, broadcast, batch shape.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "format string, width int, height int, n_bytes long"


def sniff_image(data: bytes) -> tuple[str, int, int]:
    """(format, width, height) from container header bytes; ('unknown',-1,-1)
    when unrecognized.  Pure byte parsing — no decode."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if data[:3] == b"\xff\xd8\xff":
        i = 2
        n = len(data)
        while i + 9 < n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5: i + 9])
                return "jpeg", w, h
            seg_len = struct.unpack(">H", data[i + 2: i + 4])[0]
            i += 2 + seg_len
        return "jpeg", -1, -1
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h
    return "unknown", -1, -1


def image_metadata(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Attach (format, width, height, n_bytes) parsed from header bytes.

    Arrow-batched ``mapInPandas``; keeps all input columns."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_image(bytes(b) if b is not None else b"") for b in pdf[binary_col]]
            out = pdf.copy()
            out["format"] = [m[0] for m in metas]
            out["width"] = [m[1] for m in metas]
            out["height"] = [m[2] for m in metas]
            out["n_bytes"] = [len(b) if b is not None else 0 for b in pdf[binary_col]]
            yield out

    return df.mapInPandas(parse, schema=f"{fields}, {IMAGE_META_SCHEMA}")


def decode_image(data: bytes):  # pragma: no cover - intentional stub
    """STUB: full pixel decode.

    On a real cluster this is PIL/libvips inside the same Arrow batch loop
    (the reference decodes per request at views.py:271).  The container
    ships no imaging libraries, so this is explicitly not implemented.
    """
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; plumbing (schema/batching) is exercised via "
        "image_metadata and fake_image_features"
    )


def fake_image_features(
    df: DataFrame, binary_col: str = "payload", dim: int = 16
) -> DataFrame:
    """Deterministic stand-in for a learned image embedding.

    Features are seeded from a content hash, so the Spark-side contract
    (binary in -> fixed-dim float vector out, Arrow batch shapes, schema)
    is fully real and testable; only the math is fake."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[binary_col]:
                raw = bytes(b) if b is not None else b""
                seed = int.from_bytes(raw[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
                rng = np.random.RandomState(seed)
                feats.append(rng.rand(dim).astype(float).tolist())
            out = pdf.copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(featurize, schema=f"{fields}, features array<double>")


def make_png_bytes(width: int, height: int) -> bytes:
    """Minimal PNG header fixture (signature + IHDR) for tests."""
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"
    )
