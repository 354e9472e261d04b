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


MEDIA_META_SCHEMA = (
    "media_format string, channels int, sample_rate int, duration_ms long, "
    "n_bytes long"
)


def sniff_wav(data: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits, duration_ms) from RIFF/WAVE chunk
    headers; None when not a WAV.  Pure byte parsing — no decode."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    channels = sample_rate = bits = byte_rate = -1
    duration_ms = -1
    i = 12
    n = len(data)
    while i + 8 <= n:
        cid = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            channels, sample_rate = struct.unpack("<HI", data[i + 10 : i + 16])
            byte_rate = struct.unpack("<I", data[i + 16 : i + 20])[0]
            if i + 24 <= n:
                bits = struct.unpack("<H", data[i + 22 : i + 24])[0]
        elif cid == b"data" and byte_rate > 0:
            duration_ms = size * 1000 // byte_rate
        i += 8 + size + (size & 1)  # chunks are word-aligned
    return channels, sample_rate, bits, duration_ms


def sniff_mp4(data: bytes) -> tuple[str, int] | None:
    """(major brand, duration_ms) from MP4 ftyp + moov/mvhd boxes; None
    when not an ISO-BMFF container.  Pure byte parsing — no decode."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    brand = data[8:12].decode("ascii", "replace")
    duration_ms = -1

    def walk(lo: int, hi: int) -> None:
        nonlocal duration_ms
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", data[i : i + 4])[0]
            btype = data[i + 4 : i + 8]
            hdr = 8
            if size == 1:  # 64-bit extended box size (large files)
                if i + 16 > hi:
                    return
                size = struct.unpack(">Q", data[i + 8 : i + 16])[0]
                hdr = 16
            if size < hdr:
                return
            body = i + hdr
            if btype == b"moov":
                walk(body, min(i + size, hi))
            elif btype == b"mvhd" and body + 1 <= hi:
                version = data[body]
                timescale = duration = -1
                if version == 1 and body + 32 <= hi:
                    # v1: version/flags(4) ctime(8) mtime(8) ts(4) dur(8)
                    timescale = struct.unpack(">I", data[body + 20 : body + 24])[0]
                    duration = struct.unpack(">Q", data[body + 24 : body + 32])[0]
                elif version == 0 and body + 20 <= hi:
                    # v0: version/flags(4) ctime(4) mtime(4) ts(4) dur(4)
                    timescale, duration = struct.unpack(
                        ">II", data[body + 12 : body + 20]
                    )
                if timescale > 0 and duration >= 0:
                    duration_ms = duration * 1000 // timescale
            i += size

    walk(0, len(data))
    return brand, duration_ms


def sniff_media(data: bytes) -> tuple[str, int, int, int]:
    """(format, channels, sample_rate, duration_ms) across WAV/MP4/image
    containers; images report their sniffed format with -1 audio fields."""
    wav = sniff_wav(data)
    if wav is not None:
        channels, sample_rate, _bits, duration_ms = wav
        return "wav", channels, sample_rate, duration_ms
    mp4 = sniff_mp4(data)
    if mp4 is not None:
        _brand, duration_ms = mp4
        return "mp4", -1, -1, duration_ms
    fmt, _w, _h = sniff_image(data)
    return fmt, -1, -1, -1


def media_metadata(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Attach (media_format, channels, sample_rate, duration_ms, n_bytes)
    parsed from audio/video container header bytes.  Arrow-batched
    ``mapInPandas``; keeps all input columns.  The multimodal analog of
    ``image_metadata`` for WAV/MP4 payload columns."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_media(bytes(b) if b is not None else b"") for b in pdf[binary_col]]
            out = pdf.copy()
            out["media_format"] = [m[0] for m in metas]
            out["channels"] = [m[1] for m in metas]
            out["sample_rate"] = [m[2] for m in metas]
            out["duration_ms"] = [m[3] for m in metas]
            out["n_bytes"] = [len(b) if b is not None else 0 for b in pdf[binary_col]]
            yield out

    return df.mapInPandas(parse, schema=f"{fields}, {MEDIA_META_SCHEMA}")


def make_wav_bytes(
    channels: int, sample_rate: int, n_samples: int, bits: int = 16
) -> bytes:
    """Minimal valid WAV fixture (44-byte canonical header + silence)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, bits)
        + b"data"
        + struct.pack("<I", data_size)
        + b"\x00" * data_size
    )


def make_mp4_bytes(timescale: int, duration: int, brand: bytes = b"isom") -> bytes:
    """Minimal ISO-BMFF fixture: ftyp box + moov/mvhd carrying the
    timescale/duration header fields (52 bytes total)."""
    ftyp = struct.pack(">I", 16) + b"ftyp" + brand + struct.pack(">I", 0)
    mvhd = (
        struct.pack(">I", 28)
        + b"mvhd"
        + b"\x00\x00\x00\x00"  # version + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, duration)
    )
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


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


def resize_images(
    df: DataFrame,
    binary_col: str = "payload",
    max_width: int = 224,
    max_height: int = 224,
) -> DataFrame:
    """Aspect-preserving image resize — real plumbing, stubbed pixels.

    The REAL parts (what a cluster with codecs would keep unchanged):
    header sniffing, the aspect-preserving target-geometry arithmetic
    (``scale = min(max_w/w, max_h/h, 1)``, never upscale), the Arrow
    batch loop, and the output schema (original columns +
    resized_width/resized_height/resized_payload).  The FAKE part, per
    the documented container limitation (see :func:`decode_image`), is
    the pixel transform itself: the resized payload is a synthesized
    header of the computed geometry (``make_png_bytes``) instead of
    re-encoded pixels — deterministic, so tests pin the geometry math
    end-to-end.  Unparseable payloads pass through with -1 geometry and
    a NULL resized payload (never raise mid-batch at corpus scale)."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, payloads = [], [], []
            for b in pdf[binary_col]:
                raw = bytes(b) if b is not None else b""
                fmt, w, h = sniff_image(raw)
                if fmt == "unknown" or w <= 0 or h <= 0:
                    ws.append(-1)
                    hs.append(-1)
                    payloads.append(None)
                    continue
                scale = min(max_width / w, max_height / h, 1.0)
                nw = max(1, int(w * scale))
                nh = max(1, int(h * scale))
                ws.append(nw)
                hs.append(nh)
                payloads.append(make_png_bytes(nw, nh))
            out = pdf.copy()
            out["resized_width"] = ws
            out["resized_height"] = hs
            out["resized_payload"] = payloads
            yield out

    return df.mapInPandas(
        resize,
        schema=f"{fields}, resized_width int, resized_height int, "
               "resized_payload binary",
    )


def sample_frames(
    df: DataFrame,
    binary_col: str = "payload",
    every_ms: int = 1000,
    max_frames: int = 32,
) -> DataFrame:
    """Video frame sampling — real timestamp plumbing, stubbed frames.

    One output row per sampled timestamp: (original id columns, frame_idx,
    frame_ts_ms, frame_payload).  REAL: the MP4 header parse (duration
    from mvhd via :func:`sniff_mp4`), the sampling grid arithmetic
    (every ``every_ms`` from 0, capped at ``max_frames`` — the cap is the
    standard guard against a corrupt header claiming a year-long video),
    and the one-row-in/N-rows-out Arrow batch shape every real frame
    sampler needs.  FAKE: the frame payload is a deterministic
    hash-seeded PNG header (container ships no codecs — see
    :func:`decode_image`).  Non-video/unparseable payloads emit zero
    rows, the batch-safe analog of skipping undecodable media."""
    keep_cols = [f.name for f in df.schema.fields if f.name != binary_col]
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != binary_col
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in keep_cols}
            idxs, tss, frames = [], [], []
            # column zip, not iterrows: no per-row Series materialization
            keep_vals = [pdf[c] for c in keep_cols]
            for j, b in enumerate(pdf[binary_col]):
                raw = bytes(b) if b is not None else b""
                meta = sniff_mp4(raw)
                if meta is None:
                    continue
                _brand, duration_ms = meta
                n = min(max_frames, duration_ms // every_ms + 1) if duration_ms > 0 else 0
                for i in range(int(n)):
                    for c, vals in zip(keep_cols, keep_vals):
                        rows[c].append(vals.iloc[j])
                    idxs.append(i)
                    ts = i * every_ms
                    tss.append(ts)
                    frames.append(make_png_bytes(ts % 640 + 1, ts % 480 + 1))
            out = pd.DataFrame(rows | {
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_ts_ms": pd.Series(tss, dtype="int64"),
                "frame_payload": frames,
            })
            yield out

    return df.mapInPandas(
        sample,
        schema=f"{fields}, frame_idx long, frame_ts_ms long, frame_payload binary",
    )
