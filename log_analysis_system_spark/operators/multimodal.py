"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media ride as ``binary`` columns
next to a typed metadata struct; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes stream executor-side in columnar
batches (never through the driver, never row-at-a-time Python).

The codec here is REAL for binary Netpbm (PPM ``P6`` / PGM ``P5``) — a
pure-Python header parse + NumPy pixel statistics, no external image
libraries needed. Payloads in any other format fall back to byte-level
features with null image fields: that fallback is the seam where a full
codec stack (Pillow/libvips/ffmpeg) would slot in on a real cluster, with
the same batch shape and schema.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Promote each document to a multimodal record: UTF-8 payload bytes as
    an opaque ``binary`` column plus a typed metadata struct (the shape a
    real ingest would carry for images/audio)."""
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        blob.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(blob).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


# --------------------------------------------------------------- PPM codec
def make_ppm(doc_id: int) -> bytes:
    """Deterministic tiny P6 image for doc_id: width 2+id%3, height 2+id%2,
    pixel i = (doc_id*31 + i) % 256. Mirrors the analytic oracle SQL."""
    w, h = 2 + doc_id % 3, 2 + doc_id % 2
    header = f"P6\n{w} {h}\n255\n".encode()
    pixels = bytes((doc_id * 31 + i) % 256 for i in range(w * h * 3))
    return header + pixels


def _read_pnm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary Netpbm header: magic, then whitespace-separated
    width/height/maxval with '#' comments; returns (w, h, maxval,
    pixel_offset). Raises ValueError on malformed input."""
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3:
        while pos < n and payload[pos] in b" \t\r\n":
            pos += 1
        if pos < n and payload[pos] == ord("#"):
            while pos < n and payload[pos] != ord("\n"):
                pos += 1
            continue
        start = pos
        while pos < n and payload[pos] not in b" \t\r\n":
            pos += 1
        if pos == start:
            raise ValueError("truncated netpbm header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw pixels
    w, h, maxval = tokens
    if w <= 0 or h <= 0:
        raise ValueError(f"bad netpbm dimensions {w}x{h}")
    if maxval > 255:
        raise ValueError("16-bit netpbm samples not supported")
    return w, h, maxval, pos


def decode_image(payload: bytes) -> dict:
    """Feature-extract one payload. Binary Netpbm (P6 RGB / P5 gray) is
    decoded for real — header parse + per-channel pixel means; any other
    payload yields byte-level features with null image fields (the seam
    for a full codec stack)."""
    payload = bytes(payload)
    out = {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "last_byte": payload[-1] if payload else None,
        "width": None,
        "height": None,
        "channels": None,
        "mean_c0": None,
        "mean_c1": None,
        "mean_c2": None,
    }
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        return out
    w, h, _maxval, off = _read_pnm_header(payload)
    ch = 3 if magic == b"P6" else 1
    count = w * h * ch
    if len(payload) - off < count:
        raise ValueError("netpbm pixel data truncated")
    px = np.frombuffer(payload, dtype=np.uint8, count=count, offset=off)
    means = px.reshape(-1, ch).mean(axis=0, dtype=np.float64)
    out.update(width=w, height=h, channels=ch, mean_c0=float(means[0]))
    if ch == 3:
        out.update(mean_c1=float(means[1]), mean_c2=float(means[2]))
    return out


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_c0", DoubleType()),
        StructField("mean_c1", DoubleType()),
        StructField("mean_c2", DoubleType()),
    ]
)

_FEATURE_COLS = [f.name for f in FEATURE_SCHEMA.fields[2:]]


def attach_ppm_payload(docs: DataFrame) -> DataFrame:
    """Synthetic-image ingest: a deterministic P6 payload per doc_id
    (``make_ppm``), generated executor-side in Arrow batches. Exercises the
    real decode path end-to-end with an analytically-computable oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [make_ppm(int(d)) for d in pdf["doc_id"]],
                }
            )

    raw = docs.select("doc_id").mapInPandas(gen, "doc_id long, payload binary")
    return raw.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.octet_length("payload").alias("n_bytes"),
            F.lit("synthetic").alias("origin"),
        ).alias("meta"),
    )


def extract_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Each ``mapInPandas`` batch holds a columnar block of blobs; Netpbm
    payloads are decoded (pure Python + NumPy), everything else gets
    byte-level features — same signature and batch shape a real
    model/codec stage would use.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [decode_image(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats, columns=_FEATURE_COLS)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            out.insert(1, "mime", [m["mime"] for m in pdf["meta"]])
            yield out

    return (
        multimodal.mapInPandas(run, FEATURE_SCHEMA)
        .orderBy("doc_id")
    )
