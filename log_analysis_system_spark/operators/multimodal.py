"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media ride as ``binary`` columns
next to a typed metadata struct; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes stream executor-side in columnar
batches (never through the driver, never row-at-a-time Python).

The actual codec step is STUBBED here (no image/audio libraries in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic byte-level feature extractor
runs instead — the Spark-side plumbing (schema, batching, partitioning,
UDF signature) is real and oracle-tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
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


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode stub. Real implementation needs an image codec library
    (Pillow / libvips) — not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library; use fake=True for the "
            "deterministic byte-level stand-in"
        )
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "last_byte": payload[-1] if payload else None,
    }


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
    ]
)


def extract_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Each ``mapInPandas`` batch holds a columnar block of blobs; the stub
    "decoder" computes deterministic byte-level features (the seam where a
    real model/codec would run — same signature, same batch shape).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [decode_image(p, fake=True) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            out.insert(1, "mime", [m["mime"] for m in pdf["meta"]])
            yield out

    return (
        multimodal.mapInPandas(run, FEATURE_SCHEMA)
        .orderBy("doc_id")
    )
