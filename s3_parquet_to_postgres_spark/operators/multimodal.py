"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, plus the Arrow-batched decode/feature plumbing.

Design: a modality column is ``BinaryType`` payload + a metadata struct
(content sha256, byte length, declared mime). Content addressing uses
``sha2`` so dedup and caching compose with the dedup operators. The
decode / feature-extraction step runs as ``mapInPandas`` (Arrow batches
in, Arrow batches out) -- the only sane shape for per-item Python work
at scale. The actual codecs (PIL/librosa/av) are NOT in this container,
so ``decode_fn`` is pluggable: the default deterministic fake derives
"features" from the payload bytes, and ``strict_decode_stub`` raises
NotImplementedError to mark the integration point. The Spark-side
plumbing -- schema, batching, partitioning -- is real and tested.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


# Ship function bodies by value (workers may not have this package on
# PYTHONPATH when the driver embeds us from an arbitrary cwd).
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def attach_binary_payload(
    df: DataFrame, source_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Wrap a column's bytes as a modality payload with metadata.
    (With real media, the payload arrives as parquet BinaryType
    already; here text bytes stand in so the plumbing is testable.)"""
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.withColumns(
        {
            "payload": payload,
            "content_sha256": F.sha2(payload, 256),
            "n_bytes": F.octet_length(payload).cast("long"),
            "mime": F.lit(mime),
        }
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content_sha256", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a media decoder: 4 features derived
    from payload bytes. Replace with PIL/librosa decode in production."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:: max(1, n // 16)]) % 997),
    ]


def strict_decode_stub(payload: bytes) -> list[float]:
    """The real integration point; codecs are not installed here."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/av, not available in this "
        "environment -- inject fake_decode or a real codec"
    )


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes], list[float]] = fake_decode,
    batch_limit: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    ``mapInPandas`` keeps transfer vectorized; decode_fn runs per item
    inside the batch. Input needs columns doc_id/payload/
    content_sha256/n_bytes (from attach_binary_payload).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].values,
                        "content_sha256": chunk["content_sha256"].values,
                        "n_bytes": chunk["n_bytes"].values,
                        "features": [
                            decode_fn(bytes(p)) for p in chunk["payload"]
                        ],
                    }
                )

    cols = ["doc_id", "payload", "content_sha256", "n_bytes"]
    return df.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)
