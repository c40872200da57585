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


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content_sha256", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize plumbing. The real codec (PIL) is not
    installed here, so the default ``resize_fn`` is a deterministic
    fake (truncate/pad payload to width*height bytes); swap in
    ``lambda b, w, h: PIL_resize(b, w, h)`` in production. One output
    row per input row -- mapInPandas, no shuffle."""

    def default_resize(payload: bytes, w: int, h: int) -> bytes:
        need = w * h
        return (payload * (need // max(len(payload), 1) + 1))[:need]

    fn = resize_fn or default_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "content_sha256": pdf["content_sha256"].values,
                    "width": width,
                    "height": height,
                    "resized": [fn(bytes(p), width, height)
                                for p in pdf["payload"]],
                }
            )

    return df.select("doc_id", "payload", "content_sha256").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 256,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one input row
    fans out to <= max_frames rows (mapInPandas generator shape). The
    deterministic fake treats every ``every_n_bytes`` slice as a
    "frame"; a real build decodes with av/ffmpeg. Output is exploded
    (doc_id, frame_no, frame) -- the shape downstream feature
    extraction expects."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(min(max_frames, max(len(raw), 1) // every_n_bytes + 1)):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(raw[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return df.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


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


def payload_phash16(
    df: DataFrame, payload_col: str = "payload", out_col: str = "phash16"
) -> DataFrame:
    """16-bit blockwise-mean perceptual hash of a binary payload --
    pure JVM expressions, no UDF: the payload's bytes split into 16
    contiguous blocks and bit b is set iff block b's mean byte value
    reaches the payload's global mean. The compare is the exact
    integer cross product (blocksum * n >= total * blocklen), so no
    division ever runs and the hash is bit-stable cross-engine. Small
    in-block edits leave most block means (hence most bits) intact --
    the pHash blocking idea with the DCT swapped for plain block
    means, which is what stays replayable without a codec.

    Payloads shorter than 16 bytes have no meaningful blocks (empty
    slices would trivially satisfy ``0*n >= tot*0`` and set bits, and
    an empty payload would feed ``substring`` a descending sequence),
    so the hash is NULL for them -- the guard lives HERE, not at call
    sites, so direct use of the operator is safe too.

    Scale shape: one narrow map over the payload column; the per-row
    byte array is transient expression state, never shuffled.
    """
    d = (
        df.withColumn("__hx", F.hex(F.col(payload_col)))
        .withColumn("__n", F.octet_length(F.col(payload_col)).cast("long"))
        .withColumn(
            "__bs",
            F.expr(
                "transform(sequence(1, CAST(__n AS INT)), i ->"
                " CAST(conv(substring(__hx, 2*i-1, 2), 16, 10) AS BIGINT))"
            ),
        )
        .withColumn("__tot", F.expr("aggregate(__bs, 0L, (a, x) -> a + x)"))
    )
    hash_expr = (
        "IF(__n >= 16, "
        "aggregate(transform(sequence(0, 15), b -> IF("
        " aggregate(slice(__bs, CAST(b * __n DIV 16 AS INT) + 1,"
        "   CAST((b + 1) * __n DIV 16 - b * __n DIV 16 AS INT)),"
        "   0L, (a, x) -> a + x) * __n"
        " >= __tot * ((b + 1) * __n DIV 16 - b * __n DIV 16),"
        " CAST(shiftleft(1, CAST(b AS INT)) AS BIGINT), 0L)),"
        " 0L, (a, x) -> a + x), CAST(NULL AS BIGINT))"
    )
    return d.withColumn(out_col, F.expr(hash_expr)).drop(
        "__hx", "__bs", "__tot", "__n"
    )


def phash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 2,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Perceptual near-dup pairs over binary payloads: block on THREE
    segments of the 16-bit block hash (6+5+5 bits -- pigeonhole: a
    pair differing in at most 2 bits can touch at most 2 segments, so
    it MUST share one; two halves would only guarantee hamming <= 1,
    silently dropping pairs whose two differing bits straddle the
    halves), group buckets (collect_list, never a self-join -- the
    hash pass is the expensive corpus scan), cap oversize buckets, and
    verify hamming exactly with bit_count(xor). Same bucket discipline
    as simhash_near_pairs. Recall is exact for ``max_hamming <= 2``
    (pinned by a brute-force differential in test_multimodal.py);
    larger radii would need h+1 segments."""
    if max_hamming > 2:
        raise ValueError(
            "phash_near_pairs blocks on 3 segments: exact recall only "
            f"for max_hamming <= 2, got {max_hamming}"
        )
    h = payload_phash16(df, payload_col).select(
        F.col(id_col).alias("id"), "phash16"
    ).filter(F.col("phash16").isNotNull())
    segs = h.select(
        "id",
        "phash16",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("seg_no"),
                    (F.col("phash16") % 64).alias("seg"),
                ),
                F.struct(
                    F.lit(1).alias("seg_no"),
                    F.expr("(phash16 DIV 64) % 32").alias("seg"),
                ),
                F.struct(
                    F.lit(2).alias("seg_no"),
                    F.expr("phash16 DIV 2048").alias("seg"),
                ),
            )
        ).alias("c"),
    ).select("id", "phash16", F.col("c.seg_no"), F.col("c.seg"))
    buckets = (
        segs.groupBy("seg_no", "seg")
        .agg(F.collect_list(F.struct("id", "phash16")).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= max_bucket_size))
    )
    pair_expr = F.expr(
        "flatten(transform(ms, (x, i) ->"
        " transform(slice(ms, i + 2, size(ms)), y ->"
        " named_struct("
        "   'id_a', least(x.id, y.id),"
        "   'id_b', greatest(x.id, y.id),"
        "   'hamming',"
        "   CAST(bit_count(x.phash16 ^ y.phash16) AS BIGINT)))))"
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
