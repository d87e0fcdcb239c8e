"""Multimodal columns (SURVEY.md L4): opaque binary payloads + typed
metadata, with decode/feature-extraction as Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the actual decode is
STUBBED: ``decode_features(..., impl="real")`` raises
NotImplementedError, while ``impl="fake"`` runs a deterministic
bytes-level feature extractor through the exact same Spark plumbing
(mapInPandas over binary columns, Arrow batches, explicit schema) —
the part that matters for the engine is real and tested.

Scale notes: payloads ride as parquet binary; mapInPandas streams
Arrow record batches so a partition never fully materializes in
Python; feature extraction parallelism is just partition parallelism
(repartition upstream to size batches for codec memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MULTIMODAL_SCHEMA = (
    "doc_id BIGINT, payload BINARY, "
    "meta STRUCT<byte_len: BIGINT, content_hash: STRING, mime: STRING>"
)

FEATURES_SCHEMA = "doc_id BIGINT, byte_len BIGINT, features ARRAY<DOUBLE>"


def to_multimodal(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload: binary, meta: struct). Models an
    image/audio table: payload is an opaque blob, metadata is typed."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("bigint").alias("byte_len"),
            F.substring(F.md5(F.col("text")), 1, 8).alias("content_hash"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: bytes-level summary stats
    shaped like a FEATURE_DIM-dim embedding."""
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
        float(max(payload)),
        float(min(payload)),
        float(len(set(payload))),
        float(sum(payload[:16]) % 256),
    ]


def decode_features(mm: DataFrame, impl: str = "fake") -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    impl="real" is the codec slot (unavailable in this container ->
    NotImplementedError raised executor-side at first batch);
    impl="fake" exercises identical plumbing deterministically.
    """
    if impl not in ("real", "fake"):
        raise ValueError(f"impl must be 'real' or 'fake', got {impl!r}")

    use_real = impl == "real"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: no module-level references, so the
        # pickled UDF needs nothing importable on the worker
        dim = 8

        def fake(payload: bytes) -> list[float]:
            if not payload:
                return [0.0] * dim
            n = len(payload)
            return [
                float(n),
                float(payload[0]),
                float(payload[-1]),
                float(sum(payload) % 997),
                float(max(payload)),
                float(min(payload)),
                float(len(set(payload))),
                float(sum(payload[:16]) % 256),
            ]

        for pdf in batches:
            if use_real:
                raise NotImplementedError(
                    "real decode requires image/audio codecs not present in "
                    "this environment; use impl='fake' for the plumbing path"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len),
                    "features": pdf["payload"].map(fake),
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(extract, schema=FEATURES_SCHEMA)
