"""Multimodal columns (SURVEY.md L4): opaque binary payloads + typed
metadata, with decode/feature-extraction as Arrow-batched pandas UDFs.

The container has no image/audio codec libraries, so the "real" decode
is a self-contained struct-unpack codec: payload bytes are parsed as
little-endian unsigned 16-bit samples (the 16-bit PCM layout) and
summarized into deterministic sample-domain features — a genuine
decode step (bytes -> typed samples -> features) with no external
deps, replayable byte-for-byte by the DuckDB oracle via read_blob hex
arithmetic. ``impl="fake"`` keeps the original bytes-level summary
through the exact same Spark plumbing (mapInPandas over binary
columns, Arrow batches, explicit schema).

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

    impl="real" runs the PCM16 struct-unpack codec (bytes -> uint16
    samples -> sample-domain features); impl="fake" runs the original
    bytes-level summary through identical plumbing.
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

        def real(payload: bytes) -> list[float]:
            # struct-unpack decode: little-endian uint16 samples, a
            # trailing odd byte is ignored (truncated frame)
            import numpy as np

            v = np.frombuffer(
                bytes(payload)[: len(payload) // 2 * 2], dtype="<u2"
            ).astype("int64")
            if v.size == 0:
                return [0.0] * dim
            return [
                float(v.size),
                float(v[0]),
                float(v[-1]),
                float(int(v.sum()) % 99991),
                float(v.max()),
                float(v.min()),
                float(len(np.unique(v))),
                float(int((v * v).sum()) % 99991),
            ]

        decode = real if use_real else fake
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len),
                    "features": pdf["payload"].map(decode),
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(extract, schema=FEATURES_SCHEMA)


PCM16_SCHEMA = (
    "file STRING, n_samples BIGINT, peak BIGINT, energy BIGINT, mean_ampl DOUBLE"
)


def decode_pcm16(files: DataFrame) -> DataFrame:
    """Per-file PCM16 decode: (file, content: binary) -> sample stats.

    The codec parses each payload as little-endian unsigned 16-bit
    samples and emits exact-integer sample statistics plus the
    floor-rounded mean — every output is engine-portable, so the
    DuckDB oracle replays the decode from read_blob hex arithmetic.
    """

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            rows = []
            for file, content in zip(pdf["file"], pdf["content"]):
                b = bytes(content)
                v = np.frombuffer(b[: len(b) // 2 * 2], dtype="<u2").astype("int64")
                n = int(v.size)
                if n == 0:
                    rows.append((file, 0, 0, 0, 0.0))
                    continue
                mean = float(int(v.sum())) / n
                rows.append(
                    (
                        file,
                        n,
                        int(v.max()),
                        int((v * v).sum()),
                        math.floor(mean * 10_000 + 0.5) / 10_000,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["file", "n_samples", "peak", "energy", "mean_ampl"]
            )

    return files.select("file", "content").mapInPandas(dec, schema=PCM16_SCHEMA)
