"""UDF-surface queries (SURVEY.md §2.10 U4/U5): pandas UDAF and Python
UDTF, plus a JSON source roundtrip — the remaining API surface rows.

UDF bodies are defined inside the query functions so cloudpickle
serializes them by value (no module import on workers — see
functions/udfs.py leaf-module rule).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import round_agg, round_sql
from .registry import register


@register(
    "q_udaf_grouped",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {round_sql('sum(l_extendedprice * l_quantity) / sum(l_quantity)')}
               AS weighted_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate via pandas GROUPED_AGG (U4): quantity-
    weighted average price per group. Arrow-vectorized — the UDAF path
    that scales (one batch per group partition, no per-row Python)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_price(price: pd.Series, qty: pd.Series) -> float:
        import math

        v = float((price * qty).sum() / qty.sum())
        return math.floor(v * 10000 + 0.5) / 10000

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        weighted_price("l_extendedprice", "l_quantity").alias("weighted_price")
    )


@register(
    "q_udtf_explode",
    oracle="""
    SELECT doc_id, CAST(ord - 1 AS INT) AS pos, tok
    FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
        FROM documents
    ) t
    WHERE ord <= 5
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined table function (U5): one row in -> up to 5 (pos,
    tok) rows out — the 1->n shape of the reference's aligner (SAM
    records per read, SURVEY.md U1/U5)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, tok STRING")
    class HeadTokens:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            for pos, tok in enumerate(text.split(" ")[:5]):
                yield pos, tok

    spark.udtf.register("head_tokens", HeadTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.tok
        FROM documents_v d, LATERAL head_tokens(d.doc_id, d.text) t
        """
    )


@register(
    "q_scan_json",
    oracle=f"""
    SELECT event_type, count(*) AS n, {round_sql('sum(value)')} AS total
    FROM events
    GROUP BY event_type
    """,
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source with explicit schema (no inference): events projected
    to JSON lines, read back, aggregated — schema-on-read for the
    semi-structured path (SURVEY.md §1.3)."""
    out = os.path.join(tempfile.gettempdir(), f"events_json_{uuid.uuid4().hex[:8]}")
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    e.write.mode("overwrite").json(out)
    back = spark.read.schema("event_id BIGINT, event_type STRING, value DOUBLE").json(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        round_agg(F.sum("value")).alias("total"),
    )
