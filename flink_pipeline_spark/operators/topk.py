"""Global top-k with an attached rank column, without a global window.

The reference's ranked-report queries (top revenue orders, top
customers, top tokens) need (row, rank) output. The naive Spark plan —
``row_number() OVER (ORDER BY ...)`` then ``rank <= k`` — moves the
ENTIRE input through one WindowExec task (Spark itself warns "No
Partition Defined ... Moving all data to a single partition"), a
straggler/OOM cliff when the pre-rank cardinality grows with the data.

Scale shape used here instead:
  1. ``orderBy(...).limit(k)`` — planned as TakeOrderedAndProject:
     every partition keeps its local top-k, the tiny per-partition
     winners merge once. Nothing global ever materializes.
  2. rank attachment over the <= k survivors via one single-row
     ``collect_list`` aggregate, sorted in-array and posexploded —
     O(k) rows in one task by construction, no WindowExec at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rank_after_topk(df: DataFrame, k: int, desc_num: str, asc_key: str) -> DataFrame:
    """Return ``df``'s top ``k`` rows by (``desc_num`` DESC, ``asc_key``
    ASC) with a 1-based ``rank`` column appended.

    ``desc_num`` must be numeric (negated to express DESC inside the
    ascending ``sort_array``) and ``asc_key`` a unique tie-break, so
    the in-array order equals the orderBy order."""
    cols = list(df.columns)
    top = df.orderBy(F.col(desc_num).desc(), F.col(asc_key)).limit(k)
    sort_key: list[Column] = [
        (-F.col(desc_num)).alias("_neg"),
        F.col(asc_key).alias("_key"),
        F.struct(*[F.col(c).alias(c) for c in cols]).alias("_row"),
    ]
    return (
        top.agg(F.sort_array(F.collect_list(F.struct(*sort_key))).alias("_a"))
        .select(F.posexplode("_a").alias("_pos", "_r"))
        .select(
            *[F.col(f"_r._row.{c}").alias(c) for c in cols],
            (F.col("_pos") + 1).alias("rank"),
        )
    )
