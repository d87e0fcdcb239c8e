"""Keyed MERGE / CDC-apply (SURVEY.md L9): apply an
insert/update/delete change set to a base table — MERGE INTO
semantics for the plain-parquet tables that don't have a lakehouse
transaction log.

Delta/Iceberg expose this as ``MERGE INTO``; at the engine level it is
exactly ONE full-outer key-equi join between the base and the change
set, with a per-column post-image/pre-image choice — no windows, no
second shuffle. That is the plan this operator builds, so it scales
the way the diff that produced the change set does (both sides
hash-partitioned on the key once).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGE_OPS = ("insert", "update", "delete")


def merge_into(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply ``changes`` to ``base`` and return the merged table.

    ``changes`` carries the key columns, an ``op_col`` in
    {'insert', 'update', 'delete'}, and the full POST-IMAGE of every
    non-key base column for insert/update rows (delete rows may leave
    them null). At most one change row per key (the CDC-compaction
    contract; a multi-row feed must be collapsed to final images
    first — deterministic conflict rule = last image wins upstream).

    Semantics (upsert-tolerant, deterministic):
      - key in base, no change row        -> base row unchanged
      - key in base, op = 'update'        -> post-image row
      - key in base, op = 'delete'        -> dropped
      - key not in base, op = 'insert'    -> post-image row
      - key not in base, op = 'update'    -> post-image row (upsert)
      - key not in base, op = 'delete'    -> no-op

    Plan: one full-outer shuffle join on the key; every column choice
    is a codegen'd CASE on the op — the change set is usually a small
    fraction of the base, so AQE broadcast-joins it when it measures
    small."""
    payload = [c for c in base.columns if c not in keys]
    missing = [c for c in payload if c not in changes.columns]
    if missing:
        raise ValueError(f"changes lacks post-image columns {missing}")
    b = base.select(
        *keys,
        F.lit(True).alias("__b_present"),
        *[F.col(c).alias(f"__b_{c}") for c in payload],
    )
    # loud-failure guard (ADVICE r9): a misspelled or null op would
    # otherwise be silently treated as keep-base / discarded — a
    # malformed CDC feed must fail the job, not merge wrong
    op_ok = F.col(op_col).isin(*MERGE_OPS)
    op_checked = F.when(op_ok, F.col(op_col)).otherwise(
        F.raise_error(
            F.format_string(
                "merge_into: op %s not in %s",
                F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
                F.lit(str(MERGE_OPS)),
            )
        )
    )
    c = changes.select(
        *keys,
        op_checked.alias("__op"),
        *[F.col(col).alias(f"__c_{col}") for col in payload],
    )
    joined = b.join(c, list(keys), "full_outer")
    keep = F.col("__op").isNull() | (F.col("__op") != "delete")
    # a delete (or a null-op change row) for an absent key is a no-op,
    # not a resurrected null row: the presence sentinel survives the
    # full-outer join as null exactly on change-side-only rows
    present = F.col("__op").isin("insert", "update") | F.col(
        "__b_present"
    ).isNotNull()
    out_cols = [
        F.when(F.col("__op").isin("insert", "update"), F.col(f"__c_{p}"))
        .otherwise(F.col(f"__b_{p}"))
        .alias(p)
        for p in payload
    ]
    return joined.filter(keep & present).select(*keys, *out_cols)
