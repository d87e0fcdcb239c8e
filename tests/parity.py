"""Spark <-> DuckDB result comparison, mirroring the driver's
row-count + schema + order-insensitive value-hash gate.

The check is EXACT (bit-identical after canonicalization): the
driver hashes values, so "close enough" floats are still failures.
Queries must follow the portability conventions (round doubles,
epoch-seconds timestamps) to pass.
"""

from __future__ import annotations

import datetime
from collections import Counter


class RawCollectionCell(TypeError):
    """A result cell is a raw array/map — the driver's canonicalizer
    pandas-sorts result columns and dies on unhashable cells
    (``TypeError: unhashable type: 'list'``), so local parity REJECTS
    them instead of quietly tuple-izing (which is how a driver-only
    failure survived rounds 3-4). Emit ``F.array_join`` strings (the
    q_group_collect convention) or long-format scalar rows instead."""


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("ts", str(v))
    if isinstance(v, (list, dict, set)):
        raise RawCollectionCell(
            f"raw {type(v).__name__} cell {v!r}: the driver canonicalizer "
            "cannot hash array/map cells — use array_join (q_group_collect "
            "convention) or long-format scalar rows"
        )
    # Spark struct cells arrive as Row (a tuple subclass) — hashable, so
    # the driver's pandas canonicalizer accepts them. DuckDB struct
    # cells arrive as dict and hit the rejection above — which mirrors
    # the driver, whose canonicalizer dies on dicts the same way. The
    # asymmetry is the engines', not ours: a struct-emitting query can
    # never pass the cross-engine gate, so emit scalar columns instead.
    if isinstance(v, tuple):
        return ("struct", tuple(_canon(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    return str(v)


def rows_from_spark(df):
    cols = sorted(df.columns)
    data = [tuple(_canon(r[c]) for c in cols) for r in df.collect()]
    return cols, data


def rows_from_duckdb(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(_canon(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(cols), data


def assert_parity(spark_df, con, sql, name=""):
    s_cols, s_rows = rows_from_spark(spark_df)
    d_cols, d_rows = rows_from_duckdb(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}\n"
        f"spark head: {s_rows[:3]}\nduckdb head: {d_rows[:3]}"
    )
    sc, dc = Counter(s_rows), Counter(d_rows)
    if sc != dc:
        only_spark = list((sc - dc).elements())[:5]
        only_duck = list((dc - sc).elements())[:5]
        raise AssertionError(
            f"{name}: value mismatch ({len(list((sc - dc).elements()))} rows differ)\n"
            f"  only in spark: {only_spark}\n  only in duckdb: {only_duck}"
        )
