"""Property-based cross-engine tests for the portable-expression
conventions (functions/portable.py) that every oracle check rests on.

Strategy: hypothesis generates adversarial values (doubles near
rounding boundaries, strings with unicode/quotes/whitespace,
timestamps), a SINGLE Spark job evaluates the Spark-side expression
over all of them, DuckDB evaluates the oracle-side text over the same
values, and the results must agree exactly. If any of these properties
break, hash gates across the whole registry break with them — this
pins the convention, not one query.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from flink_pipeline_spark.functions.portable import (
    ROUND_SCALE,
    hash56,
    hash56_sql_duckdb,
    round_agg,
    round_sql,
)

# a few batched example sets per property: hypothesis drives the
# VALUES, one Spark job per example keeps runtime sane
N_EXAMPLES = 3


def _spark_eval_doubles(spark, vals, col_fn):
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    return [r.y for r in df.select(col_fn(F.col("x")).alias("y")).collect()]


def _spark_eval_strings(spark, vals, col_fn):
    df = spark.createDataFrame([(v,) for v in vals], "x STRING")
    return [r.y for r in df.select(col_fn(F.col("x")).alias("y")).collect()]


# doubles across magnitudes, including exact .5-boundary multiples of
# 10^-scale where naive round() implementations disagree
_doubles = st.one_of(
    st.floats(
        min_value=-1e9,
        max_value=1e9,
        allow_nan=False,
        allow_infinity=False,
    ),
    st.integers(min_value=-10**6, max_value=10**6).map(
        lambda n: n / 10**ROUND_SCALE + 5 / 10 ** (ROUND_SCALE + 1)
    ),
)

_strings = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates
        max_codepoint=0x2FFF,
    ),
    max_size=40,
)


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(_doubles, min_size=1, max_size=300))
def test_round_agg_matches_duckdb(spark, vals):
    got_spark = _spark_eval_doubles(spark, vals, round_agg)
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {round_sql('?::DOUBLE')}", [v]).fetchone()[0]
        for v in vals
    ]
    assert got_spark == got_duck


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(_strings, min_size=1, max_size=300))
def test_hash56_matches_duckdb(spark, vals):
    got_spark = _spark_eval_strings(spark, vals, hash56)
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {hash56_sql_duckdb('?')}", [v]).fetchone()[0]
        for v in vals
    ]
    assert got_spark == got_duck
    # and the range contract: 56 bits, non-negative, inside i64
    assert all(0 <= h < 2**56 for h in got_spark)


def test_round_agg_is_half_up_at_boundary(spark):
    """The convention is floor(x*10^s + 0.5)/10^s — exact .00005-style
    boundaries round UP (toward +inf), including for negatives, on both
    engines; this is the documented tie behavior, pinned."""
    vals = [0.00005, 0.12345, -0.00005, 1.99995, -1.99995]
    got = _spark_eval_doubles(spark, vals, round_agg)
    con = duckdb.connect()
    duck = [
        con.execute(f"SELECT {round_sql('?::DOUBLE')}", [v]).fetchone()[0]
        for v in vals
    ]
    assert got == duck
