"""Property-based cross-engine guarantees for the portable primitives
(functions/portable.py): whatever data flows through, Spark and DuckDB
must produce bit-identical values — these are the axioms the whole
oracle-parity scheme rests on."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_pipeline_spark.functions.portable import (
    hash56_sql_duckdb,
    hash56_sql_spark,
    round_sql,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


def _spark_vals(spark, pdf, expr_sql, col="v"):
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("prop_t")
    return [r.out for r in spark.sql(f"SELECT {expr_sql} AS out FROM prop_t").collect()]


def _duck_vals(pdf, expr_sql):
    con = duckdb.connect()
    con.register("prop_t", pdf)
    return [r[0] for r in con.execute(f"SELECT {expr_sql} AS out FROM prop_t").fetchall()]


@SETTINGS
@given(st.lists(finite_doubles, min_size=1, max_size=50))
def test_portable_round_bit_identical(spark, xs):
    pdf = pd.DataFrame({"v": pd.Series(xs, dtype="float64")})
    s = _spark_vals(spark, pdf, round_sql("v"))
    d = _duck_vals(pdf, round_sql("v"))
    assert s == d


@SETTINGS
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=30,
    )
)
def test_hash56_bit_identical(spark, texts):
    pdf = pd.DataFrame({"v": pd.Series(texts, dtype="object")})
    s = _spark_vals(spark, pdf, hash56_sql_spark("v"))
    d = _duck_vals(pdf, hash56_sql_duckdb("v"))
    assert s == d
    assert all(0 <= h < 2**56 for h in s)


@SETTINGS
@given(
    st.lists(
        st.integers(min_value=0, max_value=4_000_000_000),  # epoch seconds to y2096
        min_size=1,
        max_size=30,
    ),
    st.lists(st.integers(min_value=0, max_value=999_999), min_size=1, max_size=30),
)
def test_epoch_seconds_bit_identical(spark, secs, micros):
    n = min(len(secs), len(micros))
    ts = pd.Series(
        [
            pd.Timestamp(s, unit="s") + pd.Timedelta(microseconds=u)
            for s, u in zip(secs[:n], micros[:n])
        ]
    ).astype("datetime64[us]")
    pdf = pd.DataFrame({"v": ts})
    s = _spark_vals(spark, pdf, "CAST(unix_timestamp(v) AS BIGINT)")
    d = _duck_vals(pdf, "CAST(floor(epoch(v)) AS BIGINT)")
    assert s == d


def test_affine_minhash_no_overflow(spark):
    """The MinHash affine transform must stay inside int64 for every
    reachable x (x < 2^31, a < 2^20) — checked at the boundary."""
    from flink_pipeline_spark.functions.text import MINHASH_PARAMS, P31

    x_max = P31 - 1
    for a, b in MINHASH_PARAMS:
        assert a * x_max + b < 2**63
        assert a < 2**20 and b < P31


# round-3 additions: the Column-API twins of the SQL-text generators,
# plus boundary ties pinned explicitly (exact .5 multiples of 10^-4
# are where engine round() implementations disagree).

boundary_doubles = st.one_of(
    finite_doubles,
    st.integers(min_value=-10**6, max_value=10**6).map(lambda n: n / 10**4 + 5e-5),
)


@SETTINGS
@given(st.lists(boundary_doubles, min_size=1, max_size=50))
def test_round_agg_column_matches_duckdb(spark, xs):
    from pyspark.sql import functions as F

    from flink_pipeline_spark.functions.portable import round_agg

    pdf = pd.DataFrame({"v": pd.Series(xs, dtype="float64")})
    sdf = spark.createDataFrame(pdf)
    s = [r.out for r in sdf.select(round_agg(F.col("v")).alias("out")).collect()]
    d = _duck_vals(pdf, round_sql("v"))
    assert s == d


def test_round_ties_go_up_both_engines(spark):
    """floor(x*10^4 + 0.5)/10^4 rounds exact ties toward +inf —
    including for negatives — on both engines; pinned so a future
    'fix' to banker's rounding cannot slip in silently."""
    vals = [0.00005, 0.12345, -0.00005, 1.99995, -1.99995]
    pdf = pd.DataFrame({"v": pd.Series(vals, dtype="float64")})
    s = _spark_vals(spark, pdf, round_sql("v"))
    d = _duck_vals(pdf, round_sql("v"))
    assert s == d


@SETTINGS
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
            max_size=40,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_hash56_column_matches_duckdb(spark, texts):
    from flink_pipeline_spark.functions.portable import hash56

    pdf = pd.DataFrame({"v": pd.Series(texts, dtype="object")})
    sdf = spark.createDataFrame(pdf)
    s = [r.out for r in sdf.select(hash56("v").alias("out")).collect()]
    d = _duck_vals(pdf, hash56_sql_duckdb("v"))
    assert s == d


@given(
    xs=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=0.0, max_value=1e7),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_money_sum_bit_identical(spark, xs):
    """money_sum (Spark) == money_sum_sql (DuckDB) for ANY finite
    non-negative money-like values and ANY row order — the integer-
    cents sum is exactly associative, so unlike a rounded float sum
    there is no permutation or scale at which the engines can
    disagree."""
    import random

    from flink_pipeline_spark.functions.portable import money_sum_sql

    pdf = pd.DataFrame({"v": xs})
    got_spark = _spark_vals(spark, pdf, money_sum_sql("v"))
    shuffled = xs[:]
    random.Random(7).shuffle(shuffled)
    got_duck = _duck_vals(pd.DataFrame({"v": shuffled}), money_sum_sql("v"))
    assert got_spark == got_duck
