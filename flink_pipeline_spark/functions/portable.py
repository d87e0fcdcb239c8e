"""Cross-engine (Spark <-> DuckDB) portable expression helpers.

The driver's correctness gate hashes query output values, so every
computed value must be bit-identical between the Spark implementation
and the DuckDB oracle. These helpers encode the conventions:

  * hash56: a deterministic 56-bit integer hash of a string, computed
    as the first 14 hex digits of md5 — both engines have md5, both
    can parse hex into a BIGINT, and 56 bits stays well inside i64.
    This single primitive powers fingerprinting, MinHash, SimHash and
    banding identically in both engines.
  * round for double aggregates: floating aggregation order differs
    between engines (and between Spark partitions run-to-run), so any
    sum/avg of doubles is rounded to ROUND_SCALE decimals before
    leaving a query.
  * epoch seconds for timestamps: fixtures mix ms- and ns-precision
    timestamps (FIXTURES.md); Spark truncates ns->us on read, so raw
    timestamps never leave a query — they are projected to BIGINT
    epoch seconds (or DATE strings) in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROUND_SCALE = 4
HASH56_HEX_DIGITS = 14  # 14 hex digits = 56 bits < 63

# ---------------------------------------------------------------------------
# Spark side (Column helpers)
# ---------------------------------------------------------------------------


def hash56(col: Column | str) -> Column:
    """56-bit md5-prefix hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, HASH56_HEX_DIGITS), 16, 10).cast(
        "long"
    )


def round_agg(col: Column, scale: int = ROUND_SCALE) -> Column:
    """Canonical rounding for double-valued aggregates.

    NOT ``F.round``: Spark rounds the shortest decimal repr (BigDecimal
    HALF_UP) while DuckDB rounds the binary value, so the two disagree
    on ~1% of values in the 4th decimal. ``floor(x*10^s + 0.5)/10^s``
    is pure IEEE double arithmetic — bit-identical across engines.

    Transcendental caveat: when the expression inside contains ln/log
    (surprisal, BM25, DSIR), the INPUT to the round is only
    ulp-reproducible, not bit-identical — JVM ``Math.log`` and DuckDB's
    libm may differ in the last bit, which flips the floor iff
    ``x*10^s`` lands within ~1 ulp of an integer. Probability per value
    is ~1e-12; the convention accepts that residual risk (documented
    here so a future flake is diagnosable) rather than coarsening every
    log-derived gate. Pure +,-,*,/,sqrt pipelines are exempt: those ops
    are IEEE correctly-rounded and deterministic in both engines.
    """
    f = 10**scale
    return F.floor(col * F.lit(f) + F.lit(0.5)) / F.lit(f)


def money_sum(col: Column) -> Column:
    """Exact money TOTAL: per-row floor-round to integer cents, exact
    BIGINT sum, presented as dollars (sum_cents / 100.0).

    Replaces ``round_agg(F.sum(x), scale=2)`` for large totals: a
    double sum's order-dependent error grows ~sqrt(n), so at a big
    enough SF the 2nd decimal flips between engines just as the 4th
    did at sf0.1 (ADVICE r6). Integer cents removes the hazard class:
    the per-row quantization is deterministic IEEE (mul + floor), the
    BIGINT sum is exactly associative, and the final /100.0 is one
    deterministic division. Sub-cent parts of derived prices (e.g.
    price*(1-disc) has 4 decimals) round per row — fixed-point
    accounting semantics, mirrored verbatim in every oracle via
    ``money_sum_sql``. Headroom: ~8e11 rows x ~5e6 cents stays under
    i64; beyond that promote the sum to DECIMAL(38,0) in both engines.

    Semantics caveat (ADVICE r7): this is sum-of-rounded-cents, NOT
    the TPC-H-style round(sum(x), 2). For 4-decimal derived prices
    (price*(1-disc), *(1+tax)) the total can drift up to 0.005/row
    from the exact sum — both engines here agree bit-for-bit with
    each other, but comparing bench results against an EXTERNAL
    reference answer set requires accounting for that deviation.
    """
    cents = F.floor(col * F.lit(100) + F.lit(0.5)).cast("long")
    return F.sum(cents) / F.lit(100.0)


def money_sum_sql(expr: str) -> str:
    """DuckDB/Spark-SQL text twin of ``money_sum``. The divisor is an
    explicit CAST(... AS DOUBLE), not the literal ``100.0``: Spark SQL
    types a decimal literal as DECIMAL(4,1) (BIGINT / DECIMAL ->
    DECIMAL cells) while DuckDB types it DOUBLE — the property test
    test_money_sum_bit_identical runs this text in BOTH engines and
    caught exactly that divergence."""
    return (
        f"sum(CAST(floor(({expr}) * 100 + 0.5) AS BIGINT))"
        " / CAST(100 AS DOUBLE)"
    )


def epoch_s(col: Column | str) -> Column:
    """Timestamp -> BIGINT epoch seconds (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c).cast("long")


# ---------------------------------------------------------------------------
# SQL-text generators (used to build both Spark SQL and DuckDB oracle text)
# ---------------------------------------------------------------------------


def hash56_sql_spark(expr: str) -> str:
    return f"CAST(conv(substring(md5(CAST({expr} AS STRING)), 1, {HASH56_HEX_DIGITS}), 16, 10) AS BIGINT)"


def hash56_sql_duckdb(expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {HASH56_HEX_DIGITS})) AS BIGINT)"
    )


def epoch_s_sql_duckdb(expr: str) -> str:
    # floor() first: duckdb epoch() returns a fractional double and a bare
    # BIGINT cast *rounds*, while Spark's unix_timestamp truncates.
    return f"CAST(floor(epoch({expr})) AS BIGINT)"


def round_sql(expr: str, scale: int = ROUND_SCALE) -> str:
    """Portable-round SQL text (valid in both Spark SQL and DuckDB)."""
    f = 10**scale
    return f"floor(({expr}) * {f} + 0.5) / {f}"
