"""Order-independent money aggregation.

``round(sum(double), 2)`` is sensitive to summation order: across
thousands of groups some group's sum lands within one ulp of a
half-cent boundary, and Spark and DuckDB (different partial-sum orders)
round it to different cents. That was the round-1 driver failure of
``q_join_multiway`` — 4 of 2,409 groups off by exactly $0.01.

Fix: cast each addend to ``DECIMAL(18,6)`` *before* the sum. The
per-row double product is IEEE-identical on both engines; the decimal
cast is a deterministic rounding of that identical double; and decimal
addition is exact, hence order-independent. Rounding the exact decimal
sum and casting back to double is then bit-identical across engines
(a 2-dp decimal converts to one unique nearest double).

At 100 TB this costs one widening per row inside a codegen'd hash
aggregate — no extra shuffle, no extra pass; partial (map-side) combine
still applies because decimal sum is algebraic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL_T = "decimal(18,6)"


def money_sum(expr: Column, scale: int = 2) -> Column:
    """Exact-decimal sum of a double expression, rounded to ``scale``
    and returned as double (matching :func:`money_sum_sql`)."""
    return F.round(F.sum(expr.cast(DECIMAL_T)), scale).cast("double")


def dec_sum(expr: Column) -> Column:
    """Unrounded exact-decimal sum (for ratios: cast to double AFTER the
    sum, then divide — division of identical doubles is deterministic)."""
    return F.sum(expr.cast(DECIMAL_T))


def det_round(expr: Column, scale: int) -> Column:
    """Cross-engine-deterministic half-up rounding of a double RATIO:
    ``floor(x*10^s + 0.5)/10^s`` uses only IEEE ops, so two engines
    holding the bit-identical input double always round the same way.
    ``round(double)`` does not give that guarantee — Spark rounds the
    shortest decimal repr (HALF_UP) while DuckDB rounds in scaled
    floating point, and inputs within one ulp of a half boundary can
    flip differently (ADVICE r02 residual on Q8/Q14/Q17). Positive
    inputs only (ratios/percentages); pair with :func:`det_round_sql`."""
    p = float(10**scale)
    return F.floor(expr * p + F.lit(0.5)) / p


def det_round_sql(expr_sql: str, scale: int) -> str:
    """SQL twin of :func:`det_round` (same text valid on both engines)."""
    p = 10**scale
    return f"floor(({expr_sql}) * {p} + 0.5) / {p}"


def money_sum_sql(expr_sql: str, scale: int = 2) -> str:
    """DuckDB/Spark-SQL twin of :func:`money_sum` (same text runs on both)."""
    return f"CAST(round(sum(CAST({expr_sql} AS DECIMAL(18,6))), {scale}) AS DOUBLE)"


def dec_sum_sql(expr_sql: str) -> str:
    """SQL twin of :func:`dec_sum`, cast to double for deterministic ratios."""
    return f"CAST(sum(CAST({expr_sql} AS DECIMAL(18,6))) AS DOUBLE)"
