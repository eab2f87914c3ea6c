"""Shared int64-overflow guards for exact-integer statistics.

q_drift_ks multiplies cumulative counts n1·n2 and q_label_agreement
squares the corpus total N² — both wrap silently in non-ANSI Spark
past ~3e9·3e9 where DuckDB's HUGEINT keeps going, so the engine
pins a HARD contract: fail loudly at the bound instead of diverging.
Both call sites now share the ONE guard definition below so the
firing unit test (tests/test_drift_kmeans.py) covers each.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT64_MAX = 2**63 - 1


def guard_product_int64(keep: str, a: str, b: str, message: str) -> Column:
    """Pass through column ``keep`` when ``a * b`` fits in int64;
    otherwise ``raise_error(message)``.

    The bound check itself is exact integer arithmetic
    (``a <= MAX_INT64 div b``), and ``greatest(b, 1)`` makes a zero
    ``b`` yield the MAX bound (every ``a`` passes) — no reliance on
    boolean short-circuit evaluation surviving optimizer rewrites
    under ANSI mode (r14 ADVICE). Callers must coalesce aggregate
    sums to 0 BEFORE the guard: a NULL operand turns the WHEN
    predicate NULL and misfires the raise on degenerate inputs (the
    q_drift_ks / q_label_agreement empty-input lesson).

    PRECONDITION: ``a`` and ``b`` must be NON-NEGATIVE (they are
    counts at every call site). ``greatest(b, 1)`` maps a negative
    ``b`` to the MAX bound and a negative ``a`` trivially passes the
    ``<=`` check, so a signed product would overflow unchecked — a
    signed call site needs an ``abs()`` variant, not this guard
    (r15 ADVICE).
    """
    return (
        F.when(
            F.col(a) <= F.expr(f"{_INT64_MAX} div greatest({b}, 1)"),
            F.col(keep),
        )
        .otherwise(F.raise_error(message).cast("long"))
        .alias(keep)
    )
