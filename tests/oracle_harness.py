"""Local twin of the driver's DuckDB-oracle compare.

Runs a registered Spark query and its oracle SQL side-by-side and
asserts row-count, column-name-set, and order-insensitive value
equality (columns sorted by name, rows sorted lexicographically,
floats rounded before compare — mirrors the driver's hash compare
closely enough to catch alias/semantic drift before the real gate).
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, Decimal):
        # A DECIMAL-typed oracle column must never silently compare
        # equal to a Spark double: the driver formats floats %.6g
        # ("0") and Decimals via str ("0.0"), so a DECIMAL/DOUBLE type
        # split that stringifies alike here would still hash-mismatch
        # at the gate (caught live r06: a bare 0.2 in a VALUES oracle).
        # Tag the type so the local sweep fails first.
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Full shortest-round-trip precision (repr). Round 1 lesson: a
        # %.6g compare passed q_join_multiway locally while the driver's
        # exact hash failed it on 1-cent double-sum-order diffs — the
        # local sweep must be at least as strict as the driver.
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df: DataFrame, oracle: str, duck: duckdb.DuckDBPyConnection):
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    rel = duck.sql(oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = _normalize(spark_rows, [c.lower() for c in spark_cols])
    nd = _normalize(duck_rows, [c.lower() for c in duck_cols])
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[0]}"
