"""Semantics tests for relational ops that can't be fully oracle-checked:
approx sketches (accuracy bounds) and the as-of join on a constructed
fixture with known answers."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.operators.asof import asof_join
from facebook_ad_library_data_pipeline_spark.registry import load_all

REGISTRY = load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = REGISTRY["q_approx_distinct"].fn(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.exact
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("exact")).collect()
    }
    assert {r.l_returnflag for r in rows} == set(exact)
    for r in rows:
        assert r.exact_parts == exact[r.l_returnflag]
        assert r.approx_ok, (r.l_returnflag, r.exact_parts)


def test_percentiles_within_rank_tolerance(spark, sf_dir):
    rows = REGISTRY["q_percentiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p25_ok and r.p50_ok and r.p75_ok, r


def test_asof_join_fixture(spark):
    orders = spark.createDataFrame(
        [
            (7, datetime(2024, 1, 10), 100),
            (7, datetime(2024, 1, 20), 101),
            (7, datetime(2024, 1, 20), 102),  # same-date tie → max key wins
            (8, datetime(2024, 2, 1), 200),
        ],
        "user_id long, o_orderdate timestamp, o_orderkey long",
    )
    events = spark.createDataFrame(
        [
            (1, 7, datetime(2024, 1, 5)),   # before any order → null
            (2, 7, datetime(2024, 1, 10)),  # exactly at order date → inclusive
            (3, 7, datetime(2024, 1, 25)),  # after the tie pair → key 102
            (4, 8, datetime(2024, 3, 1)),
            (5, 9, datetime(2024, 3, 1)),   # user with no orders → null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = asof_join(
        probe=events, build=orders, key="user_id",
        probe_time="ts", build_time="o_orderdate",
        build_payload=["o_orderdate", "o_orderkey"],
    )
    got = {r.event_id: r.asof_o_orderkey for r in out.collect()}
    assert got == {1: None, 2: 100, 3: 102, 4: 200, 5: None}


def test_asof_payload_carried_atomically(spark):
    """The matched build row must be carried WHOLE: a NULL payload
    column in the newest matching build row stays NULL — it must not be
    backfilled from an older build row (per-column last(ignorenulls)
    did exactly that; fixed with a struct carry)."""
    build = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), 10, "old-note"),
            (1, datetime(2024, 2, 1), 20, None),  # newest: note is NULL
        ],
        "user_id long, o_orderdate timestamp, o_orderkey long, note string",
    )
    probe = spark.createDataFrame(
        [(1, 1, datetime(2024, 3, 1))], "event_id long, user_id long, ts timestamp"
    )
    r = asof_join(
        probe=probe, build=build, key="user_id", probe_time="ts",
        build_time="o_orderdate", build_payload=["o_orderkey", "note"],
    ).collect()[0]
    assert r.asof_o_orderkey == 20
    assert r.asof_note is None, "note backfilled from an older build row"
