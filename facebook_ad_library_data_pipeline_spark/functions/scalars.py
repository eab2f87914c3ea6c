"""Scalar function pack — string + date/time expressions, all JVM-side
built-ins (whole-stage codegen; SURVEY.md §2.B "Scalar fns").

The reference's scalar surface is concat / epoch→ts / divide / round /
cast (R2-R6, covered in operators/report.py); this module adds the
general-purpose pack the north star asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_STRING_ORACLE = r"""
SELECT p_partkey,
       lower(p_name)                                   AS name_lower,
       upper(p_brand)                                  AS brand_upper,
       length(p_name)                                  AS name_len,
       substring(p_name, 1, 5)                         AS name_prefix,
       CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
       len(string_split(p_name, ' '))                  AS n_words,
       replace(p_name, ' ', '_')                       AS name_snake,
       concat_ws('|', p_brand, p_type)                 AS brand_type,
       CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END AS starts_small,
       CASE WHEN p_name LIKE '%bolt' THEN 1 ELSE 0 END  AS ends_bolt
FROM part
"""


@query("q_string_pack", oracle=_STRING_ORACLE, tags=("scalar", "string"))
def q_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/length/substring/regexp_extract/split/replace/
    concat_ws/like — all codegen'd, no Python."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").startswith("small"), 1).otherwise(0).alias("starts_small"),
        F.when(F.col("p_name").endswith("bolt"), 1).otherwise(0).alias("ends_bolt"),
    )


_DATE_ORACLE = """
SELECT o_orderkey,
       o_orderdate,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(year(o_orderdate) AS INT)                   AS order_year,
       CAST(month(o_orderdate) AS INT)                  AS order_mon,
       CAST(day(o_orderdate) AS INT)                    AS order_day,
       CAST(quarter(o_orderdate) AS INT)                AS order_qtr,
       datediff('day', DATE '1995-01-01', o_orderdate)  AS days_since_epoch0,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)      AS plus_3_months
FROM orders
"""


@query("q_date_pack", oracle=_DATE_ORACLE, tags=("scalar", "date"))
def q_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/year/month/day/quarter/datediff/last_day/add_months.

    Orderdates are midnight-aligned so day arithmetic is exact; both
    engines clamp month-end on add-months."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_mon"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_qtr"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch0"
        ),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3_months"),
    )


_COND_ORACLE = """
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_bucket,
       greatest(c_acctbal, 0.0)                              AS bal_floor,
       least(c_acctbal, 5000.0)                              AS bal_cap,
       CASE WHEN c_acctbal IS NULL THEN 'missing'
            WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END                                  AS bal_class,
       abs(c_acctbal - 5000.0)                               AS dist_from_5k,
       CAST(floor(c_acctbal / 1000) AS BIGINT)               AS bal_bucket_k
FROM customer
"""


@query("q_conditional_pack", oracle=_COND_ORACLE, tags=("scalar",))
def q_conditional_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/greatest/least/case/abs/floor — null-handling
    and arithmetic scalars."""
    c = load_table(spark, sf_dir, "customer")
    bal_class = (
        F.when(F.col("c_acctbal").isNull(), "missing")
        .when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_bucket"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor"),
        F.least("c_acctbal", F.lit(5000.0)).alias("bal_cap"),
        bal_class.alias("bal_class"),
        F.abs(F.col("c_acctbal") - 5000.0).alias("dist_from_5k"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket_k"),
    )
