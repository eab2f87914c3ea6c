"""Time-series operators beyond plain windows: resampling with gap
filling (the hypertable-rollup shape) and value-range window frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import DECIMAL_T, money_sum, money_sum_sql
from ..registry import query

_RESAMPLE_ORACLE = """
WITH bounds AS (
    SELECT CAST(to_timestamp(floor(epoch(min(ts)) / 3600) * 3600) AS TIMESTAMP) AS t0,
           CAST(to_timestamp(floor(epoch(max(ts)) / 3600) * 3600) AS TIMESTAMP) AS t1
    FROM events
), grid AS (
    SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket FROM bounds
), agg AS (
    SELECT CAST(to_timestamp(floor(epoch(ts) / 3600) * 3600) AS TIMESTAMP) AS bucket,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
)
SELECT g.bucket,
       coalesce(a.n, 0) AS n,
       coalesce(a.total_value, 0.0) AS total_value
FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket
"""


@query("q_resample_gapfill", oracle=_RESAMPLE_ORACLE, tags=("timeseries", "agg"))
def q_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with EXPLICIT empty buckets: dense time grid
    (sequence+explode over the observed bounds) left-joined to the
    hourly agg. The grid generation is O(#buckets) — driver-free; at
    scale the grid side is tiny and broadcast."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), money_sum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("bucket"), "n", "total_value")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    return (
        grid.join(F.broadcast(hourly), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


_RANGE_FRAME_ORACLE = """
SELECT o_orderkey,
       o_custkey,
       o_totalprice,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_similar_cheaper,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                      OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING), 2)
            AS DOUBLE) AS band_revenue
FROM orders
"""


@query("q_window_range_value", oracle=_RANGE_FRAME_ORACLE, tags=("window", "timeseries"))
def q_window_range_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-range window frames (rangeBetween with a numeric offset):
    peers counted by price proximity, not row position — deterministic
    regardless of shuffle order because the frame is value-defined."""
    o = load_table(spark, sf_dir, "orders")
    w_past = (
        Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-50000, 0)
    )
    w_band = (
        Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-50000, 50000)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w_past).alias("n_similar_cheaper"),
        # Per-ROW window sums are the finest-grained money aggregate in
        # the repo — decimal summation (functions/money.py) or a frame's
        # addition order flips rounded cents between engines.
        F.round(F.sum(F.col("o_totalprice").cast(DECIMAL_T)).over(w_band), 2)
        .cast("double")
        .alias("band_revenue"),
    )


_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, min(ts) AS first_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT v.user_id, v.first_view, min(e.ts) AS first_click
    FROM v LEFT JOIN events e
      ON e.user_id = v.user_id AND e.event_type = 'click' AND e.ts > v.first_view
    GROUP BY v.user_id, v.first_view
), p AS (
    SELECT c.user_id, c.first_view, c.first_click, min(e.ts) AS first_purchase
    FROM c LEFT JOIN events e
      ON e.user_id = c.user_id AND e.event_type = 'purchase'
     AND e.ts > c.first_click
    GROUP BY c.user_id, c.first_view, c.first_click
)
SELECT user_id, first_view, first_click, first_purchase,
       (first_purchase IS NOT NULL) AS completed
FROM p
"""


@query("q_funnel_steps", oracle=_FUNNEL_ORACLE, tags=("timeseries", "funnel", "agg"))
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase, each step
    strictly after the previous): the MATCH_RECOGNIZE-style sequence
    query of event analytics, expressed as a chain of conditional min
    aggregations.

    Scale shape: three hash aggregations + two joins, ALL keyed on
    user_id — one logical partitioning carried through the whole chain
    (AQE reuses the exchange), no window over the raw event stream, no
    per-user sort. The per-step filter (event_type = ...) reaches the
    scan, so each join's stream side is only that step's events."""
    e = load_table(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    step2 = (
        views.join(
            clicks,
            (F.col("user_id") == F.col("c_user")) & (F.col("c_ts") > F.col("first_view")),
            "left",
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("c_ts").alias("first_click"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    step3 = (
        step2.join(
            purchases,
            (F.col("user_id") == F.col("p_user")) & (F.col("p_ts") > F.col("first_click")),
            "left",
        )
        .groupBy("user_id", "first_view", "first_click")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    return step3.select(
        "user_id",
        "first_view",
        "first_click",
        "first_purchase",
        F.col("first_purchase").isNotNull().alias("completed"),
    )


_BOOL_AGG_ORACLE = """
SELECT o_custkey,
       bool_and(o_totalprice > 10000)  AS all_above_10k,
       bool_or(o_orderstatus = 'O')    AS any_open,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses
FROM orders
GROUP BY o_custkey
"""


@query("q_bool_string_aggs", oracle=_BOOL_AGG_ORACLE, tags=("agg",))
def q_bool_string_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or / filtered count / ordered-distinct string
    agg (collect_set is unordered — sort before joining for
    determinism)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.bool_and(F.col("o_totalprice") > 10000).alias("all_above_10k"),
        F.bool_or(F.col("o_orderstatus") == "O").alias("any_open"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias("statuses"),
    )


_ATTRIBUTION_ORACLE = """
WITH marked AS (
    SELECT event_id, user_id, ts, event_type, value,
           last_value(CASE WHEN event_type IN ('view', 'click') THEN ts END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS attrib_ts,
           last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS attrib_type
    FROM events
)
SELECT event_id, user_id, ts AS purchase_ts, value,
       attrib_type, attrib_ts
FROM marked
WHERE event_type = 'purchase'
"""


@query("q_attribution_last_touch", oracle=_ATTRIBUTION_ORACLE, tags=("timeseries", "window"))
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the most
    recent PRECEDING view or click by the same user (NULL when the
    purchase is the user's first touchpoint). One windowed pass —
    `last(..., ignorenulls)` over a rows-frame ending 1 PRECEDING — so
    the plan is a single shuffle+sort on user_id with no join at all;
    the funnel query above is the multi-step sibling, this is the
    marketing-analytics primitive. Deterministic: the frame orders by
    (ts, event_id), and per-user ts uniqueness is pinned by the
    testdata-invariants test."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    marked = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w).alias("attrib_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("attrib_type"),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "value",
        "attrib_type",
        "attrib_ts",
    )


# orderkeys are contiguous in the testdata, so the gap detector runs
# over a DETERMINISTICALLY thinned stream (drop keys ≡ 13 mod 97) —
# the operator then must find exactly those holes.
_GAPS_ORACLE = """
WITH thinned AS (
    SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 13
),
seq AS (
    SELECT o_orderkey,
           lead(o_orderkey) OVER (ORDER BY o_orderkey) AS next_key
    FROM thinned
)
SELECT o_orderkey + 1 AS gap_start,
       next_key - 1 AS gap_end,
       next_key - o_orderkey - 1 AS n_missing
FROM seq
WHERE next_key - o_orderkey > 1
ORDER BY gap_start
"""


@query("q_sequence_gaps", oracle=_GAPS_ORACLE, tags=("timeseries", "window", "quality"))
def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection (missing-id audit): lead() over the key
    order surfaces every hole as (gap_start, gap_end, n_missing) —
    the standard completeness check for ingest pipelines with
    monotonically assigned ids. A single global-ordered window: at
    100 TB you run it per partition-day (gaps cannot span the
    partitioning of an append-only id space) or range-partition the
    key, keeping the same plan shape without a single-reducer sort."""
    o = load_table(spark, sf_dir, "orders")
    thinned = o.filter(F.col("o_orderkey") % 97 != 13).select("o_orderkey")
    w = Window.orderBy("o_orderkey")
    seq = thinned.select(
        "o_orderkey", F.lead("o_orderkey").over(w).alias("next_key")
    )
    return (
        seq.filter(F.col("next_key") - F.col("o_orderkey") > 1)
        .select(
            (F.col("o_orderkey") + 1).alias("gap_start"),
            (F.col("next_key") - 1).alias("gap_end"),
            (F.col("next_key") - F.col("o_orderkey") - 1).alias("n_missing"),
        )
        .orderBy("gap_start")
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection
# ---------------------------------------------------------------------------

ZSCORE_WINDOW = 49  # trailing rows per (event_type) stream, current excluded
ZSCORE_THRESHOLD = 3.0

# Cross-engine determinism: the rolling sum and sum-of-squares are
# EXACT decimals (value cast to DECIMAL(18,6); 18,6 × 18,6 products
# carry scale 12 within precision 38 — no rounding in either engine),
# so both engines convert the IDENTICAL rationals to double and then
# run the IDENTICAL correctly-rounded IEEE ops (÷, ×, −, sqrt): z is
# bit-equal, and the |z| > 3 cut can never flip between engines.
_ZSCORE_ORACLE = f"""
WITH w AS (
    SELECT event_id, event_type, ts, value,
           count(*)           OVER frame AS cnt,
           sum(CAST(value AS DECIMAL(18,6)))  OVER frame AS s,
           sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                              OVER frame AS sq
    FROM events
    WINDOW frame AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING)
),
z AS (
    SELECT event_id, event_type, ts, value,
           (value - CAST(s AS DOUBLE) / {ZSCORE_WINDOW}) /
           sqrt(({ZSCORE_WINDOW} * CAST(sq AS DOUBLE) -
                 CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
                ({ZSCORE_WINDOW} * {ZSCORE_WINDOW - 1})) AS zscore
    FROM w
    WHERE cnt = {ZSCORE_WINDOW}
      AND ({ZSCORE_WINDOW} * CAST(sq AS DOUBLE) -
           CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) > 0
)
SELECT event_id, event_type, ts, value, round(zscore, 6) AS zscore
FROM z
WHERE abs(zscore) > {ZSCORE_THRESHOLD}
"""


@query("q_rolling_zscore", oracle=_ZSCORE_ORACLE, tags=("timeseries", "window", "quality"))
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against the
    trailing {ZSCORE_WINDOW} events of its type (current row excluded —
    an outlier must not contaminate its own baseline), emitting the
    |z| > {ZSCORE_THRESHOLD} anomalies. The monitoring primitive for a
    pipeline's value streams. One shuffle on event_type; the frame is
    incremental per partition. At 100 TB the stream key would be
    (event_type, day-bucket) to bound partition width — the frame
    logic is unchanged. Determinism note above the oracle: decimal
    moments → identical doubles → identical IEEE z in both engines."""
    ev = load_table(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-ZSCORE_WINDOW, -1)
    )
    dec = F.col("value").cast(DECIMAL_T)
    w = ev.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.count(F.lit(1)).over(frame).alias("cnt"),
        F.sum(dec).over(frame).alias("s"),
        F.sum(dec * dec).over(frame).alias("sq"),
    )
    n = F.lit(float(ZSCORE_WINDOW))
    s_d = F.col("s").cast("double")
    sq_d = F.col("sq").cast("double")
    var_num = n * sq_d - s_d * s_d
    z = (F.col("value") - s_d / n) / F.sqrt(var_num / (n * F.lit(float(ZSCORE_WINDOW - 1))))
    # Filter on the UNROUNDED z (matching the oracle, whose WHERE sees
    # the subquery column, not the rounded alias), then round for
    # display — a z at 3.0000004 must not round itself out of the cut.
    return (
        w.filter((F.col("cnt") == ZSCORE_WINDOW) & (var_num > 0))
        .withColumn("z_raw", z)
        .filter(F.abs(F.col("z_raw")) > ZSCORE_THRESHOLD)
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            F.round(F.col("z_raw"), 6).alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# Peak-concurrency sweep (max concurrent sessions per day)
# ---------------------------------------------------------------------------

# Sweep-line over session intervals [start, last_event + 1 µs): +1 at
# start, −1 at end; concurrency = running sum in (t, delta) order; the
# capacity-planning metric every event platform reports. Ties are
# deterministic: at equal t the −1 sorts first (delta ASC), i.e. a
# session ending exactly when another starts never double-counts, and
# reordering equal (t, delta) rows permutes identical prefix values
# only — max is order-free.
#
# SCALE: the naive sweep is one global-ordered running sum = a single
# partition. This is the two-pass segmented form instead: per-day net
# change → tiny cross-day running offset (≤ thousands of days,
# broadcast) → within-day running sum partitioned by day + offset. The
# window key (day) bounds partition width at any corpus size.
_CONCURRENCY_ORACLE = """
WITH sess AS (
    SELECT user_id,
           min(ts) AS s_start,
           max(ts) + INTERVAL 1 MICROSECOND AS s_end
    FROM (
        SELECT user_id, ts,
               sum(island) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                      + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS island
            FROM events
        )
    )
    GROUP BY user_id, sid
),
deltas AS (
    SELECT s_start AS t, 1 AS delta FROM sess
    UNION ALL
    SELECT s_end AS t, -1 AS delta FROM sess
),
d AS (SELECT t, delta, CAST(date_trunc('day', t) AS TIMESTAMP) AS day FROM deltas),
day_net AS (SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM d GROUP BY day),
day_off AS (
    SELECT day,
           CAST(coalesce(sum(net) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS off
    FROM day_net
),
run AS (
    SELECT d.day,
           o.off + sum(d.delta) OVER (PARTITION BY d.day ORDER BY d.t, d.delta
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
    FROM d JOIN day_off o USING (day)
)
SELECT day, CAST(max(conc) AS BIGINT) AS max_concurrent
FROM run
GROUP BY day
"""


@query("q_peak_concurrency", oracle=_CONCURRENCY_ORACLE, tags=("timeseries", "window", "agg"))
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent 30-min-gap sessions per day, via the segmented
    sweep described above (never a single global window: per-day nets
    roll into a tiny cross-day offset table, and the heavy running sum
    partitions by day)."""
    from ..streaming.events import session_stats

    ev = load_table(spark, sf_dir, "events")
    sess = session_stats(ev).select(
        F.col("session_start").alias("s_start"),
        (F.col("last_event_ts") + F.expr("INTERVAL 1 MICROSECOND")).alias("s_end"),
    )
    deltas = sess.select(F.col("s_start").alias("t"), F.lit(1).alias("delta")).unionByName(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta"))
    )
    d = deltas.withColumn("day", F.date_trunc("day", "t"))
    day_net = d.groupBy("day").agg(F.sum("delta").cast("long").alias("net"))
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    day_off = day_net.select(
        "day", F.coalesce(F.sum("net").over(w_days), F.lit(0)).cast("long").alias("off")
    )
    w_day = (
        Window.partitionBy("day")
        .orderBy(F.asc("t"), F.asc("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = d.join(F.broadcast(day_off), "day").select(
        "day", (F.col("off") + F.sum("delta").over(w_day)).alias("conc")
    )
    return run.groupBy("day").agg(F.max("conc").cast("long").alias("max_concurrent"))


_WEEK = "CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7"
_WEEK_SPARK = "CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) div 7"

_COHORT_ORACLE = f"""
WITH weeks AS (
    SELECT user_id, {_WEEK} AS wk FROM events
), cohorts AS (
    SELECT user_id, min(wk) AS cohort_wk FROM weeks GROUP BY user_id
), sized AS (
    SELECT cohort_wk, count(*) AS cohort_n FROM cohorts GROUP BY cohort_wk
)
SELECT c.cohort_wk,
       w.wk - c.cohort_wk AS week_offset,
       CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active,
       CAST(any_value(s.cohort_n) AS BIGINT) AS cohort_size,
       CAST(count(DISTINCT w.user_id) AS DOUBLE)
           / CAST(any_value(s.cohort_n) AS DOUBLE) AS retention
FROM weeks w
JOIN cohorts c USING (user_id)
JOIN sized s ON s.cohort_wk = c.cohort_wk
GROUP BY 1, 2
"""


@query("q_cohort_retention", oracle=_COHORT_ORACLE, tags=("timeseries", "agg", "window"))
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    cohorted by the week of their FIRST event, then distinct-active
    counts per (cohort, weeks-since) cell with the retention ratio as
    the IEEE quotient of two pinned integers. Week boundaries are pure
    integer arithmetic on the epoch (floor(epoch/86400) div 7), so no
    calendar/locale divergence can split the engines. Plan: one
    aggregate to find each user's first week (map-side combine), the
    tiny user→cohort table joins back on user_id, one distinct-count
    aggregate over ≤ weeks² cells; nothing scales worse than the
    event scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(_WEEK_SPARK).alias("wk")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sized = cohorts.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    return (
        ev.join(cohorts, "user_id")
        .join(F.broadcast(sized), "cohort_wk")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.any_value("cohort_n").cast("long").alias("cohort_size"),
            (
                F.countDistinct("user_id").cast("double")
                / F.any_value("cohort_n").cast("double")
            ).alias("retention"),
        )
    )


_TRANSITION_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
), pairs AS (
    SELECT prev_type, event_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
), totals AS (
    SELECT prev_type, sum(n) AS row_n FROM pairs GROUP BY prev_type
)
SELECT p.prev_type, p.event_type,
       CAST(p.n AS BIGINT) AS n,
       CAST(t.row_n AS BIGINT) AS row_total,
       CAST(p.n AS DOUBLE) / CAST(t.row_n AS DOUBLE) AS prob
FROM pairs p JOIN totals t USING (prev_type)
"""


@query("q_event_transitions", oracle=_TRANSITION_ORACLE, tags=("timeseries", "window", "agg"))
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: per-user
    event sequences ordered by (ts, event_id) — the tie-break pinned —
    lag() pairs, per-(from, to) counts and row-normalized transition
    probabilities (IEEE quotient of pinned integers). The behavioral
    twin of the text bigram LM (functions/lm.py), same shuffle shape:
    one window partition on user_id, one aggregate over |types|² keys.
    The oracle replays ordering, lag, and both integers."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("row_n").cast("long").alias("row_total"),
        (F.col("n").cast("double") / F.col("row_n").cast("double")).alias("prob"),
    )


PATH_LEN = 3  # trigram paths
PATH_TOP_K = 20

_PATHS_ORACLE = """
WITH t AS (
    SELECT user_id, event_type AS e1,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM t
WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY 1
ORDER BY n_occurrences DESC, path
LIMIT 20
"""


@query("q_event_paths_topk", oracle=_PATHS_ORACLE, tags=("timeseries", "window", "topk", "agg"))
def q_event_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step behavioral paths (event-type trigrams within
    each user's timeline) — the journey-mining complement to
    q_event_transitions' first-order Markov matrix: transitions say
    where users go NEXT, paths say which multi-step routes dominate
    (the standard product-analytics "top user journeys" panel, and for
    a training pipeline the behavioral-sequence mix report). Order
    within a user is pinned by (ts, event_id) — a total order, so the
    lead() trigrams are deterministic; ties in path frequency break on
    the path string.

    Plan shape: ONE exchange partitions by user_id for the lead()
    window (co-partitioned with every other per-user operator in the
    engine); the trigram aggregate's key domain is bounded by
    |event_types|³ — 125 here, constant at any corpus scale — so the
    second exchange carries a few hundred rows, and the final top-k is
    a TakeOrderedAndProject heap, never a global sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # e1 is null-filtered too (review catch): Spark's concat_ws SKIPS a
    # NULL while the oracle's || nulls the whole path — without the
    # filter a NULL event_type would split the engines silently the
    # day the data shape changes.
    t = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(
        F.col("e1").isNotNull()
        & F.col("e2").isNotNull()
        & F.col("e3").isNotNull()
    )
    return (
        t.select(
            F.concat_ws(" > ", "e1", "e2", "e3").alias("path"), "user_id"
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(PATH_TOP_K)
    )
