"""Ad-domain schemas, reconstructed from every field access in the
reference (FIXTURES.md §A1-A4; citations inline).

Raw layer: one row per AD GROUP with ``ads: array<struct>`` — the
scraper emits array-of-arrays (``collect_raw_data.py:93-102`` builds
groups from ``edge.node.collated_results``; ``transform_raw_data.py:
196-199`` consumes group-of-ads). Curated layer: flat ``ValidatedAd``
shape (``transform_raw_data.py:32-43``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# snapshot.cards[i].{body, video_hd_url, original_image_url}
#   (transform_raw_data.py:124,126 / :85,:87)
CARD_SCHEMA = T.StructType(
    [
        T.StructField("body", T.StringType()),
        T.StructField("video_hd_url", T.StringType()),
        T.StructField("original_image_url", T.StringType()),
    ]
)

# snapshot.{display_format, body.text, cards} (transform_raw_data.py:118,126,124)
SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("display_format", T.StringType()),
        T.StructField(
            "body", T.StructType([T.StructField("text", T.StringType())])
        ),
        T.StructField("cards", T.ArrayType(CARD_SCHEMA)),
    ]
)

# One scraped ad (fields actually read by transform_raw_data.py:106-148).
# start_date/end_date stay LongType epoch-seconds; the reference
# validates int-ness + range (transform_raw_data.py:45-56) — here
# malformed values surface as nulls from the schema-checked JSON read
# and are caught by the validity rules.
AD_SCHEMA = T.StructType(
    [
        T.StructField("ad_archive_id", T.StringType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("start_date", T.LongType()),
        T.StructField("end_date", T.LongType()),
        T.StructField("total_active_time", T.LongType()),
        T.StructField("collation_id", T.StringType()),
        T.StructField("collation_count", T.LongType()),
        T.StructField("snapshot", SNAPSHOT_SCHEMA),
    ]
)

# Raw file: JSON array of ad groups; ingested as one row per group.
RAW_GROUP_SCHEMA = T.StructType([T.StructField("ads", T.ArrayType(AD_SCHEMA))])

# Curated table = pydantic ValidatedAd (transform_raw_data.py:32-43),
# FIXTURES.md §A2, plus the engine-side lineage columns (group_idx,
# pos) that make keep-first dedup deterministic under Spark shuffles.
CURATED_SCHEMA = T.StructType(
    [
        T.StructField("ad_id", T.StringType(), False),
        T.StructField("is_active", T.BooleanType(), False),
        T.StructField("start_date_ts", T.LongType(), False),
        T.StructField("end_date_ts", T.LongType()),
        T.StructField("total_active_time_sec", T.LongType()),
        T.StructField("ad_group_id", T.StringType()),
        T.StructField("grouped_ads_count", T.LongType()),
        T.StructField("display_format", T.StringType(), False),
        T.StructField("media_mix", T.StringType(), False),
        T.StructField("ad_text", T.StringType(), False),
        T.StructField("ad_lang_code", T.StringType(), False),
    ]
)

DISPLAY_FORMATS = ("VIDEO", "IMAGE", "DCO", "CAROUSEL")  # transform_raw_data.py:18-22
MEDIA_MIXES = ("video-only", "image-only", "both", "none")  # transform_raw_data.py:25-29

# Epoch-second domain accepted by our validator. Two DELIBERATE
# deviations from the reference (both pinned by
# tests/test_adslib_golden.py::test_epoch_boundary_rules):
# 1. The reference accepts any epoch `datetime.fromtimestamp` takes —
#    platform-dependent (negative epochs pass on Linux, raise OSError
#    on Windows). We pin TS_MIN = 0: portable, and pre-1970 ad start
#    dates are garbage in this domain anyway.
# 2. The reference's date-order check (transform_raw_data.py:67-70)
#    tests `if self.start_date_ts and self.end_date_ts` — TRUTHINESS,
#    so start_date_ts == 0 silently skips the end >= start rule. We
#    apply the rule whenever both are non-null; an epoch-0 start with
#    an earlier end is quarantined, not passed.
TS_MIN = 0
TS_MAX = 4102444800  # 2100-01-01
