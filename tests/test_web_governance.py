"""Unit tests for the web/URL analytics, binaryFile landing zone, and
governance-audit modules beyond the registry oracle sweep: component
recovery on adversarial URLs, decoy exclusion at the listing level,
and the at-risk verdict's boundary behavior.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.functions.web import parse_components
from facebook_ad_library_data_pipeline_spark.operators.governance import (
    K_MIN,
    L_MIN,
    anonymity_classes,
)
from facebook_ad_library_data_pipeline_spark.sources.binaryfiles import write_blob_dir


def test_parse_components_adversarial(spark):
    """Fragments, ports-free hosts, missing params, deep paths: the
    parser must isolate each part (a HOST that keeps the fragment or a
    QUERY that greps the whole string would fail these pins)."""
    urls = [
        ("https://www.site1.com/a/items/9?uid=42&t=3#sec1",),
        ("https://site2.org/7?uid=8&t=0#sec0",),
        # param order swapped; extra unknown param; no fragment
        ("https://cdn.site3.net/x/items/1?t=6&uid=5&z=zz",),
        # no query at all -> uid/t NULL
        ("https://site4.com/solo",),
    ]
    df = parse_components(spark.createDataFrame(urls, ["url"]))
    rows = {r.host: r for r in df.collect()}
    assert rows["www.site1.com"].domain == "site1.com"
    assert rows["www.site1.com"].uid == 42 and rows["www.site1.com"].t_param == 3
    assert rows["www.site1.com"].path_depth == 3
    assert rows["site2.org"].domain == "site2.org"
    assert rows["site2.org"].path_depth == 1
    assert rows["cdn.site3.net"].uid == 5 and rows["cdn.site3.net"].t_param == 6
    assert rows["site4.com"].uid is None and rows["site4.com"].t_param is None


def test_binaryfile_glob_excludes_decoys(spark, tmp_path):
    """pathGlobFilter prunes at LISTING time: only *.bin files become
    rows; the planted _SUCCESS/notes.txt decoys never appear."""
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo")], ["doc_id", "text"]
    )
    out = str(tmp_path / "blobs")
    write_blob_dir(docs, out)
    assert (Path(out) / "notes.txt").exists()  # decoy landed
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
    )
    # pruning happens at LISTING time: the decoys never enter the
    # scan's file list (not merely filtered out of the rows later)
    files = scan.inputFiles()
    assert len(files) == 2 and all(f.endswith(".bin") for f in files)
    names = sorted(
        r.name
        for r in scan.select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("name")
        ).collect()
    )
    assert names == ["doc_00000001.bin", "doc_00000002.bin"]
    content = {
        r.name: bytes(r.content)
        for r in scan.select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("name"), "content"
        ).collect()
    }
    assert content["doc_00000001.bin"] == b"alpha"


def test_anonymity_verdict_boundaries(spark):
    """k and l gates fire independently: a class of K_MIN-1 distinct
    people is at risk even with diverse sensitive values; a class of
    K_MIN people with one sensitive value is at risk on l alone."""
    # class A: 4 customers (k=4 < 5), diverse priorities
    # class B: 5 customers, all priority 'P1' (l=1 < 2)
    # class C: 5 customers, two priorities -> safe
    cust = spark.createDataFrame(
        [(i, 1, "A", 0.0) for i in range(4)]
        + [(10 + i, 2, "B", 0.0) for i in range(5)]
        + [(20 + i, 3, "C", 0.0) for i in range(5)],
        ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"],
    )
    orders = spark.createDataFrame(
        [(100 + i, i, f"P{i}") for i in range(4)]  # A: P0..P3
        + [(200 + i, 10 + i, "P1") for i in range(5)]  # B: homogeneous
        + [(300 + i, 20 + i, "P" + str(i % 2)) for i in range(5)],  # C: P0/P1
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    out = anonymity_classes(cust, orders).withColumn(
        "at_risk", (F.col("k_size") < K_MIN) | (F.col("l_div") < L_MIN)
    )
    by_seg = {r.c_mktsegment: r for r in out.collect()}
    assert by_seg["A"].at_risk and by_seg["A"].k_size == 4 and by_seg["A"].l_div == 4
    assert by_seg["B"].at_risk and by_seg["B"].k_size == 5 and by_seg["B"].l_div == 1
    assert not by_seg["C"].at_risk


def test_canonicalize_url_fixtures(spark):
    """Handcrafted messy-URL matrix for the crawl-frontier collapse:
    each case targets one normalization rule, including the ones the
    synthesized corpus can't combine freely."""
    from facebook_ad_library_data_pipeline_spark.functions.web import (
        canonicalize_url,
    )

    cases = [
        # scheme dropped, host lowercased, www stripped
        ("https://WWW.Site1.com/p/1?id=2", "site1.com/p/1?id=2"),
        ("http://site1.com/p/1?id=2", "site1.com/p/1?id=2"),
        # trailing slash stripped (one level)
        ("https://site1.com/p/1/?id=2", "site1.com/p/1?id=2"),
        # tracking params dropped wherever they sit; real params keep order
        ("https://site1.com/p/1?utm_source=x&id=2&utm_medium=y&b=3",
         "site1.com/p/1?id=2&b=3"),
        # all-tracking query collapses to no query at all
        ("https://site1.com/p/1?utm_source=x", "site1.com/p/1"),
        # fragment never leaks in
        ("https://site1.com/p/1?id=2#frag", "site1.com/p/1?id=2"),
        # no query, no fragment
        ("http://www.site9.com/a", "site9.com/a"),
        # www only stripped as a PREFIX label
        ("https://cdn.www-like.com/x?id=1", "cdn.www-like.com/x?id=1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, expected) in enumerate(cases):
        assert got[i] == expected, (u, got[i], expected)
