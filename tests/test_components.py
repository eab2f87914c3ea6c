"""Connected-components semantics on a constructed graph with a chain
(a~b~c): transitive clustering must merge what pair-wise dedup can't."""

from __future__ import annotations

from facebook_ad_library_data_pipeline_spark.operators.components import connected_components


def test_chain_collapses_to_one_component(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    # chain 1-2-3, pair 5-6, singletons 4 and 7
    edges = spark.createDataFrame([(2, 1), (2, 3), (5, 6)], "src long, dst long")
    got = {r.node: r.component for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_two_chains_dont_merge(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "node long")
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5), (5, 6)], "src long, dst long")
    got = {r.node: r.component for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}
