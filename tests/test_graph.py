"""Two-phase star connected components: correctness vs known components,
chain graphs (label-propagation's worst case), and the dedup-cluster query."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_cdc_connectors_spark.operators.graph import connected_components


def _components_of(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    got = connected_components(df).toPandas()
    return {int(r.id): int(r.component) for r in got.itertuples()}


def _truth(edges):
    # union-find ground truth
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_cc_simple_components(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    assert _components_of(spark, edges) == _truth(edges)


def test_star_cc_long_chain(spark):
    """A 60-node chain: diameter 59 — min-label propagation would need 59
    rounds; the star algorithm converges in O(log n)."""
    edges = [(i, i + 1) for i in range(100, 160)]
    got = _components_of(spark, edges)
    assert set(got.values()) == {100}
    assert len(got) == 61


def test_star_cc_random_graphs_match_union_find(spark):
    rng = random.Random(13)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _components_of(spark, edges) == _truth(edges)


def test_star_cc_agrees_with_dedup_cluster_query(spark, sf_dir):
    """On the real near-dup pair graph, the star algorithm and the
    label-propagation query assign identical (doc_id, cluster_id)."""
    from flink_cdc_connectors_spark.queries.tier_c import ext_dedup_ngram_jaccard
    from flink_cdc_connectors_spark.queries.tier_c_ext import ext_dedup_cluster

    pairs = ext_dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    star = {
        int(r.id): int(r.component)
        for r in connected_components(pairs).toPandas().itertuples()
    }
    labelprop = {
        int(r.doc_id): int(r.cluster_id)
        for r in ext_dedup_cluster(spark, sf_dir).toPandas().itertuples()
    }
    assert star == labelprop
