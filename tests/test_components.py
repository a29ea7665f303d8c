"""Connected-components (operators/components.py) vs a union-find oracle.

The star-contraction rounds run on Spark; the oracle is a few lines of
driver-side union-find over the same pair list — exact, so every graph
shape asserts full equality of the node→component mapping.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.components import (
    connected_components,
    dedup_clusters,
)

from .conftest import SF_SMALL


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = component minimum (find compresses to the min
    # because we always attach the larger root under the smaller)
    return {n: find(n) for n in parent}


def _spark_components(spark, pairs):
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    return {
        r.node: r.component
        for r in connected_components(df).collect()
    }


GRAPHS = {
    "chain": [(i, i + 1) for i in range(20)],
    "two_cliques": [(a, b) for a in range(5) for b in range(5) if a < b]
    + [(a, b) for a in range(100, 105) for b in range(100, 105) if a < b],
    "star": [(0, i) for i in range(1, 30)],
    "self_and_dup": [(1, 1), (1, 2), (2, 1), (2, 3)],
    "disjoint_pairs": [(i, i + 1000) for i in range(0, 40, 2)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_components_match_union_find(spark, name):
    pairs = GRAPHS[name]
    expected = _union_find(pairs)
    got = _spark_components(spark, pairs)
    assert got == expected


def test_components_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 200
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(5, 150))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        assert _spark_components(spark, pairs) == _union_find(pairs), (
            f"trial {trial}"
        )


def test_chain_needs_transitivity(spark):
    """The shape greedy pair-dedup gets wrong: A~B, B~C, no A~C pair.
    Exact components put all three in one cluster labeled min."""
    got = _spark_components(spark, [(10, 20), (20, 30)])
    assert got == {10: 10, 20: 10, 30: 10}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    assert connected_components(df).count() == 0


def test_dedup_clusters_flags(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 4, 5)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = {
        r.doc_id: (r.cluster_id, r.is_cluster_min)
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert out == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),   # singleton: own cluster, kept
        5: (5, True),
    }


def test_components_on_real_lsh_pairs(spark):
    """Integration: LSH candidate pairs over the synthetic corpus →
    clusters. Every cluster id must be the cluster's own minimum member
    and every pair's endpoints must land in the same cluster."""
    from etl_sber_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from etl_sber_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(d)).localCheckpoint()
    comp = connected_components(pairs)
    by_node = {r.node: r.component for r in comp.collect()}
    for r in pairs.select("id_a", "id_b").collect():
        assert by_node[r.id_a] == by_node[r.id_b]
    mins = (
        comp.groupBy("component").agg(F.min("node").alias("mn")).collect()
    )
    for r in mins:
        assert r.component == r.mn


def test_soft_dedup_weights(spark):
    """Each cluster's total weight is exactly 1; singletons weigh 1."""
    from etl_sber_spark.operators.components import soft_dedup_weights

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(7)], "doc_id int, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a int, id_b int"
    )
    out = {r.doc_id: r for r in soft_dedup_weights(docs, pairs).collect()}
    assert len(out) == 7
    for i in (0, 1, 2):
        assert out[i].cluster_id == 0 and out[i].cluster_size == 3
        assert abs(out[i].sample_weight - 1 / 3) < 1e-12
    for i in (4, 5):
        assert out[i].cluster_size == 2 and out[i].sample_weight == 0.5
    for i in (3, 6):
        assert out[i].cluster_id == i
        assert out[i].cluster_size == 1 and out[i].sample_weight == 1.0
    # conservation: total weight == number of distinct passages
    total = sum(r.sample_weight for r in out.values())
    assert abs(total - 4) < 1e-9  # clusters {0,1,2}, {4,5}, {3}, {6}
