"""Connected-components correctness vs a Python union-find oracle."""

from __future__ import annotations


def _union_find(edges):
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
    # canonical label = min node id in the component
    return {n: find(n) for n in parent}


def test_cc_matches_union_find_on_chain_and_clusters(spark):
    from nytimes_batch_processor_spark.operators.graph import connected_components

    edges = [
        (1, 2), (2, 3), (3, 4),          # chain: one component labeled 1
        (10, 11), (11, 12), (10, 12),    # triangle: labeled 10
        (20, 21),                         # pair
        (30, 31), (31, 32), (30, 33),    # star
    ]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_cc_matches_union_find_on_fixture_pairs(spark, sf_dir):
    """Real MinHash pairs (bounded slice): Spark CC must equal the
    union-find ground truth computed on the collected edge list."""
    from pyspark.sql import functions as F

    from nytimes_batch_processor_spark.operators.dedup import dedup_minhash_lsh
    from nytimes_batch_processor_spark.operators.graph import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir).filter(
        (F.col("id1") < 150) & (F.col("id2") < 150)
    )
    edge_list = [(r["id1"], r["id2"]) for r in pairs.collect()]
    assert edge_list, "fixture slice should contain candidate pairs"
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == _union_find(edge_list)


def test_cc_dedup_keeps_one_rep_per_cluster(spark, sf_dir):
    from nytimes_batch_processor_spark.operators.dedup import dedup_minhash_lsh
    from nytimes_batch_processor_spark.operators.graph import (
        connected_components,
        dedup_minhash_cc,
    )
    from nytimes_batch_processor_spark.sources import load_tables

    total = load_tables(spark, sf_dir, "documents").documents.count()
    comp = connected_components(dedup_minhash_lsh(spark, sf_dir))
    n_nodes = comp.count()
    n_components = comp.select("component").distinct().count()
    survivors = dedup_minhash_cc(spark, sf_dir).count()
    # unpaired docs all survive; each paired cluster keeps exactly one
    assert survivors == (total - n_nodes) + n_components


def test_star_cc_matches_union_find_and_min_label(spark):
    """Large-star/small-star CC must agree with both the union-find
    oracle and the min-label-propagation implementation on mixed
    topologies."""
    from nytimes_batch_processor_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    edges = [
        (1, 2), (2, 3), (3, 4),
        (10, 11), (11, 12), (10, 12),
        (20, 21),
        (30, 31), (32, 31), (33, 30), (34, 33),  # star-ish with chain tail
    ]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    star = {r["node"]: r["component"] for r in connected_components_star(df).collect()}
    prop = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert star == _union_find(edges) == prop


def test_star_cc_converges_on_long_chain(spark):
    """The O(log n) guarantee in practice: a 200-node chain (diameter
    199) converges in far fewer star rounds than min-label's 199
    iterations — the exact case where the web-scale variant matters."""
    from nytimes_batch_processor_spark.operators.graph import (
        connected_components_star,
    )

    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r["node"]: r["component"] for r in connected_components_star(df, max_iter=12).collect()}
    assert got == {n: 0 for n in range(1, 201)} | {0: 0}
