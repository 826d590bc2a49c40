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
