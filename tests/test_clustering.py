"""Connected components (large-star/small-star) unit + e2e tests."""

import random

from pyspark.sql import functions as F

from poi_name_matching_spark.operators.clustering import components


def _cc(spark, edges, nodes):
    e = spark.createDataFrame(edges, "src string, dst string")
    n = spark.createDataFrame([(x,) for x in nodes], "conv_id string")
    out = components(n, e)
    return {r["conv_id"]: r["component_id"] for r in out.collect()}


def test_chain(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")], list("abcde"))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e"}


def test_two_components_and_reversed_edges(spark):
    got = _cc(
        spark,
        [("b", "a"), ("c", "b"), ("e", "d"), ("d", "e"), ("f", "f")],
        list("abcdefg"),
    )
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "d": "d", "e": "d",
        "f": "f", "g": "g",
    }


def test_random_graph_matches_union_find(spark):
    rng = random.Random(3)
    nodes = [f"n{i:03d}" for i in range(200)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    # driver-side union-find oracle
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per component
    from collections import defaultdict

    groups = defaultdict(list)
    for n in nodes:
        groups[find(n)].append(n)
    expected = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            expected[n] = m

    got = _cc(spark, edges, nodes)
    assert got == expected


def test_deterministic_across_partitionings(spark):
    edges = [("a", "b"), ("c", "d"), ("b", "c"), ("x", "y")]
    nodes = list("abcdxyz")
    e1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    e8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    n = spark.createDataFrame([(x,) for x in nodes], "conv_id string")
    r1 = {r["conv_id"]: r["component_id"] for r in components(n, e1).collect()}
    r8 = {r["conv_id"]: r["component_id"] for r in components(n, e8).collect()}
    assert r1 == r8
    assert r1["d"] == "a" and r1["y"] == "x" and r1["z"] == "z"
