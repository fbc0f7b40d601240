"""Property-based test for connected_components
(operators/dedup.py): for ANY edge list, the converged min-label
assignment must equal the component minimum computed by an independent
union-find over the same edges.

Spark session startup is expensive, so the strategy generates a BATCH
of random graphs and runs them through one parametrized check; the
union-find reference is written independently of the min-propagation
loop (path-compressed DSU), so agreement is evidence, not circularity.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hummingbird_spark.operators.dedup import connected_components

edge = st.tuples(st.integers(0, 30), st.integers(0, 30))
edge_lists = st.lists(edge, min_size=1, max_size=40)


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # component label = min node id; find() roots at the min because
    # union always parents the larger root under the smaller
    return {n: find(n) for n in parent}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edge_lists)
def test_cc_matches_union_find(spark, edges):
    expect = _union_find_labels(edges)
    df = spark.createDataFrame(edges, "a: long, b: long")
    # local_edge_threshold=0 forces the DISTRIBUTED min-label loop —
    # the default path below the threshold is itself a union-find and
    # is covered by test_connected_components_known_graph
    got = {r.node: r.label
           for r in connected_components(
               df, local_edge_threshold=0).collect()}
    assert got == expect


def test_cc_empty_edge_list_both_paths(spark):
    """No edges -> no labeled nodes, on the driver-local default path
    AND the distributed loop, with the same (node, label) schema."""
    empty = spark.createDataFrame([], "a: long, b: long")
    local = connected_components(empty)
    dist = connected_components(empty, local_edge_threshold=0)
    assert local.collect() == [] == dist.collect()
    assert [f.name for f in local.schema.fields] == ["node", "label"]
    assert dict(local.dtypes) == dict(dist.dtypes)


def test_cc_string_node_ids_local_path(spark):
    """The default path labels non-numeric ids too (min = lexicographic),
    preserving the id type in the result schema."""
    edges = spark.createDataFrame(
        [("d2", "d7"), ("d7", "d1"), ("x9", "x3")], "a: string, b: string")
    got = {r.node: r.label for r in connected_components(edges).collect()}
    assert got == {"d1": "d1", "d2": "d1", "d7": "d1",
                   "x3": "x3", "x9": "x3"}
