"""Document-graph operators (functions/graph.py): planted-structure and
independent-reference tests for connected components and ppm PageRank."""

import pyspark.sql.functions as F
import pytest


def _ref_components(nodes, edges):
    """Sequential union-find reference (independent of the engine)."""
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
    return {n: find(n) for n in nodes}


def _ref_pagerank_ppm(nodes, edges, iterations=5):
    """Sequential exact-integer reference of the declared recurrence."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        incoming = {n: 0 for n in nodes}
        for s, d in edges:
            incoming[d] += rank[s] // outdeg[s]
        rank = {n: 150_000 + (85 * incoming[n]) // 100 for n in nodes}
    return rank


PLANTED_NODES = list(range(12))
# two components: a chain 0-1-2-3 with a hub edge 1->0, and a star 10<-{5,6,7};
# nodes 4, 8, 9, 11 isolated (except 8->9 making a pair)
PLANTED_EDGES = [(0, 1), (1, 2), (2, 3), (1, 0), (5, 10), (6, 10), (7, 10), (8, 9)]


def test_connected_components_planted(spark):
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import (
        connected_components,
    )

    nodes = spark.createDataFrame([(n,) for n in PLANTED_NODES], "node long")
    edges = spark.createDataFrame(PLANTED_EDGES, "src long, dst long")
    got = {r.node: r.component for r in connected_components(nodes, edges).collect()}
    want = _ref_components(PLANTED_NODES, PLANTED_EDGES)
    assert got == want
    assert got[4] == 4 and got[11] == 11  # isolated nodes = singleton components
    assert got[10] == 5 and got[9] == 8


def test_connected_components_distributed_branch(spark, monkeypatch):
    """Force the pointer-jumping distributed branch (driver_threshold=0 is
    not reachable through connected_components' signature, so patch the
    underlying clusterer) on a 3-chain + ring graph and compare with the
    sequential reference."""
    from arcane_stream_microsoft_synapse_link_spark.functions import dedup as D
    from arcane_stream_microsoft_synapse_link_spark.functions import graph as G

    orig = D.duplicate_clusters
    monkeypatch.setattr(
        D, "duplicate_clusters", lambda pairs, **kw: orig(pairs, driver_threshold=0)
    )
    nodes = list(range(60))
    edges = [(i, i + 1) for i in range(0, 19)]  # chain 0..19
    edges += [(20 + i, 20 + (i + 1) % 20) for i in range(20)]  # ring 20..39
    edges += [(40, 59), (41, 58)]  # two pairs
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in G.connected_components(ndf, edf).collect()}
    assert got == _ref_components(nodes, edges)


def test_pagerank_ppm_matches_sequential_reference(spark):
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import (
        pagerank_ppm,
    )

    nodes = spark.createDataFrame([(n,) for n in PLANTED_NODES], "node long")
    edges = spark.createDataFrame(PLANTED_EDGES, "src long, dst long")
    got = {r.node: r.rank_ppm for r in pagerank_ppm(nodes, edges, 5).collect()}
    assert got == _ref_pagerank_ppm(PLANTED_NODES, PLANTED_EDGES, 5)
    # the star hub out-ranks its spokes; sinks with no in-links sit at teleport
    assert got[10] > got[5] and got[4] == 150_000


def test_synthesized_graph_component_bound(spark):
    """Every synthesized component stays inside one 100-block (the bound
    the recursive oracle's cost argument rests on) at sf0.01."""
    from arcane_stream_microsoft_synapse_link_spark.functions import graph as G

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    edges = G.synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    comp = G.connected_components(nodes, edges)
    spans = comp.groupBy("component").agg(
        (F.max("node") - F.min("node")).alias("span"), F.count("*").alias("n")
    )
    mx = spans.agg(F.max("span"), F.max("n")).first()
    assert mx[0] < 100 and mx[1] <= 100
    # edges never leave a block and never point at missing nodes
    bad = edges.where(
        (F.col("src") - F.col("src") % 100 != F.col("dst") - F.col("dst") % 100)
    ).count()
    assert bad == 0


def test_pagerank_mass_and_hub_concentration(spark):
    """On the synthesized graph, block hubs (node % 100 == 0) carry the
    star fan-in, so the hub rank dominates its block's median; total mass
    stays within the teleport/damping envelope."""
    from arcane_stream_microsoft_synapse_link_spark.functions import graph as G

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    edges = G.synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    ranks = G.pagerank_ppm(nodes, edges, 5)
    hub = ranks.where(F.col("node") % 100 == 0).agg(F.min("rank_ppm")).first()[0]
    others = ranks.where(F.col("node") % 100 != 0)
    med = others.approxQuantile("rank_ppm", [0.5], 0.0)[0]
    assert hub > 3 * med
    # every rank >= teleport floor
    assert ranks.agg(F.min("rank_ppm")).first()[0] >= 150_000


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_graph_ops_randomized_property(spark, seed):
    """Randomized mirror property: on a seeded random graph (Erdős–Rényi-ish
    sparse + a planted hub), distributed CC and ppm PageRank equal the
    sequential references exactly — components as sets, ranks bit-for-bit."""
    import random

    rng = random.Random(seed)
    n = rng.randrange(80, 200)
    nodes = list(range(n))
    edges = set()
    for _ in range(int(n * 1.3)):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    hub = rng.randrange(n)
    for _ in range(10):  # planted hub fan-in
        s = rng.randrange(n)
        if s != hub:
            edges.add((s, hub))
    edges = sorted(edges)

    from arcane_stream_microsoft_synapse_link_spark.functions import graph as G

    ndf = spark.createDataFrame([(x,) for x in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got_cc = {r.node: r.component for r in G.connected_components(ndf, edf).collect()}
    assert got_cc == _ref_components(nodes, edges)
    got_pr = {r.node: r.rank_ppm for r in G.pagerank_ppm(ndf, edf, 4).collect()}
    assert got_pr == _ref_pagerank_ppm(nodes, edges, 4)


def test_cc_fold_in_equals_from_scratch_planted(spark):
    """Fold-in over a split edge set equals the from-scratch labeling,
    including merges ACROSS base components and brand-new nodes that only
    the increment introduces."""
    from arcane_stream_microsoft_synapse_link_spark.functions import graph as G

    nodes = list(range(14))
    base = [(0, 1), (2, 3), (5, 6), (8, 9)]
    # merges 0-1 with 2-3, attaches new node 12 to 5-6, new pair 10-11,
    # and a chain through previously isolated 4 and 7
    inc = [(1, 2), (12, 5), (10, 11), (4, 7)]
    ndf = spark.createDataFrame([(x,) for x in nodes], "node long")
    base_labels = G.connected_components(
        ndf, spark.createDataFrame(base, "src long, dst long")
    )
    folded = {
        r.node: r.component
        for r in G.cc_fold_in(
            base_labels, spark.createDataFrame(inc, "src long, dst long")
        ).collect()
    }
    want = _ref_components(nodes + [10, 11, 12], base + inc)
    # node 13 is isolated and only in the node table
    assert folded == {n: want.get(n, n) for n in set(nodes) | {10, 11, 12}}


@pytest.mark.parametrize("seed", [7, 41])
def test_cc_fold_in_randomized(spark, seed):
    """Randomized split property: from-scratch CC of the full random graph
    equals base-CC + fold-in of the remainder, for any deterministic
    split."""
    import random

    rng = random.Random(seed)
    n = rng.randrange(60, 150)
    nodes = list(range(n))
    edges = sorted(
        {
            (a, b)
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(int(n * 1.2))
            )
            if a != b
        }
    )
    base = [e for e in edges if (e[0] + e[1]) % 3 != 0]
    inc = [e for e in edges if (e[0] + e[1]) % 3 == 0]

    from arcane_stream_microsoft_synapse_link_spark.functions import graph as G

    ndf = spark.createDataFrame([(x,) for x in nodes], "node long")
    base_labels = G.connected_components(
        ndf, spark.createDataFrame(base or [(0, 0)], "src long, dst long").where("src <> dst")
    )
    inc_df = spark.createDataFrame(inc or [(0, 0)], "src long, dst long").where(
        "src <> dst"
    )
    folded = {r.node: r.component for r in G.cc_fold_in(base_labels, inc_df).collect()}
    assert folded == _ref_components(nodes, edges)
