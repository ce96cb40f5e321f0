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


# --------------------------------------------------------------------------
# crawl-analysis companions: degrees / reciprocity / triangles / k-core
# --------------------------------------------------------------------------


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_degree_histogram_zero_fill_and_total(spark):
    """Handcrafted graph: hub 1 -> {2,3,4}, 2 -> 3; node 9 isolated.
    in/out/total histograms match the by-hand count; zero-degree rows
    present for every kind."""
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import degree_histogram

    got = {
        (r.kind, r.degree): r.n_nodes
        for r in degree_histogram(
            _nodes_df(spark, [1, 2, 3, 4, 9]),
            _edges_df(spark, [(1, 2), (1, 3), (1, 4), (2, 3)]),
        ).collect()
    }
    assert got == {
        ("out", 3): 1, ("out", 1): 1, ("out", 0): 3,
        ("in", 0): 2, ("in", 1): 2, ("in", 2): 1,
        ("total", 3): 1, ("total", 2): 2, ("total", 1): 1, ("total", 0): 1,
    }


def test_reciprocity_counts_mutual_edges(spark):
    """(1,2)+(2,1) mutual; (2,3) one-way; duplicate and self-loop rows
    fold before counting.  2 of 3 distinct directed edges reciprocal."""
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import reciprocity

    row = reciprocity(
        _edges_df(spark, [(1, 2), (2, 1), (2, 3), (2, 3), (7, 7)])
    ).collect()[0]
    assert (row.n_edges, row.n_reciprocal) == (3, 2)
    assert row.reciprocity_ppm == 1_000_000 * 2 // 3


def _ref_triangles(pairs):
    """Brute-force undirected triangle reference."""
    u = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    vs = sorted({v for e in u for v in e})
    tri = [
        (a, b, c)
        for i, a in enumerate(vs)
        for b in vs[i + 1:]
        if (a, b) in u
        for c in vs
        if c > b and (a, c) in u and (b, c) in u
    ]
    return tri


def test_triangle_counts_match_bruteforce_with_hub(spark):
    """A hub star (0 -> 1..12, consecutive leaves linked) plus a distant
    block's plain triangle: degree-oriented counting matches brute force
    — the hub's wedges are generated from the LEAF side (degree
    orientation), never hub-degree-squared."""
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import triangle_counts

    pairs = [(0, i) for i in range(1, 13)]
    pairs += [(i, i + 1) for i in range(1, 12)]  # hub fan: 11 triangles
    pairs += [(205, 207), (207, 209), (205, 209)]  # block 200: 1 triangle
    pairs += [(300, 301)]  # no triangle in block 300
    got = {r.block: r.n_triangles for r in triangle_counts(_edges_df(spark, pairs)).collect()}
    ref = _ref_triangles(pairs)
    want = {}
    for a, b, c in ref:
        want[min(a, b, c) - min(a, b, c) % 100] = want.get(min(a, b, c) - min(a, b, c) % 100, 0) + 1
    assert got == want == {0: 11, 200: 1}


def test_triangle_counts_random_matches_bruteforce(spark):
    import random

    from arcane_stream_microsoft_synapse_link_spark.functions.graph import triangle_counts

    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(400)]
    got = sum(
        r.n_triangles for r in triangle_counts(_edges_df(spark, pairs)).collect()
    )
    assert got == len(_ref_triangles(pairs))


def test_kcore_peels_tails_keeps_cycles(spark):
    """Cycle 1-2-3-4-1 with a dangling tail 4-5-6-7 and an isolated
    node: the 2-core is exactly the cycle; peeling needs 3 rounds for
    the length-3 tail and the declared 12 are enough."""
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import kcore

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6), (6, 7)]
    nodes = _nodes_df(spark, list(range(1, 8)) + [99])
    got = sorted(r.node for r in kcore(nodes, _edges_df(spark, pairs), k=2, rounds=12).collect())
    assert got == [1, 2, 3, 4]
    # k=3: no node has 3 surviving neighbors -> empty
    assert kcore(nodes, _edges_df(spark, pairs), k=3, rounds=12).collect() == []


def test_kcore_early_stop_never_under_peels(spark):
    """r14 early-fixpoint stop: a 14-node path needs 7 peeling rounds to
    empty under k=2 — a premature stop (e.g. triggering on a small
    per-round delta rather than set equality) would leave interior path
    nodes alive.  With a generous round budget the result must be the
    true fixpoint: empty for the path, and exactly the cycle when one is
    attached (the cycle survives while the long tail peels away round by
    round)."""
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import kcore

    path = [(i, i + 1) for i in range(1, 14)]
    nodes = _nodes_df(spark, list(range(1, 15)))
    assert kcore(nodes, _edges_df(spark, path), k=2, rounds=50).collect() == []

    # cycle 20-21-22-23-20 + the 14-node tail attached at 20: the peel
    # runs ~7 rounds before stabilizing on the cycle
    cyc = [(20, 21), (21, 22), (22, 23), (23, 20), (14, 20)]
    nodes2 = _nodes_df(spark, list(range(1, 15)) + [20, 21, 22, 23])
    got = sorted(
        r.node
        for r in kcore(nodes2, _edges_df(spark, path + cyc), k=2, rounds=50).collect()
    )
    assert got == [20, 21, 22, 23]


def test_kcore_declared_rounds_reach_fixpoint_on_synth_grammar(spark, sf_dir):
    """The declared 12 rounds are a FIXPOINT on the synthesized grammar:
    round 11 and round 12 survivors are identical (the oracle unrolls
    exactly 12, so stability is what makes the fixed count honest)."""
    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import (
        kcore,
        synthesize_edges,
    )

    docs = Tables(spark, sf_dir).documents
    edges = synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    at11 = sorted(r.node for r in kcore(nodes, edges, k=2, rounds=11).collect())
    at12 = sorted(r.node for r in kcore(nodes, edges, k=2, rounds=12).collect())
    assert at11 == at12
    assert len(at12) > 0  # non-vacuous: the grammar's hub cycles survive


def _ref_pagerank_ext(nodes, edges, iterations=5, dangling="redistribute", seeds=None):
    """Sequential exact-integer reference incl. dangling redistribution
    and personalization (independent of both engines)."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    sd = sorted(set(seeds) & set(nodes)) if seeds is not None else None
    rank = {v: 1_000_000 for v in nodes}
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += rank[s] // outdeg[s]
        dm = sum(rank[v] for v in nodes if v not in outdeg) if dangling == "redistribute" else 0
        new = {}
        for v in nodes:
            if sd is None:
                tele, extra = 150_000, (dm // n if dangling == "redistribute" else 0)
            else:
                tele = (150_000 * n) // len(sd) if v in sd else 0
                extra = dm // len(sd) if (dangling == "redistribute" and v in sd) else 0
            new[v] = tele + (85 * (inc[v] + extra)) // 100
        rank = new
    return rank


def test_pagerank_dangling_redistribution_planted_sink(spark):
    """Planted sink: 1->2->3 (3 is a sink), 4 isolated.  With 'drop' the
    sink's mass vanishes; with 'redistribute' every node gets D DIV N
    back — both match the sequential reference, and the redistributed
    total strictly exceeds the dropped total (the deflation the term
    exists to fix)."""
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import pagerank_ppm

    nodes, edges = [1, 2, 3, 4], [(1, 2), (2, 3)]
    ndf, edf = _nodes_df(spark, nodes), _edges_df(spark, edges)
    for mode in ("drop", "redistribute"):
        got = {r.node: r.rank_ppm for r in pagerank_ppm(ndf, edf, 5, dangling=mode).collect()}
        assert got == _ref_pagerank_ext(nodes, edges, 5, dangling=mode)
    dropped = sum(_ref_pagerank_ext(nodes, edges, 5, "drop").values())
    redist = sum(_ref_pagerank_ext(nodes, edges, 5, "redistribute").values())
    assert redist > dropped


def test_pagerank_personalized_mass_concentrates_on_seed_side(spark):
    """Personalized from seed {1}: ranks match the sequential reference;
    nodes reachable from the seed outrank symmetric nodes that are not
    (5<-6 chain feeding away from the seed)."""
    from arcane_stream_microsoft_synapse_link_spark.functions.graph import pagerank_ppm

    nodes = [1, 2, 3, 5, 6]
    edges = [(1, 2), (2, 3), (6, 5)]  # 3 and 5 are sinks
    ndf, edf = _nodes_df(spark, nodes), _edges_df(spark, edges)
    seeds = _nodes_df(spark, [1, 99])  # 99 outside the node set: ignored
    got = {
        r.node: r.rank_ppm
        for r in pagerank_ppm(ndf, edf, 5, dangling="redistribute", seeds=seeds).collect()
    }
    assert got == _ref_pagerank_ext(nodes, edges, 5, "redistribute", seeds=[1, 99])
    assert got[2] > got[5] and got[3] > got[5]  # seed-side dominance
    assert got[1] > got[2]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank_ppm(ndf, edf, 2, seeds=_nodes_df(spark, [999]))


def test_clustering_coefficients_match_bruteforce(spark):
    """Random graph: per-node cc_ppm equals the brute-force definition
    (triangles through v over deg(v)-choose-2 pairs, exact ppm floor);
    a triangle-free star reports all zeros."""
    import random

    from arcane_stream_microsoft_synapse_link_spark.functions.graph import (
        clustering_coefficients,
    )

    rng = random.Random(11)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    got = {
        r.node: (r.degree, r.n_triangles, r.cc_ppm)
        for r in clustering_coefficients(_edges_df(spark, pairs)).collect()
    }
    u = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj: dict[int, set[int]] = {}
    for a, b in u:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            assert v not in got
            continue
        t = sum(1 for x in nb for y in nb if x < y and (x, y) in u)
        assert got[v] == (d, t, 1_000_000 * 2 * t // (d * (d - 1))), v
    # triangle-free star: hub degree 5, closure 0
    star = [(100, 100 + i) for i in range(1, 6)]
    srow = {
        r.node: r.cc_ppm
        for r in clustering_coefficients(_edges_df(spark, star)).collect()
    }
    assert srow == {100: 0}


def test_harmonic_truncated_matches_bfs_reference(spark):
    """Truncated harmonic centrality equals a sequential multi-source
    BFS reference (exact integer ppm) on a random directed graph, and
    respects the radius cutoff (a node 7 hops down a chain contributes
    nothing at radius 6)."""
    import random
    from collections import deque

    from arcane_stream_microsoft_synapse_link_spark.functions.graph import (
        harmonic_truncated,
    )

    rng = random.Random(17)
    pairs = list({(rng.randrange(50), rng.randrange(50)) for _ in range(150)})
    chain = [(100 + i, 101 + i) for i in range(8)]  # 100->...->108
    pairs += chain
    got = {
        r.node: (r.n_sources, r.harmonic_ppm)
        for r in harmonic_truncated(_edges_df(spark, pairs), radius=6).collect()
    }

    adj: dict[int, list[int]] = {}
    nodes = set()
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, []).append(d)
        nodes.update((s, d))
    want: dict[int, list[int]] = {}
    for u in nodes:  # BFS out of u; charge v with d(u -> v)
        seen, q = {u: 0}, deque([u])
        while q:
            x = q.popleft()
            if seen[x] >= 6:
                continue
            for y in adj.get(x, ()):
                if y not in seen:
                    seen[y] = seen[x] + 1
                    q.append(y)
        for v, d in seen.items():
            if v != u:
                want.setdefault(v, []).append(d)
    ref = {
        v: (len(ds), sum(1_000_000 // d for d in ds)) for v, ds in want.items()
    }
    assert got == ref
    # radius cutoff: node 108 is 8 hops from 100 -> only sources within 6
    assert got[108][0] == 6
