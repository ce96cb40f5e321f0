"""Document-graph operators: connected components and PageRank.

Large-scale curation treats the corpus as a graph twice over: duplicate
clusters ARE connected components (the engine already runs min-label
propagation inside ``functions/dedup.py:duplicate_clusters``), and every
public crawl pipeline ranks hosts/pages by link centrality before
sampling (Common Crawl publishes harmonic/PageRank host ranks; OPIC /
PageRank seeding is the standard crawl-frontier policy).  This module
exposes both as first-class operators over an arbitrary edge list.

The driver corpus carries no link column, so the declared queries
synthesize a deterministic edge list from ``doc_id`` arithmetic — see
:func:`synthesize_edges` / ``SYNTH_EDGES_SQL`` (the ``functions/web.py``
convention: both engines build the identical graph, so the compare
exercises the real algorithm, not the synthesis).

Exact-integer contract (hash-stable across engines — no float): PageRank
runs in ppm fixed point with integer division at every step, so Spark
and DuckDB produce bit-identical ranks; components label each node with
the component's minimum node id (an integer, not an engine-dependent
surrogate).

Reference parity: the reference ingests CDM change folders
(``src/main/scala/.../StreamRunner.scala``) and has no graph surface;
this family belongs to the training-data extension surface (SURVEY §2,
LLM-pipeline ops).

100-TB shape:
* Components: delegated to ``duplicate_clusters`` — adaptive union-find
  on the driver for small edge sets, min-label propagation with pointer
  jumping (O(log diameter) rounds, Rastogi et al. 2012) above the
  threshold; each round is one shuffle join + hash-agg on the EDGE
  table, never the corpus.
* PageRank: the canonical synchronous iteration — per round ONE
  edges⋈ranks equi-join on ``src`` (ranks is node-sized; AQE handles hub
  skew) and ONE hash-agg on ``dst`` with map-side combine.  Out-degrees
  are computed once.  Lineage is truncated per round (localCheckpoint)
  so round N never replays rounds 1..N-1; on a cluster swap in
  ``checkpoint()`` to reliable storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: per-node teleport mass in ppm (0.15) and the damping numerator /
#: denominator (85/100) — integers so both engines floor identically.
TELEPORT_PPM = 150_000
DAMP_NUM, DAMP_DEN = 85, 100


def synthesize_edges(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic directed edge list ``(src, dst)`` over the corpus'
    ids — the engine and the DuckDB oracle build exactly this graph.

    Three families, all confined to a node's 100-block so component
    sizes stay bounded (≤100 nodes) at EVERY corpus scale — the
    recursive oracle stays polynomial and the planted structure is
    scale-invariant:

    * chains: ``i → i+1`` unless ``i ≡ 16 (mod 17)`` (a break every 17)
      or ``i ≡ 99 (mod 100)`` (never crosses a block);
    * stars: ``i → block_start`` for ``i ≡ 0 (mod 5)`` off the hub
      (every block gets a hub with in-degree ~20 — PageRank mass
      concentrates there);
    * intra-block long-range: ``i → block_start + (i·37 mod 100)`` for
      ``i ≡ 0 (mod 23)``, skipping would-be self-loops.

    Targets are validated by an inner equi-join against the id set, so
    edges never point at non-existent nodes (the last partial block).
    The join is node-id-sized and broadcast-able at test scales;
    synthesis is plan-time only — a real crawl table ships its own
    ``(src, dst)`` and skips this entirely.
    """
    i = F.col(id_col).cast("bigint")
    block = i - (i % 100)
    e1 = docs.where((i % 17 != 16) & (i % 100 != 99)).select(
        i.alias("src"), (i + 1).alias("dst")
    )
    e2 = docs.where((i % 5 == 0) & (i % 100 != 0)).select(
        i.alias("src"), block.alias("dst")
    )
    e3 = docs.where((i % 23 == 0) & ((i * 37) % 100 != i % 100)).select(
        i.alias("src"), (block + (i * 37) % 100).alias("dst")
    )
    edges = e1.unionAll(e2).unionAll(e3)
    ids = docs.select(i.alias("dst")).distinct()
    return edges.join(ids, "dst", "inner").select("src", "dst")


#: oracle-side mirror of synthesize_edges — expects a view/CTE named
#: ``documents`` with a ``doc_id`` column; kept adjacent so the two
#: grammars cannot drift apart silently.
SYNTH_EDGES_SQL = """
    WITH ebase AS (
        SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
        WHERE doc_id % 17 <> 16 AND doc_id % 100 <> 99
        UNION ALL
        SELECT doc_id, doc_id - (doc_id % 100) FROM documents
        WHERE doc_id % 5 = 0 AND doc_id % 100 <> 0
        UNION ALL
        SELECT doc_id, (doc_id - (doc_id % 100)) + (doc_id * 37) % 100 FROM documents
        WHERE doc_id % 23 = 0 AND (doc_id * 37) % 100 <> doc_id % 100
    )
    SELECT e.src, e.dst FROM ebase e
    JOIN (SELECT DISTINCT doc_id FROM documents) n ON n.doc_id = e.dst
"""


def connected_components(
    nodes: DataFrame, edges: DataFrame, id_col: str = "node"
) -> DataFrame:
    """(node, component) for EVERY node, where component = min node id of
    its undirected connected component; edge-less nodes are their own
    singleton component.

    Delegates the propagation to ``dedup.duplicate_clusters`` (adaptive
    driver union-find / distributed pointer-jumping min-label — the same
    engine that resolves duplicate clusters), then left-joins the full
    node set so isolated nodes keep themselves as the label.  The join
    key is node-sized; the corpus table is never part of the iteration.

    ``nodes`` is de-duplicated internally (one hash-agg on the
    node-sized projection), so a caller passing a non-distinct node
    source cannot fan the labeling out — the declared oracles apply
    ``SELECT DISTINCT`` and this keeps engine/oracle parity independent
    of input uniqueness.
    """
    from .dedup import duplicate_clusters

    labels = duplicate_clusters(
        edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    n = nodes.select(F.col(id_col).alias("node")).distinct()
    return n.join(
        labels.select(F.col("id").alias("node"), "cluster_id"), "node", "left"
    ).select(
        "node", F.coalesce("cluster_id", "node").alias("component")
    )


def pagerank_ppm(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    id_col: str = "node",
    dangling: str = "drop",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """(node, rank_ppm) after ``iterations`` synchronous PageRank rounds
    in exact ppm fixed point:

        rank⁰(v)    = 1_000_000
        rankᵗ⁺¹(v)  = tele(v) + (85 · (Σ_{u→v} (rankᵗ(u) DIV outdeg(u)) + extra(v))) DIV 100

    Every operation is integer (DIV floors), so the result is
    bit-identical across engines — the repo's hash-stable convention.
    Intermediates stay far below 2⁶³: Σ contributions ≤ n_nodes·10⁶, so
    the 85× product needs n_nodes < ~10¹⁴.

    ``dangling``: ``"drop"`` (default) loses sink mass — the
    simplification fine when ranks are relative sampling weights on a
    sink-free graph; ``"redistribute"`` adds the standard dangling-mass
    term: each round the sinks' total rank D is re-spread as
    ``extra(v) = D DIV N`` (uniform) or ``D DIV |S|`` over the seed set
    when personalized — real host graphs are full of sinks (pages with
    no outlinks) and dropping their mass deflates every rank.

    ``seeds`` (personalized PageRank, the seeded-crawl form): teleport
    mass concentrates on the seed node set instead of spreading
    uniformly — ``tele(v) = (150_000 · N) DIV |S|`` for seeds, 0
    otherwise (total teleport mass preserved up to the floor).  Seeds
    outside the node set are ignored.

    Plan per round: edges⋈ranks equi-join on src (one shuffle; ranks is
    node-sized), then ONE hash-agg on dst over the UNION of the
    contribution rows and a per-node zero row carrying that node's
    teleport/seed/sink constants — the union rides the same exchange, so
    the former node-sized join back (its own broadcast/shuffle stage per
    round) disappears; map-side combine absorbs hub fan-in.  With
    redistribution, the sink mass is one scalar agg over the PREVIOUS
    round's rank frame filtered on its carried is_sink flag (a column,
    not a per-round semi-join), collected to the driver and folded in as
    a literal (r14; one scalar per round — the standard PageRank
    iteration sync, cheaper than the former single-row cross join's
    extra broadcast stage per round).
    localCheckpoint truncates lineage each round — without it round N's
    plan replays every earlier join.  N and |S| are collected once up
    front (two counts on node-sized frames — loop-invariant literals,
    like the percentile operator's offsets).

    ``nodes`` is de-duplicated up front (one hash-agg, node-sized,
    lineage-pinned so the dedup runs once, not once per round): a
    duplicate node row would otherwise emit duplicate rank rows and
    double-count nothing but break engine/oracle parity (the oracles
    take ``SELECT DISTINCT doc_id``).
    """
    if dangling not in ("drop", "redistribute"):
        raise ValueError(f"dangling must be 'drop'|'redistribute', got {dangling!r}")
    n = (
        nodes.select(F.col(id_col).cast("bigint").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = edges.select(F.col("src").cast("bigint"), F.col("dst").cast("bigint"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # the edges⋈outdeg join is loop-invariant — materialize it ONCE so each
    # round pays a single join (ranks), not two
    ed = e.join(outdeg, "src").localCheckpoint(eager=False)

    redistribute = dangling == "redistribute"
    # per-node LOOP-INVARIANT constants, computed once: teleport mass,
    # seed flag (personalization), sink flag (dangling redistribution).
    # They enter each round as the zero-contribution row of the union
    # aggregation below, so no round ever joins back to the node table.
    if seeds is not None:
        sd = seeds.select(F.col(id_col).cast("bigint").alias("node")).distinct().join(
            n, "node", "left_semi"
        )
        flags = n.join(sd.withColumn("is_seed", F.lit(True)), "node", "left").select(
            "node", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
        ).localCheckpoint(eager=False)
        # ONE job for both loop-invariant scalars (was sd.count() +
        # n.count()); the agg also materializes the lazy checkpoint the
        # base projection below reads
        n_count, s_count = flags.agg(
            F.count(F.lit(1)), F.count(F.when(F.col("is_seed"), F.lit(1)))
        ).first()
        if s_count == 0:
            raise ValueError("personalized PageRank needs >= 1 seed inside the node set")
        base = flags.select(
            "node",
            F.when(F.col("is_seed"), F.lit((TELEPORT_PPM * n_count) // s_count))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("tele"),
            F.col("is_seed").cast("int").alias("seed_i"),
        )
        extra_expr = (
            f"CASE WHEN seed_i = 1 THEN {{dmass}} DIV {s_count} ELSE 0 END"
            if redistribute
            else "0"
        )
    else:
        base = n.select(
            "node",
            F.lit(TELEPORT_PPM).cast("bigint").alias("tele"),
            F.lit(0).alias("seed_i"),
        )
        if redistribute:
            n_count = n.count()
            extra_expr = f"{{dmass}} DIV {n_count}"
        else:
            extra_expr = "0"
    if redistribute:
        base = base.join(
            outdeg.select(F.col("src").alias("node"), F.lit(1).alias("_nz")),
            "node",
            "left",
        ).select(
            "node",
            "tele",
            "seed_i",
            F.when(F.col("_nz").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("sink_i"),
        )
    else:
        base = base.withColumn("sink_i", F.lit(0))
    if seeds is not None or redistribute:
        base = base.localCheckpoint(eager=False)  # joins above are loop-invariant

    rank = base.select(
        "node", F.lit(1_000_000).cast("bigint").alias("rank_ppm"), "sink_i"
    )
    for _ in range(iterations):
        contrib = ed.join(
            rank.select(F.col("node").alias("src"), "rank_ppm"), "src"
        ).select(
            "dst",
            F.expr("rank_ppm DIV outdeg").alias("c"),
            F.lit(None).cast("bigint").alias("tele"),
            F.lit(None).cast("int").alias("seed_i"),
            F.lit(None).cast("int").alias("sink_i"),
            F.lit(0).alias("is_node"),
        )
        zeros = base.select(
            F.col("node").alias("dst"),
            F.lit(0).cast("bigint").alias("c"),
            "tele",
            "seed_i",
            "sink_i",
            F.lit(1).alias("is_node"),
        )
        # ONE exchange per round: the zero rows ride the contribution
        # aggregation, re-supplying every node's constants (max() over the
        # single non-null copy) — nodes without in-edges sum to the zero
        # row's 0, and contributions to non-nodes drop on is_node = 0,
        # exactly the former left-join-back semantics
        agg = (
            contrib.unionByName(zeros)
            .groupBy("dst")
            .agg(
                F.sum("c").alias("s"),
                F.max("tele").alias("tele"),
                F.max("seed_i").alias("seed_i"),
                F.max("sink_i").alias("sink_i"),
                F.max("is_node").alias("is_node"),
            )
            .where(F.col("is_node") == 1)
        )
        if redistribute:
            # sink mass of the PREVIOUS round: a column filter over the
            # checkpointed rank frame, collected as ONE scalar and folded
            # in as a literal (r14) — the former single-row cross join
            # cost a scalar-agg stage + a broadcast build per round; the
            # driver sync per iteration is the standard PageRank loop
            # shape, and the first() also materializes the lazy rank
            # checkpoint the contribution join reads next
            dmass_val = int(
                rank.where(F.col("sink_i") == 1)
                .agg(F.coalesce(F.sum("rank_ppm"), F.lit(0)).cast("bigint"))
                .first()[0]
            )
            extra = extra_expr.format(dmass=dmass_val)
        else:
            extra = extra_expr
        rank = agg.select(
            F.col("dst").alias("node"),
            F.expr(
                f"CAST(tele + ({DAMP_NUM} * (s + ({extra})))"
                f" DIV {DAMP_DEN} AS BIGINT)"
            ).alias("rank_ppm"),
            "sink_i",
        ).localCheckpoint(eager=False)
    return rank.select("node", "rank_ppm")


def pagerank_oracle_sql(iterations: int = 5) -> str:
    """DuckDB mirror of :func:`pagerank_ppm` over the synthesized graph:
    ``iterations`` chained CTEs applying the identical integer
    recurrence (``//`` floors like Spark's DIV on the all-positive
    ranks).  Returns (node, rank_ppm) ordered by node."""
    ctes = [
        "e AS (" + SYNTH_EDGES_SQL + ")",
        "n AS (SELECT DISTINCT doc_id AS node FROM documents)",
        "od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_ppm FROM n)",
    ]
    for t in range(iterations):
        ctes.append(
            f"""r{t + 1} AS (
            SELECT n.node,
                   CAST({TELEPORT_PPM} + ({DAMP_NUM} * COALESCE(s.s, 0)) // {DAMP_DEN} AS BIGINT) AS rank_ppm
            FROM n LEFT JOIN (
                SELECT e.dst, SUM(r.rank_ppm // od.outdeg) AS s
                FROM e JOIN r{t} r ON r.node = e.src JOIN od ON od.src = e.src
                GROUP BY e.dst
            ) s ON s.dst = n.node
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, rank_ppm FROM r{iterations} ORDER BY node"
    )


#: DuckDB mirror of connected_components over the synthesized graph:
#: recursive min-label closure.  Propagation is pruned to strictly
#: decreasing labels (label < dst) — the component-min always survives
#: the prune, so MIN(label) per node is exact while the closure stays
#: ~|component|²/2 rows (components are ≤100 nodes by construction).
CC_ORACLE_SQL = (
    "WITH RECURSIVE e AS ("
    + SYNTH_EDGES_SQL
    + """),
    u AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    n AS (SELECT DISTINCT doc_id AS node FROM documents),
    reach(node, label) AS (
        SELECT node, node FROM n
        UNION
        SELECT u.dst, r.label FROM reach r JOIN u ON u.src = r.node
        WHERE r.label < u.dst
    )
    SELECT node, MIN(label) AS component FROM reach GROUP BY node ORDER BY node"""
)


def cc_fold_in(labels: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Incremental connected components: fold a NEW batch of edges into an
    existing ``(node, component)`` labeling WITHOUT re-touching the old
    edge set — the crawl-N+1 pattern (the graph twin of
    ``dedup.incremental_near_duplicates`` / ``similarity.ivfpq_merge``).

    Correctness: components of G_old ∪ G_new equal the components of the
    SUPER-graph whose vertices are G_old's components (labels) plus
    G_new's endpoints, with one super-edge per new edge joining the two
    endpoint labels.  Labels are component-min node ids, so the merged
    component's min label IS the merged component's min node id — the
    fold-in converges to exactly the from-scratch labeling, which is what
    the declared oracle checks.

    100-TB shape: the old CORPUS and the old EDGES never participate —
    the new batch is relabeled by one node-keyed equi-join against the
    label table, the super-graph is ≤|new batch| edges (resolved by the
    same adaptive engine: driver union-find when tiny, pointer jumping
    above), and the relabel-back is one join ON THE LABEL TABLE keyed by
    old label.  Per fold-in: two node-table joins + one tiny component
    resolution.  Persist ``labels`` as parquet between crawls and this is
    a constant-cost maintenance step per batch.
    """
    from .dedup import duplicate_clusters

    lab = labels.select("node", "component")
    # endpoints of the new batch, labeled: known nodes take their current
    # component, genuinely new nodes label themselves
    def _labeled(col: str) -> DataFrame:
        # distinct BEFORE the label join: one row per endpoint node, so the
        # relabel join below stays 1:1 per edge (a hub with degree d must
        # not fan the batch out d-fold before the super-edge distinct)
        return (
            new_edges.select(F.col(col).alias("node"))
            .distinct()
            .join(lab, "node", "left")
            .select(
                F.col("node"),
                F.coalesce("component", "node").alias("lbl"),
            )
        )

    e = (
        new_edges.join(
            _labeled("src").withColumnsRenamed({"node": "src", "lbl": "la"}), "src"
        )
        .join(_labeled("dst").withColumnsRenamed({"node": "dst", "lbl": "lb"}), "dst")
        .where(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("id_a"), F.col("lb").alias("id_b"))
        .distinct()
    )
    roots = duplicate_clusters(e).select(
        F.col("id").alias("component"), F.col("cluster_id").alias("root")
    )
    new_nodes = (
        new_edges.select(F.col("src").alias("node"))
        .unionAll(new_edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(lab, "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return (
        lab.unionByName(new_nodes)
        .join(roots, "component", "left")
        .select("node", F.coalesce("root", "component").alias("component"))
    )


# ---------------------------------------------------------------------------
# crawl-analysis companions: degree / reciprocity / triangles / k-core
# (the standard host-graph diagnostics published for Common Crawl-scale
# link graphs; each is a constant number of edge-table joins/aggs)
# ---------------------------------------------------------------------------


def degree_histogram(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Degree DISTRIBUTION of the directed graph — one row per
    (kind, degree): how many nodes have that in-/out-/total degree,
    zero-degree nodes included (the histogram every crawl-graph report
    leads with; its shape — power-law tail, hub mass — is what decides
    sampling and skew strategy downstream).

    Plan (r14 single-pass form): ONE edge-sized hash-agg over the
    endpoint union (each edge contributes (src, out) and (dst, in) — the
    same bytes the former out-agg + in-agg shuffled, through one
    exchange), ONE node-sized zero-fill join (both degrees live on the
    same row, so the former out⋈in node join disappears), then ONE
    histogram agg over the 3-row-per-node (kind, degree) explode — the
    former shape ran one histogram agg per kind.  Output is
    histogram-sized (distinct degrees), never node-sized; hub skew still
    lands in map-side combine."""
    n = nodes.select(F.col("node").cast("bigint")).distinct()
    both = edges.select(
        F.col("src").alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionAll(
        edges.select(F.col("dst").alias("node"), F.lit(0).alias("o"), F.lit(1).alias("i"))
    )
    deg = both.groupBy("node").agg(F.sum("o").alias("od"), F.sum("i").alias("id"))
    filled = n.join(deg, "node", "left").select(
        F.coalesce("od", F.lit(0)).cast("bigint").alias("od"),
        F.coalesce("id", F.lit(0)).cast("bigint").alias("id"),
    )
    hist = filled.select(
        F.explode(
            F.array(
                F.struct(F.lit("in").alias("kind"), F.col("id").alias("degree")),
                F.struct(F.lit("out").alias("kind"), F.col("od").alias("degree")),
                F.struct(
                    F.lit("total").alias("kind"),
                    (F.col("od") + F.col("id")).alias("degree"),
                ),
            )
        ).alias("h")
    )
    return hist.groupBy(F.col("h.kind").alias("kind"), F.col("h.degree").alias("degree")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """One-row reciprocity summary of a directed graph: of the distinct
    directed edges, how many have their reverse present — the
    crawl-graph symmetry diagnostic (host graphs are highly asymmetric;
    a reciprocity spike flags mirror/boilerplate link farms).

    ``reciprocity_ppm = 1e6 · |{(u,v): v→u exists}| DIV |E|`` in exact
    integer ppm.  Plan (r14 one-agg form): one distinct on the edge
    table, one self LEFT join on the REVERSED key (shuffle on (dst,src)
    — edge-sized, never quadratic; keys are distinct so the join is
    1:1), then ONE scalar agg counting edges and reverse-marked edges
    together — the former semi-join + two scalar aggs + cross join
    collapsed into a single pass over the joined frame."""
    e = edges.select(
        F.col("src").cast("bigint"), F.col("dst").cast("bigint")
    ).where(F.col("src") != F.col("dst")).distinct()
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("has_rev")
    )
    marked = e.join(rev, ["src", "dst"], "left")
    return marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.count("has_rev").cast("bigint").alias("n_reciprocal"),
    ).select(
        "n_edges",
        "n_reciprocal",
        F.expr(
            "CAST(1000000 * n_reciprocal DIV greatest(n_edges, 1) AS BIGINT)"
        ).alias("reciprocity_ppm"),
    )


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected edge set as (a < b) pairs — self-loops
    dropped, direction and multiplicity folded."""
    s, d = F.col("src").cast("bigint"), F.col("dst").cast("bigint")
    return (
        edges.where(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )


def _undirected_with_degrees(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(u, deg) = distinct undirected edges + per-endpoint degrees, both
    LAZILY checkpointed (r14): every consumer below broadcasts these
    frames under a DIFFERENT build key (deg keyed a, then b; u keyed
    (y, z) for the closing semi-join), and BroadcastExchange reuse only
    fires for identical broadcast modes — so without the pin each
    broadcast build re-ran the distinct + union-agg from the parquet
    scan (measured: four ~0.5 s rebuild jobs per triangle entry)."""
    u = undirected_edges(edges).localCheckpoint(eager=False)
    deg = (
        u.select(F.col("a").alias("v"))
        .unionAll(u.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    return u, deg


def oriented_triangles(
    edges: DataFrame, _ud: tuple[DataFrame, DataFrame] | None = None
) -> DataFrame:
    """Every triangle of the undirected simple graph exactly once, as
    (x, y, z) with y < z numeric and x the (degree, id)-minimum vertex.

    The scale-critical choice is the DEGREE orientation (the standard
    compact-forward / Latapy trick): orient every undirected edge from
    the endpoint with smaller (degree, id) to the larger, making the
    oriented graph acyclic with max out-degree O(√m) on any graph — so
    the wedge join (oriented ⋈ oriented on the middle node) generates
    O(m^{3/2}) candidates TOTAL regardless of hub skew, where an
    id-orientation would square the hottest hub's degree.  Plan: one
    degree agg, two edge-sized equi-joins (wedge build + closing-edge
    semi-join).  Shared by :func:`triangle_counts` (per-block rollup)
    and :func:`clustering_coefficients` (per-node rollup; passes its
    already-checkpointed (u, deg) via ``_ud``)."""
    u, deg = _ud if _ud is not None else _undirected_with_degrees(edges)
    withdeg = (
        u.join(deg.withColumnsRenamed({"v": "a", "deg": "da"}), "a")
        .join(deg.withColumnsRenamed({"v": "b", "deg": "db"}), "b")
    )
    # orient low (degree, id) -> high (degree, id); total order => acyclic
    fwd = withdeg.select(
        F.when(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
        )
        .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
        .alias("e")
    ).select("e.lo", "e.hi")
    # wedges centered on the oriented source: (x->y), (x->z), y != z
    w1 = fwd.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    w2 = fwd.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    wedges = w1.join(w2, "x").where(F.col("y") < F.col("z"))
    # closing edge: {y,z} with y < z numeric is exactly u's (a, b) key
    return wedges.join(
        u.withColumnsRenamed({"a": "y", "b": "z"}), ["y", "z"], "left_semi"
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-block triangle counts of the undirected simple graph —
    (block, n_triangles), block = the 100-block of the triangle's
    smallest node (the grammar keeps components inside blocks, so
    blocks are the natural rollup; a real host graph would group by
    domain/host prefix).  One hash-agg over
    :func:`oriented_triangles`."""
    tri_min = oriented_triangles(edges).select(F.least("x", "y", "z").alias("m"))
    return (
        tri_min.groupBy((F.col("m") - F.col("m") % 100).alias("block"))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .select(F.col("block").cast("bigint"), F.col("n_triangles").cast("bigint"))
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient of the undirected simple
    graph, exact ppm integer: ``cc_ppm = 1e6 · 2·T(v) DIV
    (deg(v)·(deg(v)−1))`` for every node with degree ≥ 2 — the
    organic-neighborhood-vs-spam-spray diagnostic published alongside
    triangle counts for crawl host graphs (a link farm has huge degree
    and near-zero closure; a genuine community closes).

    Per-node triangle incidence comes from exploding each oriented
    triangle to its three corners (output is 3·T rows — triangle-sized,
    not wedge-sized) and one hash-agg; degrees reuse the checkpointed
    endpoint-degree frame the orientation already computed (r14 — the
    former shape re-ran the distinct + union-agg); the join-up is
    node-sized.  Returns (node, degree, n_triangles, cc_ppm) — every
    term integer, hash-stable."""
    u, deg0 = _undirected_with_degrees(edges)
    deg = deg0.select(F.col("v").alias("node"), F.col("deg").alias("degree"))
    corners = oriented_triangles(edges, _ud=(u, deg0)).select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    tri = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        deg.where(F.col("degree") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            F.col("degree").cast("bigint"),
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.expr(
                "CAST(1000000 * 2 * coalesce(n_triangles, 0)"
                " DIV (degree * (degree - 1)) AS BIGINT)"
            ).alias("cc_ppm"),
        )
    )


def kcore(
    nodes: DataFrame, edges: DataFrame, k: int = 2, rounds: int = 12
) -> DataFrame:
    """Nodes surviving ``rounds`` synchronous peeling rounds toward the
    k-core of the UNDIRECTED simple graph: each round drops every node
    whose degree among surviving nodes is < k (the classic iterative
    peel; the k-core is its fixpoint).  A FIXED round count is the
    declared form so the DuckDB oracle can replay it as chained CTEs —
    on the synthesized grammar the peel provably stabilizes well inside
    12 rounds (dangling chain stubs are ≤ ~9 nodes; the engine-side
    fixpoint is asserted in tests), and a real deployment would loop
    to emptiness of the dropped set.

    Per round: two alive-semi-joins restricting the LIVE edge set + one
    degree hash-agg — all edge-sized, lineage truncated per round
    (localCheckpoint; swap in checkpoint() on a cluster).  The live set
    is carried ACROSS rounds (alive sets only shrink during a peel, so
    filtering last round's survivor edges by this round's alive set
    equals re-filtering the full edge table): every round's joins and
    degree agg run over a monotonically shrinking frame instead of the
    full edge list 12 times.

    Early fixpoint stop (r14): the alive set is monotone shrinking, so
    an unchanged COUNT between rounds means an unchanged SET, and every
    remaining round is the identity — the declared ``rounds``-round
    result equals the fixpoint already in hand.  Each executed round
    pays one node-sized count (it materializes the lazy checkpoint the
    next round would have materialized anyway); every round after
    stabilization — previously a no-op-shaped but still-scheduled chain
    of joins and aggregates — is skipped outright.  This is the "loop
    to emptiness of the dropped set" form a real deployment runs, with
    the count as the emptiness probe."""
    u = undirected_edges(edges).localCheckpoint(eager=False)
    live = u.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(
        u.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    alive = nodes.select(F.col("node").cast("bigint")).distinct()
    prev_count: int | None = None
    for _ in range(rounds):
        live = (
            live.join(alive.withColumnRenamed("node", "v"), "v", "left_semi")
            .join(alive.withColumnRenamed("node", "w"), "w", "left_semi")
            .localCheckpoint(eager=False)
        )
        deg = live.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        alive = (
            deg.where(F.col("deg") >= k)
            .select(F.col("v").alias("node"))
            .localCheckpoint(eager=False)
        )
        cnt = alive.count()
        if cnt == prev_count or cnt == 0:
            break  # fixpoint: all remaining rounds are the identity
        prev_count = cnt
    return alive


def synthesize_back_edges(edges: DataFrame) -> DataFrame:
    """Deterministic reciprocal augmentation for the reciprocity
    diagnostic: every chain edge ``i → i+1`` with ``i ≡ 0 (mod 7)``
    gains its reverse.  ``dst = src + 1`` identifies chain edges
    uniquely in the synthesized grammar (stars never target src+1 —
    block starts aren't ≡ 0 mod 5 offsets — and the long-range residue
    equation 36·i ≡ 1 (mod 100) has no solution); endpoints are already
    validated because the input edges are.  Without this the grammar's
    reciprocity is 0 and the metric would be vacuous."""
    chain = edges.where((F.col("src") % 7 == 0) & (F.col("dst") == F.col("src") + 1))
    return edges.unionAll(
        chain.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


#: oracle mirror of synthesize_back_edges, applied to a CTE named allE
BACK_EDGES_SQL = """
    SELECT src, dst FROM allE
    UNION ALL
    SELECT dst AS src, src AS dst FROM allE WHERE src % 7 = 0 AND dst = src + 1
"""


def synthesize_shortcut_edges(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic triangle-closing augmentation: ``i → i+2`` for
    ``i ≡ 0 (mod 3)``, staying inside the 100-block, target-validated —
    together with the chain edges this plants a triangle (i, i+1, i+2)
    wherever both chain links survive the break rule, so the triangle
    count is non-vacuous at every scale."""
    i = F.col(id_col).cast("bigint")
    sc = docs.where((i % 3 == 0) & (i % 100 < 98)).select(
        i.alias("src"), (i + 2).alias("dst")
    )
    ids = docs.select(i.alias("dst")).distinct()
    return sc.join(ids, "dst", "inner").select("src", "dst")


#: oracle mirror of synthesize_shortcut_edges
SHORTCUT_EDGES_SQL = """
    SELECT s.src, s.dst FROM (
        SELECT doc_id AS src, doc_id + 2 AS dst FROM documents
        WHERE doc_id % 3 = 0 AND doc_id % 100 < 98
    ) s JOIN (SELECT DISTINCT doc_id FROM documents) n ON n.doc_id = s.dst
"""


#: degree-histogram oracle over the synthesized graph
DEGREES_ORACLE_SQL = (
    "WITH e AS ("
    + SYNTH_EDGES_SQL
    + """),
    n AS (SELECT DISTINCT doc_id AS node FROM documents),
    fo AS (SELECT n.node, COALESCE(o.d, 0) AS d FROM n
           LEFT JOIN (SELECT src, COUNT(*) AS d FROM e GROUP BY src) o ON o.src = n.node),
    fi AS (SELECT n.node, COALESCE(i.d, 0) AS d FROM n
           LEFT JOIN (SELECT dst, COUNT(*) AS d FROM e GROUP BY dst) i ON i.dst = n.node),
    tot AS (SELECT fo.node, fo.d + fi.d AS d FROM fo JOIN fi ON fi.node = fo.node)
    SELECT kind, degree, n_nodes FROM (
        SELECT 'in' AS kind, d AS degree, COUNT(*) AS n_nodes FROM fi GROUP BY d
        UNION ALL
        SELECT 'out', d, COUNT(*) FROM fo GROUP BY d
        UNION ALL
        SELECT 'total', d, COUNT(*) FROM tot GROUP BY d
    ) ORDER BY kind, degree"""
)


#: reciprocity oracle over the back-edge-augmented graph
RECIPROCITY_ORACLE_SQL = (
    "WITH e AS ("
    + SYNTH_EDGES_SQL
    + "), allE AS (SELECT src, dst FROM e), aug AS ("
    + BACK_EDGES_SQL
    + """),
    d AS (SELECT DISTINCT src, dst FROM aug WHERE src <> dst),
    r AS (SELECT COUNT(*) AS n_reciprocal FROM d
          WHERE EXISTS (SELECT 1 FROM d r2 WHERE r2.src = d.dst AND r2.dst = d.src))
    SELECT CAST(t.n_edges AS BIGINT) AS n_edges,
           CAST(r.n_reciprocal AS BIGINT) AS n_reciprocal,
           CAST(1000000 * r.n_reciprocal // greatest(t.n_edges, 1) AS BIGINT) AS reciprocity_ppm
    FROM (SELECT COUNT(*) AS n_edges FROM d) t, r"""
)


#: per-block triangle-count oracle over the shortcut-augmented graph,
#: replaying the same degree orientation (least (deg, id) endpoint ->
#: greatest) so both engines enumerate identical wedge sets
TRIANGLES_ORACLE_SQL = (
    "WITH e AS ("
    + SYNTH_EDGES_SQL
    + "), sc AS ("
    + SHORTCUT_EDGES_SQL
    + """),
    allE AS (SELECT src, dst FROM e UNION ALL SELECT src, dst FROM sc),
    u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM allE WHERE src <> dst),
    deg AS (SELECT v, COUNT(*) AS deg
            FROM (SELECT a AS v FROM u UNION ALL SELECT b FROM u) GROUP BY v),
    fwd AS (SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                        THEN u.a ELSE u.b END AS lo,
                   CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                        THEN u.b ELSE u.a END AS hi
            FROM u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b),
    tri AS (SELECT w1.lo AS x, w1.hi AS y, w2.hi AS z
            FROM fwd w1 JOIN fwd w2 ON w2.lo = w1.lo AND w1.hi < w2.hi
            WHERE EXISTS (SELECT 1 FROM u WHERE u.a = w1.hi AND u.b = w2.hi)),
    m AS (SELECT least(x, y, z) AS mn FROM tri)
    SELECT CAST(mn - mn % 100 AS BIGINT) AS block,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM m GROUP BY 1 ORDER BY block"""
)


def kcore_oracle_sql(k: int = 2, rounds: int = 12) -> str:
    """DuckDB mirror of :func:`kcore`: the peel unrolled as chained CTEs
    — round t's survivors are nodes whose degree among round t-1's
    survivors is >= k."""
    # AS MATERIALIZED: each round references the previous one TWICE; an
    # inlining planner would otherwise expand the chain 2^rounds times
    # (observed: DuckDB re-opening the parquet thousands of times)
    ctes = [
        "e AS MATERIALIZED (" + SYNTH_EDGES_SQL + ")",
        "u AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b"
        " FROM e WHERE src <> dst)",
        "bo AS MATERIALIZED (SELECT a AS v, b AS w FROM u UNION ALL SELECT b, a FROM u)",
        "n0 AS MATERIALIZED (SELECT DISTINCT doc_id AS node FROM documents)",
    ]
    for t in range(rounds):
        ctes.append(
            f"""n{t + 1} AS MATERIALIZED (
            SELECT bo.v AS node FROM bo
            JOIN n{t} x ON x.node = bo.v JOIN n{t} y ON y.node = bo.w
            GROUP BY bo.v HAVING COUNT(*) >= {k}
        )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node FROM n{rounds} ORDER BY node"
    )


def pagerank_ext_oracle_sql(
    iterations: int = 5, dangling: str = "redistribute", seeded: bool = False
) -> str:
    """DuckDB mirror of :func:`pagerank_ppm` with dangling-mass
    redistribution and (optionally) personalization over the synthesized
    graph — seeds are the block-start hubs (``doc_id % 100 = 0``), the
    seeded-crawl form.  Chained CTEs replay the identical integer
    recurrence; every CTE is MATERIALIZED because each round references
    the previous rank table twice (dangling scalar + contributions) and
    an inlining planner would expand the chain 2^iterations times."""
    ctes = [
        "e AS MATERIALIZED (" + SYNTH_EDGES_SQL + ")",
        "n AS MATERIALIZED (SELECT DISTINCT doc_id AS node FROM documents)",
        "od AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "nn AS MATERIALIZED (SELECT COUNT(*) AS nc FROM n)",
        "r0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS rank_ppm FROM n)",
    ]
    if dangling == "redistribute":
        ctes.append(
            "sinks AS MATERIALIZED (SELECT n.node FROM n"
            " LEFT JOIN od ON od.src = n.node WHERE od.src IS NULL)"
        )
    if seeded:
        ctes.append("sd AS MATERIALIZED (SELECT node FROM n WHERE node % 100 = 0)")
        ctes.append("sc AS MATERIALIZED (SELECT COUNT(*) AS k FROM sd)")
        tele = f"CASE WHEN sd.node IS NOT NULL THEN ({TELEPORT_PPM} * nn.nc) // sc.k ELSE 0 END"
        extra = (
            "CASE WHEN sd.node IS NOT NULL THEN d.dm // sc.k ELSE 0 END"
            if dangling == "redistribute"
            else "0"
        )
    else:
        tele = f"{TELEPORT_PPM}"
        extra = "d.dm // nn.nc" if dangling == "redistribute" else "0"
    for t in range(iterations):
        tail = ", nn"
        if dangling == "redistribute":
            ctes.append(
                f"d{t} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank_ppm), 0) AS dm"
                f" FROM r{t} r JOIN sinks s ON s.node = r.node)"
            )
            tail += f", d{t} d"
        if seeded:
            tail += ", sc"
        seed_join = " LEFT JOIN sd ON sd.node = n.node" if seeded else ""
        ctes.append(
            f"""r{t + 1} AS MATERIALIZED (
            SELECT n.node,
                   CAST(({tele}) + ({DAMP_NUM} * (COALESCE(s.s, 0) + ({extra}))) // {DAMP_DEN} AS BIGINT) AS rank_ppm
            FROM n LEFT JOIN (
                SELECT e.dst, SUM(r.rank_ppm // od.outdeg) AS s
                FROM e JOIN r{t} r ON r.node = e.src JOIN od ON od.src = e.src
                GROUP BY e.dst
            ) s ON s.dst = n.node{seed_join}{tail}
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, rank_ppm FROM r{iterations} ORDER BY node"
    )


#: per-node clustering-coefficient oracle over the shortcut-augmented
#: graph — replays the identical degree orientation, then rolls the
#: triangle corners up per node instead of per block
CLUSTERING_ORACLE_SQL = (
    "WITH e AS ("
    + SYNTH_EDGES_SQL
    + "), sc AS ("
    + SHORTCUT_EDGES_SQL
    + """),
    allE AS (SELECT src, dst FROM e UNION ALL SELECT src, dst FROM sc),
    u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM allE WHERE src <> dst),
    deg AS (SELECT v, COUNT(*) AS deg
            FROM (SELECT a AS v FROM u UNION ALL SELECT b FROM u) GROUP BY v),
    fwd AS (SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                        THEN u.a ELSE u.b END AS lo,
                   CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                        THEN u.b ELSE u.a END AS hi
            FROM u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b),
    tri AS (SELECT w1.lo AS x, w1.hi AS y, w2.hi AS z
            FROM fwd w1 JOIN fwd w2 ON w2.lo = w1.lo AND w1.hi < w2.hi
            WHERE EXISTS (SELECT 1 FROM u WHERE u.a = w1.hi AND u.b = w2.hi)),
    corners AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri),
    tc AS (SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node)
    SELECT d.v AS node, CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(1000000 * 2 * COALESCE(tc.n_triangles, 0)
                // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_ppm
    FROM deg d LEFT JOIN tc ON tc.node = d.v
    WHERE d.deg >= 2 ORDER BY node"""
)


#: component-size-histogram oracle: the recursive min-label closure of
#: CC_ORACLE_SQL rolled up twice (size per component, then components
#: per size) — singleton (edge-less) nodes included
COMPONENT_SIZES_ORACLE_SQL = (
    "WITH RECURSIVE e AS ("
    + SYNTH_EDGES_SQL
    + """),
    u AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    n AS (SELECT DISTINCT doc_id AS node FROM documents),
    reach(node, label) AS (
        SELECT node, node FROM n
        UNION
        SELECT u.dst, r.label FROM reach r JOIN u ON u.src = r.node
        WHERE r.label < u.dst
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    cs AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
    SELECT CAST(sz AS BIGINT) AS component_size,
           CAST(COUNT(*) AS BIGINT) AS n_components
    FROM cs GROUP BY sz ORDER BY component_size"""
)


def harmonic_truncated(edges: DataFrame, radius: int = 6) -> DataFrame:
    """Harmonic centrality truncated at ``radius`` hops, exact integer:
    ``harmonic_ppm(v) = Σ_{u: 0 < d(u→v) ≤ R} (1_000_000 DIV d(u→v))``
    over directed shortest distances INTO v, plus ``n_sources`` (the
    reachers) — the centrality family Common Crawl actually publishes
    for its host graph (harmonic ranks next to PageRank).  Truncation is
    the published within-k-hops form AND the bounded-compute form: the
    distance table holds one row per (source, node) pair within the
    radius — O(N · |ball_R|) rows, ball-bounded, never N².

    Plan: R−1 rounds of FRONTIER-DELTA expansion (the BFS invariant: a
    pair first reachable in round r has shortest distance exactly r, so
    only pairs DISCOVERED last round need expanding) — per round ONE
    equi-join of the frontier (not the whole distance table) against the
    edge list, one distinct, and one (u, v) anti-join against the
    accumulated table; lineage truncated per round.  The former
    re-expand-everything form joined ALL accumulated pairs against the
    edges every round and min-folded away the rediscoveries — correct,
    but ~R× more join probes at radius R.  Returns only nodes with ≥1
    in-radius source, ordered by the caller.

    100-TB note: exact truncated harmonic is the declared oracle-backed
    form; FULL-radius harmonic on an unbounded graph is the HyperANF
    shape — per-node HLL neighborhood sketches unioned per round
    (Spark's ``hll_sketch_agg``/``hll_union_agg`` are the JVM-side
    aggregates to build it on) — approximate by construction, so it
    cannot be a hash-checked entry."""
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    e = (
        edges.select(F.col("src").cast("bigint"), F.col("dst").cast("bigint"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    frontier = e.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1).cast("int").alias("d")
    )
    dist = frontier
    for r in range(1, radius):
        cand = (
            frontier.join(e.withColumnsRenamed({"src": "v", "dst": "w"}), "v")
            .where(F.col("w") != F.col("u"))
            .select("u", F.col("w").alias("v"))
            .distinct()
        )
        # pairs seen in ANY earlier round already hold their (smaller) BFS
        # distance — only genuinely new pairs enter, at distance r + 1
        frontier = (
            cand.join(dist, ["u", "v"], "left_anti")
            .select("u", "v", F.lit(r + 1).cast("int").alias("d"))
            .localCheckpoint(eager=False)
        )
        # dist is a union of per-round checkpointed frontiers (disjoint by
        # construction): no min-fold needed, and no extra materialization
        dist = dist.unionByName(frontier)
    return dist.groupBy(F.col("v").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum(F.expr("1000000 DIV d")).cast("bigint").alias("harmonic_ppm"),
    )


def harmonic_oracle_sql(radius: int = 6) -> str:
    """DuckDB mirror of :func:`harmonic_truncated` over the synthesized
    graph: a bounded recursive closure enumerating (u, v, d) walks up to
    the radius (UNION-deduped, so ≤ R·|ball| rows per source), min-folded
    per pair, then the harmonic rollup."""
    return (
        "WITH RECURSIVE e AS ("
        + SYNTH_EDGES_SQL
        + f"""),
    walk(u, v, d) AS (
        SELECT src, dst, 1 FROM e WHERE src <> dst
        UNION
        SELECT w.u, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.v
        WHERE w.d < {radius} AND e.dst <> w.u
    ),
    m AS (SELECT u, v, MIN(d) AS d FROM walk GROUP BY u, v)
    SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(1000000 // d) AS BIGINT) AS harmonic_ppm
    FROM m GROUP BY v ORDER BY node"""
    )
