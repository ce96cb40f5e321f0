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
) -> DataFrame:
    """(node, rank_ppm) after ``iterations`` synchronous PageRank rounds
    in exact ppm fixed point:

        rank⁰(v)    = 1_000_000
        rankᵗ⁺¹(v)  = 150_000 + (85 · Σ_{u→v} (rankᵗ(u) DIV outdeg(u))) DIV 100

    Every operation is integer (DIV floors), so the result is
    bit-identical across engines — the repo's hash-stable convention.
    Dangling nodes (outdeg 0) simply contribute nothing, the standard
    simplification when ranks are used as relative sampling weights.
    Intermediates stay far below 2⁶³: Σ contributions ≤ n_nodes·10⁶, so
    the 85× product needs n_nodes < ~10¹⁴.

    Plan per round: edges⋈ranks equi-join on src (one shuffle; ranks is
    node-sized), hash-agg on dst (map-side combine absorbs hub fan-in),
    node-sized left join back.  localCheckpoint truncates lineage each
    round — without it round N's plan replays every earlier join.

    ``nodes`` is de-duplicated up front (one hash-agg, node-sized,
    lineage-pinned so the dedup runs once, not once per round): a
    duplicate node row would otherwise emit duplicate rank rows and
    double-count nothing but break engine/oracle parity (the oracles
    take ``SELECT DISTINCT doc_id``).
    """
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
    rank = n.withColumn("rank_ppm", F.lit(1_000_000).cast("bigint"))
    for _ in range(iterations):
        contrib = ed.join(rank.withColumnRenamed("node", "src"), "src").select(
            "dst", F.expr("rank_ppm DIV outdeg").alias("c")
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        rank = (
            n.join(incoming.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({TELEPORT_PPM} + ({DAMP_NUM} * coalesce(s, 0)) DIV {DAMP_DEN} AS BIGINT)"
                ).alias("rank_ppm"),
            )
            .localCheckpoint(eager=False)
        )
    return rank


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
