"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (multi-way join Q4) at sf0.001.
``queries()`` exposes every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
equivalent for the hash-compared correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q4_multiway_join"](spark, "/root/testdata/sf0.001")


def _current_round() -> int:
    """Infer the build round from driver artifacts already on disk.

    The driver writes ``CORRECTNESS_r{N}.json`` at the END of round N, so
    at gate time for round N the files r1..r(N-1) exist.  This gives the
    rotation below real state to key on (the round-3 sort was stateless,
    so "rotate next round" could never actually happen).
    """
    import pathlib
    import re

    here = pathlib.Path(__file__).resolve().parent
    rounds = [0]
    for p in here.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r0*(\d+)", p.stem)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


#: Entries whose PHYSICAL PLAN was restructured in the named round (the
#: optimization rounds re-plan queries without changing what they
#: compute).  A green driver row earned under the OLD plan does not
#: vouch for the new one (VERDICT r13 item 2), so each of these ranks
#: "never verified" — front of the 50-slot window — until it earns a
#: fresh green row in a driver round >= the re-plan round.
#:
#: INVARIANT (ADVICE r14): the gate is round-granular, so a green row
#: recorded EARLIER IN THE SAME ROUND as a later re-plan would wrongly
#: count for the new plan.  Whoever lands a same-round re-plan must
#: regenerate the round's correctness artifact AFTER the last plan
#: commit (r14 did: CORRECTNESS_r14.json postdates pass 5), or bump the
#: entry to the NEXT round number here.
REPLANNED: dict[str, int] = {
    # r13: de-windowed via ntile_exact (old green rows predate the plan)
    # + r14: ntile_exact bucket arithmetic moved to integer DIV
    "q49_ntile_deciles": 14,
    # r13 de-window + r14 bounded per-partition top-k (windowed prune)
    "ops_curriculum_order": 14,
    # r14 optimization re-plans (see OPTIMIZATION_r14.md)
    "ops_graph_harmonic": 14,       # frontier-delta BFS expansion
    "ops_graph_kcore": 14,          # shrinking live-edge set + early fixpoint stop
    "ops_pagerank": 14,             # union-agg round (no join-back)
    "ops_pagerank_dangling": 14,    # + sink flag instead of semi-join
    "ops_pagerank_personalized": 14,
    "ops_lsh_eval": 14,             # ground-truth arm checkpointed
    "ops_sequence_pack": 14,        # tail-waste zero-denominator guard
    "ops_pmi_collocations": 14,     # one scan: unigrams ride the pair agg
    "ops_mixture_apply": 14,        # one agg: 0..n_copies explode, no join
    "ops_graph_degrees": 14,        # one union-agg + one exploded histogram agg
    "ops_graph_reciprocity": 14,    # one left-join agg, no semi-join/cross join
    # r14: exact-money arithmetic moved from per-row decimal products to
    # bigint-cents fixed point (same rational values — _fixed_money)
    "tpch_q01": 14,
    "tpch_q03": 14,
    "tpch_q05": 14,
    "tpch_q06": 14,
    "tpch_q07": 14,
    "tpch_q08": 14,
    "tpch_q09": 14,
    "tpch_q10": 14,
    "tpch_q14": 14,
    "tpch_q15": 14,
    "tpch_q19": 14,
    "q3_hash_agg_having": 14,
    "q4_multiway_join": 14,
    # r14 pass-2 batch-2 re-plans
    "q30_exact_percentiles": 14,     # distributed rank-selection, no 1-reducer buffer
    "ops_exact_substring_dedup": 14,  # scan spread before the gram fan-out
    "ops_fuzzy_join_indel": 14,       # scan spread before the q-gram fan-out
    "ops_graph_triangles": 14,        # shared checkpointed (u, deg) frames
    "ops_graph_clustering": 14,
    # r14 pass-3: single-pass pair-member fetch (verify_jaccard/-_counts,
    # embedding verify), KN model pin, bm25_multi shared scan + docs pin
    "ops_embedding_near_dup": 14,
    "ops_minhash_near_dup": 14,
    "ops_incremental_dedup": 14,
    "ops_dedup_pipeline": 14,
    "ops_leakage_safe_split": 14,
    "ops_kn_perplexity": 14,
    "ops_ccnet_kn_buckets": 14,
    "ops_kn_lm_train": 14,
    "ops_bm25": 14,
    "ops_hybrid_retrieval": 14,
    "ops_contrastive_pairs": 14,
    # r14 pass-5: remaining per-row decimal casts/products moved to
    # bigint-cents fixed point (_cents100/_fixed_money — same rational
    # values, long arithmetic per row; tpch_q06/q03/q49 were already listed)
    "q11_window_frame": 14,
    "q19_math_conditional": 14,
    "q26_tumbling_window": 14,
    "q28_session_window": 14,
    "q40_cond_agg": 14,
    "tpch_q11": 14,
    "tpch_q17": 14,
    "tpch_q18": 14,
    "tpch_q20": 14,
    "ops_sessionize": 14,
    # r15 pass-1: fused signature+banding mapInPandas (minhash_banded_np),
    # lazy exploded-pair pin + spread shingle scan in verify_jaccard*/
    # duplicate_clusters, lsh_eval merged one-job stats
    "ops_minhash_near_dup": 15,
    "ops_dedup_pipeline": 15,
    "ops_leakage_safe_split": 15,
    "ops_incremental_dedup": 15,
    "ops_lsh_eval": 15,
    "ops_cc_incremental": 15,
    # r15 pass-2: wordpiece encode pre-aggregates per (doc, word) before
    # the doc rollup (bit-identical md5 input via array_repeat)
    "ops_wordpiece_encode": 15,
    # r15 pass-3: one-corpus-pass pins — the scored/hashed per-doc
    # projection is lazily checkpointed so every consumer reads the same
    # narrow frame instead of re-scanning text (4->1 scans for
    # token_budget_select; 2->1 for the others)
    "ops_token_budget_select": 15,
    "ops_mixture_apply": 15,
    "ops_soft_dedup": 15,
    "ops_corpus_card": 15,
    # r15 pass-3: ivf_train carries the centroid matrix driver-side
    # across Lloyd rounds (bit-exact; the per-iteration local-frame
    # round-trip was pure py4j overhead) — registered out of caution,
    # all five strict-verified at sf0.001/0.01/0.1
    "ops_knn_ivf": 15,
    "ops_knn_ivfpq": 15,
    "ops_knn_index_probe": 15,
    "ops_embedding_cluster": 15,
    "ops_semantic_dedup": 15,
    # r14 pass-4: spread CPU-bound one-split scans; cube sum in bigint cents
    "ops_cube_agg": 14,
    "ops_hll_sketch": 14,
    "ops_cms_heavy_hitters": 14,
    "ops_langid": 14,
    "ops_langid_train": 14,
    "ops_curation_funnel": 14,
    "ops_curation_funnel_langid": 14,
    "ops_curation_funnel_gopher": 14,
}


def _gate_history() -> tuple[set[str], set[str]]:
    """(green, visited) query names across all prior driver rounds.

    ``green``   = at least one row with rows matched, no error, and the
                  value hash matching when the driver computed one —
                  EXCLUDING entries whose physical plan was restructured
                  after their last green row (``REPLANNED``): those must
                  re-earn verification under the new plan.
    ``visited`` = green, PLUS entries the driver ran but structurally
                  cannot hash-verify (``err: "no_oracle"`` — the driver
                  records rows-only entries that way, with
                  ``rows_match: null``).  Without the second set the
                  rows-only entries rank "never verified" forever and
                  permanently occupy the front of the 50-slot window
                  (VERDICT r5 item 2a): one gate visit is all the check
                  they can ever earn, so one visit retires them from the
                  front tier.
    """
    import json
    import pathlib
    import re

    here = pathlib.Path(__file__).resolve().parent
    green: set[str] = set()
    visited: set[str] = set()
    for p in here.glob("CORRECTNESS_r*.json"):
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        m = re.match(r"CORRECTNESS_r0*(\d+)", p.stem)
        rnd = int(m.group(1)) if m else 0
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                if rnd >= REPLANNED.get(name, 0):
                    green.add(name)
                    visited.add(name)
            elif row.get("err") == "no_oracle":
                visited.add(name)
    return green, visited


def _ever_green() -> set[str]:
    """Back-compat shim: names with ≥1 green driver row (see _gate_history)."""
    return _gate_history()[0]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registered queries, ordered for the 50-entry correctness gate.

    The gate walks this dict in order and checks exactly the first 50
    entries.  Ordering is history-driven: entries that have NEVER had a
    green row in any prior ``CORRECTNESS_r*.json`` come first (oracle-
    backed before rows-only, name-sorted), so every entry eventually earns
    an independent driver verification.  The already-verified remainder
    rotates on a round-keyed schedule (even rounds: ops first; odd
    rounds: Q1.. first) so re-verification coverage alternates too.

    Either way ``tests/test_queries.py`` strict-compares all oracle-backed
    entries every round, so ordering only affects which slice gets the
    driver's independent re-verification this round.
    """
    import re

    ops_first = _current_round() % 2 == 0
    green, visited = _gate_history()

    def rank(item):
        name = item[0]
        # Front of the window: entries that can still earn a NEW driver
        # verdict — oracle-backed with no green row ever (includes entries
        # newly promoted from rows-only to oracle-backed), and rows-only
        # entries the gate has never even run.  A rows-only entry WITH a
        # prior no_oracle row has received all the checking the driver can
        # give it, so it drops to the rotation tier instead of pinning the
        # front forever.
        if (name in ORACLE and name not in green) or name not in visited:
            return (0, 0 if name in ORACLE else 1, 0, name)
        m = re.match(r"^q(\d+)", name)
        if m:
            return (1, 2 if ops_first else 0, int(m.group(1)), name)
        return (1, (0 if ops_first else 1) + (0 if name in ORACLE else 1), 0, name)

    return dict(sorted(QUERIES.items(), key=lambda it: rank(it)))


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
