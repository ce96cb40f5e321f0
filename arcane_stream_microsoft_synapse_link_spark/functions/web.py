"""URL-level curation: canonicalization, URL dedup, per-host caps.

The stage-zero of every public web-crawl pipeline: RefinedWeb (Penedo et
al. 2023 §3.1) filters and deduplicates on the URL before touching text;
C4 (Raffel et al. 2020) and Gopher/MassiveText cap how much any one
domain contributes; CCNet shards by URL.  The engine already had every
TEXT-level stage (quality, langid, dedup) but nothing URL-level — these
operators close that gap.

The driver corpus carries no URL column, so the declared queries
synthesize deterministic URLs from ``(doc_id, source)`` — see
:func:`synthesize_url` — identically on the engine and DuckDB-oracle
sides.  Canonicalization / dedup / cap logic then operates only on the
URL string, so the machinery is exactly what a real crawl table (which
ships a ``url`` column) would exercise.

Reference parity: the reference ingests CDM change folders, not crawls
(``src/main/scala/.../StreamRunner.scala``); this family belongs to the
training-data extension surface (SURVEY §2, LLM-pipeline ops).

100-TB shape: canonicalization is a pure codegen'd projection (regex +
array expressions, no Python, no shuffle); URL dedup is ONE hash
aggregation on the canonical key with a mergeable arg-max (map-side
combine applies; the canonical-key space is far smaller than the
corpus); the per-host cap is stated as a window here (the honest
declared form) with the map-side threshold alternative documented on
:func:`host_cap`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization (the public
# "tracking params" core set: UTM campaign tags + click identifiers).
TRACKING_PARAM_RE = "^(utm_[^=]*|ref|fbclid|gclid)="

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def synthesize_url(doc_id: Column, source: Column) -> Column:
    """Deterministic synthetic URL for a corpus row (both the engine and
    the DuckDB oracle build exactly this string, so every later stage is
    compared on identical input).

    The grammar deliberately exercises every canonicalization rule:
    upper-case scheme and host, a ``www.`` prefix (doc_id % 7), an
    explicit default port (% 5), a trailing slash (% 13), three query
    shapes (% 3: utm-wrapped id / id plus social ref / none), and a
    fragment (% 11).  Path and id moduli (7, 5) are chosen so distinct raw URLs
    collide after canonicalization at every corpus scale (~44% duplicate
    rows at sf0.01), which is what url_dedup is for.
    """
    did = doc_id.cast("bigint")
    s = F.lit
    return F.concat(
        s("HTTPS://"),
        F.when(did % 7 == 0, s("WWW.")).otherwise(s("")),
        F.upper(source),
        s(".Example.COM"),
        F.when(did % 5 == 0, s(":443")).otherwise(s("")),
        s("/articles/"),
        (did % 7).cast("string"),
        F.when(did % 13 == 0, s("/")).otherwise(s("")),
        F.when(did % 3 == 0, F.concat(s("?utm_source=feed&id="), (did % 5).cast("string"), s("&utm_campaign=x")))
        .when(did % 3 == 1, F.concat(s("?id="), (did % 5).cast("string"), s("&ref=tw&utm_medium=social")))
        .otherwise(s("")),
        F.when(did % 11 == 0, s("#section-2")).otherwise(s("")),
    )


# The oracle-side mirror of synthesize_url, kept adjacent so the two
# grammars cannot drift apart silently.
SYNTH_URL_SQL = """
    'HTTPS://'
    || CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END
    || upper(source) || '.Example.COM'
    || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
    || '/articles/' || CAST(doc_id % 7 AS VARCHAR)
    || CASE WHEN doc_id % 13 = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR) || '&utm_campaign=x'
            WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 5 AS VARCHAR) || '&ref=tw&utm_medium=social'
            ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END
"""


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL, as one codegen'd expression tree (no UDF,
    no shuffle — Catalyst folds the whole thing into the projection):

    1. scheme and host lower-cased;
    2. a leading ``www.`` stripped from the host;
    3. the scheme's default port dropped (``:443`` for https, ``:80``
       for http); any other explicit port kept;
    4. the fragment dropped;
    5. tracking query parameters dropped (``utm_*``, ``ref``,
       ``fbclid``, ``gclid``);
    6. surviving query parameters sorted byte-wise and re-joined;
    7. trailing slashes stripped from the path (root path becomes
       empty, matching the no-path form).

    These are the publicly documented crawl-dedup conventions (RFC 3986
    §6 syntax-based normalization plus the tracking-param strip every
    crawl pipeline applies); URLs that differ only in these respects
    fetch the same resource.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[^:]+://([^/?#]*)", 1))
    host = F.regexp_replace(F.regexp_replace(hostport, r":[0-9]+$", ""), r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_replace(F.regexp_extract(url, r"^[^:]+://[^/?#]*([^?#]*)", 1), r"/+$", "")
    # Anchored to the pre-fragment substring: a '?' that first appears
    # inside the fragment (e.g. https://e.com/a#x?q=1) is NOT a query.
    query = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & (~x.rlike(TRACKING_PARAM_RE)),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    keep_port = (port != "") & ~(
        ((scheme == "https") & (port == "443")) | ((scheme == "http") & (port == "80"))
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


# DuckDB mirror of canonicalize_url (same rule set, DuckDB list lambdas).
# Expects a CTE column named ``url``.
CANON_URL_SQL = r"""
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) || '://'
    || regexp_replace(
           regexp_replace(lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)), ':[0-9]+$', ''),
           '^www\.', '')
    || CASE WHEN regexp_extract(lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)), ':([0-9]+)$', 1) <> ''
             AND NOT ((lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) = 'https'
                       AND regexp_extract(lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)), ':([0-9]+)$', 1) = '443')
                  OR (lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) = 'http'
                       AND regexp_extract(lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)), ':([0-9]+)$', 1) = '80'))
        THEN ':' || regexp_extract(lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)), ':([0-9]+)$', 1)
        ELSE '' END
    || regexp_replace(regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1), '/+$', '')
    || CASE WHEN array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '^[^#]*?\?([^#]*)', 1), '&'),
                x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|ref|fbclid|gclid)='))), '&') <> ''
        THEN '?' || array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '^[^#]*?\?([^#]*)', 1), '&'),
                x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|ref|fbclid|gclid)='))), '&')
        ELSE '' END
"""


def url_dedup(df: DataFrame) -> DataFrame:
    """Keep one document per canonical URL: the longest text wins, ties
    to the smallest doc_id (RefinedWeb keeps one fetch per canonical URL;
    longest-body is the standard quality-preserving tiebreak).

    Input must carry ``canon_url``, ``doc_id``, ``n_chars``.  ONE hash
    aggregation on the canonical key — the arg-max rides a mergeable
    ``max(struct(n_chars, -doc_id))``, so map-side combine collapses
    duplicates before the shuffle; no window, no second pass.
    """
    best = F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id")))
    return (
        df.groupBy("canon_url")
        .agg(best.alias("best"), F.count(F.lit(1)).alias("n_copies"))
        .select(
            "canon_url",
            (-F.col("best.neg_id")).cast("bigint").alias("keeper_id"),
            F.col("best.n_chars").alias("keeper_chars"),
            F.col("n_copies").cast("bigint").alias("n_copies"),
        )
    )


def host_cap(df: DataFrame, cap: int = 16) -> DataFrame:
    """Cap each host's contribution at ``cap`` documents, chosen by the
    smallest ``md5(doc_id)`` (a deterministic uniform sample, so the cap
    is unbiased w.r.t. content — the C4/MassiveText per-domain limit).

    Input must carry ``host`` and ``doc_id``.  Declared form: one
    row_number window per host partition (honest and exact).  100-TB
    form, documented here and available by composing the library: compute
    each host's cap-th smallest hash with exact_percentiles / a
    two-pass threshold (one agg + one semi-join) so no per-host sort
    materializes; hosts small enough to broadcast take the window path
    under AQE.  Output is one summary row per host, with the kept set
    pinned by an md5 over the ordered kept doc_ids.
    """
    from pyspark.sql import Window as W

    ranked = df.select(
        "host",
        "doc_id",
        F.row_number()
        .over(W.partitionBy("host").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
        .alias("rn"),
    )
    return (
        ranked.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("rn") <= cap, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.when(F.col("rn") <= cap, F.col("doc_id")))
                        ),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("kept_md5"),
        )
        .select("host", F.col("n_docs").cast("bigint").alias("n_docs"), "n_kept", "kept_md5")
    )
