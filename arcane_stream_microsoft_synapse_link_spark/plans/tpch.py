"""The full classic TPC-H 22 as declared queries (VERDICT r6 item 4).

The reference's users run warehouse SQL over the produced tables through
Trino (reference README.md:7-8), so the complete TPC-H shape family is the
parity bar for the query surface.  ~14 of the shapes were already covered
by Q1-Q57; these entries declare ALL 22 canonical queries explicitly,
adapted to the corpus schema where the generator omits a table or column:

- no ``partsupp`` table → a derived part-supplier relation from
  ``lineitem`` (distinct ``(l_partkey, l_suppkey)``; unit price =
  ``MIN(l_extendedprice / l_quantity)`` — IEEE-double division + MIN, so
  bit-identical across engines) stands in for Q2/Q11/Q16/Q20;
- no ``l_commitdate``/``l_receiptdate`` → "late" is
  ``l_shipdate > o_orderdate (+ interval)`` (Q4/Q12/Q21);
- no ``c_phone``/``o_comment``/``p_container``/``s_comment`` → the
  equivalent predicate is expressed over an available column with the
  same shape (substring of ``c_name`` for Q22's country code, an
  ``o_orderpriority`` filter for Q13's comment filter, brand+size for
  Q17/Q19's container).

Determinism contract: identical to queries.py — money aggregated in exact
DECIMAL and emitted as ROUND-2 DOUBLE, averages as
``CAST(exact-decimal-sum AS DOUBLE) / COUNT`` (one IEEE division, no
order-dependent accumulation), every ORDER BY total on a unique key.
The three-factor Q1 charge uses (12,4)x(6,4)x(6,4) casts so the product
scale (26,12 / 24,12) stays exact under both engines' 38-digit cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from .oracle import ORACLE
from .queries import DEC, _cents100, _dec, _fixed_money, _revenue_dec, query

# DuckDB spelling of the exact-decimal revenue aggregate (matches
# _revenue_dec bit-for-bit; same fragment queries.py's oracles use).
REV_SQL = """CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2)
            AS DOUBLE)"""

# Derived part-supplier relation (the corpus has no partsupp table):
# one row per observed (part, supplier) pair; the unit price MIN stands in
# for ps_supplycost (MIN over IEEE doubles — order-independent, bit-equal
# across engines); the quantity sum for ps_availqty (integer-valued
# doubles, exact at any accumulation order).
PS_SQL = """SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
            MIN(l_extendedprice / l_quantity) AS ps_supplycost,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
            FROM lineitem GROUP BY l_partkey, l_suppkey"""


def _partsupp(t: Tables) -> DataFrame:
    return t.lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum(_dec("l_quantity", DEC)).cast("double").alias("ps_availqty"),
    )


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@query("tpch_q01")
def tpch_q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary report — verbatim shape (all columns
    present in the corpus); one scan, map-side partial agg on the two
    3-value flags, exact money in bigint-cents fixed point (the decimal
    contract's fixed-point twin — same rational values, no per-row
    BigDecimal: the 3-factor charge product typed decimal(26,12) before,
    measured 2.7 s → 1.6 s for identical output at sf0.1; see
    plans/queries.py:_fixed_money for the overflow analysis)."""
    t = Tables(spark, sf_dir)
    p_c = _cents100("l_extendedprice")
    d_c = _cents100("l_discount")
    t_c = _cents100("l_tax")
    rev4 = F.sum((p_c * (100 - d_c)).cast("decimal(20,0)"))
    chg6 = F.sum((p_c * (100 - d_c) * (100 + t_c)).cast("decimal(22,0)"))
    return (
        t.lineitem.where(F.col("l_shipdate") <= _ts("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents100("l_quantity").cast("decimal(20,0)")).alias("_sq2"),
            F.sum(p_c.cast("decimal(20,0)")).alias("_sp2"),
            _fixed_money(rev4, 4).alias("sum_disc_price"),
            _fixed_money(chg6, 6).alias("sum_charge"),
            F.sum(d_c.cast("decimal(20,0)")).alias("_sd2"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            # exact decimal /100 then ONE cast to double — the same
            # single-rounding as the decimal sums' cast, at any magnitude
            _fixed_money(F.col("_sq2"), 2, round2=False).alias("sum_qty"),
            _fixed_money(F.col("_sp2"), 2, round2=False).alias("sum_base_price"),
            "sum_disc_price",
            "sum_charge",
            (_fixed_money(F.col("_sq2"), 2, round2=False) / F.col("count_order")).alias("avg_qty"),
            (_fixed_money(F.col("_sp2"), 2, round2=False) / F.col("count_order")).alias("avg_price"),
            (_fixed_money(F.col("_sd2"), 2, round2=False) / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE["tpch_q01"] = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2)
               AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
                * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))), 2)
               AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


@query("tpch_q02")
def tpch_q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier: correlated-MIN scalar subquery →
    the idiomatic Spark spelling is a per-part MIN aggregate joined back
    (one small agg + broadcast joins against the dim chain); partsupp is
    the derived relation (module docstring)."""
    t = Tables(spark, sf_dir)
    ps = _partsupp(t)
    eu_sup = (
        t.supplier.join(
            F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t.region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_ps = ps.join(eu_sup, F.col("ps_suppkey") == F.col("s_suppkey"))
    min_cost = eu_ps.groupBy(F.col("ps_partkey").alias("_pk")).agg(
        F.min("ps_supplycost").alias("_min_cost")
    )
    parts = t.part.where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_type")
    return (
        eu_ps.join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            min_cost,
            (F.col("ps_partkey") == F.col("_pk"))
            & (F.col("ps_supplycost") == F.col("_min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"), "ps_supplycost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


ORACLE["tpch_q02"] = f"""
    WITH ps AS ({PS_SQL})
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
    FROM ps
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
    JOIN part ON ps_partkey = p_partkey AND p_size = 15 AND p_type = 'STANDARD'
    WHERE ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost) FROM ps ps2
        JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
        WHERE ps2.ps_partkey = ps.ps_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""


@query("tpch_q03")
def tpch_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (no o_shippriority column — dropped
    from the output, shape unchanged)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < _ts("1998-06-01"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > _ts("1998-06-01"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue_dec().alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


ORACLE["tpch_q03"] = f"""
    SELECT l_orderkey, o_orderdate, {REV_SQL} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""


@query("tpch_q04")
def tpch_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking: EXISTS → left-semi join with a
    non-equi condition (no commit/receipt dates — "late" is
    l_shipdate > o_orderdate)."""
    t = Tables(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE["tpch_q04"] = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("tpch_q05")
def tpch_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: the 6-way join with the
    supplier-nation == customer-nation co-location condition."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(_revenue_dec().alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


ORACLE["tpch_q05"] = f"""
    SELECT n_name, {REV_SQL} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


@query("tpch_q06")
def tpch_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue change: pure scan-filter-agg; all
    three predicates push to the parquet scan."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # price·discount in bigint-cents fixed point: cents×cents is
            # units of 1e-4 dollars (long per row; the decimal(18,4)
            # product form typed decimal(37,8) — BigDecimal per row)
            _fixed_money(
                F.sum(
                    (_cents100("l_extendedprice") * _cents100("l_discount")).cast(
                        "decimal(20,0)"
                    )
                ),
                4,
            ).alias("revenue")
        )
    )


ORACLE["tpch_q06"] = """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
"""


@query("tpch_q07")
def tpch_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations, both directions,
    by ship year."""
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t.supplier.join(t.lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .where(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_revenue_dec().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE["tpch_q07"] = f"""
    SELECT supp_nation, cust_nation, l_year, {REV_SQL} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               l_extendedprice, l_discount
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@query("tpch_q08")
def tpch_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: conditional-share-of-total per
    order year; the ratio is one IEEE division of two exact sums
    (order-independent, cross-engine bit-equal; bigint-cents fixed point,
    the decimal contract's fixed-point twin — plans/queries.py:_fixed_money)."""
    t = Tables(spark, sf_dir)
    n2 = t.nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("_supp_nation")
    )
    vol = (_cents100("l_extendedprice") * (100 - _cents100("l_discount"))).cast(
        "decimal(20,0)"
    )
    return (
        t.part.where(F.col("p_type") == "ECONOMY")
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.where(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("_supp_nation") == "NATION_3", vol)).alias("_nat"),
            F.sum(vol).alias("_all"),
        )
        .select(
            "o_year",
            (
                _fixed_money(F.col("_nat"), 4, round2=False)
                / _fixed_money(F.col("_all"), 4, round2=False)
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


ORACLE["tpch_q08"] = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CASE WHEN sn = 'NATION_3' THEN vol END) AS DOUBLE)
               / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
        SELECT o_orderdate, n2.n_name AS sn,
               CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS vol
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01')
    GROUP BY year(o_orderdate)
    ORDER BY o_year
"""


@query("tpch_q09")
def tpch_q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit by nation/year.  No partsupp cost →
    the cost leg uses p_retailprice·qty·0.1000 in exact decimal (a
    double-derived ps_supplycost would hit the Spark-HALF_UP vs
    DuckDB-HALF_EVEN narrowing-cast trap); same 6-way join + extract-year
    + agg shape."""
    t = Tables(spark, sf_dir)
    # 1e-5-dollar fixed point: revenue term ×10 (its native scale is 1e-4),
    # cost term retail_c·qty_c/1e5 lands there natively — exact bigint per
    # row (≤ ~5e9), decimal accumulator (plans/queries.py:_fixed_money)
    amount = (
        F.lit(10) * _cents100("l_extendedprice") * (100 - _cents100("l_discount"))
        - _cents100("p_retailprice") * _cents100("l_quantity")
    ).cast("decimal(22,0)")
    return (
        t.part.where(F.col("p_name").like("%bolt%"))
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(_fixed_money(F.sum(amount), 5).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE["tpch_q09"] = """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                - CAST(p_retailprice AS DECIMAL(12,4))
                  * CAST(l_quantity AS DECIMAL(6,2))
                  * CAST(0.1 AS DECIMAL(6,4))), 2) AS DOUBLE) AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
"""


@query("tpch_q10")
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting (c_phone/c_address/c_comment
    don't exist — dropped from the output, shape unchanged)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= _ts("1997-10-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_returnflag") == "R")
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue_dec().alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE["tpch_q10"] = f"""
    SELECT c_custkey, c_name, c_acctbal, n_name, {REV_SQL} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@query("tpch_q11")
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: HAVING against a scalar subquery (a
    fraction of the global sum).  Part value = exact decimal revenue of
    the nation's suppliers' lineitems (derived-partsupp corpus); the
    threshold compare is one IEEE double op on both engines.  Spark
    spelling: per-part agg + broadcast of the 1-row total — the scalar
    subquery as a broadcast join, no second corpus scan shape change."""
    t = Tables(spark, sf_dir)
    li_n = (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t.nation.where(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    per_part = li_n.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        F.sum(_cents100("l_extendedprice").cast("decimal(20,0)")).alias("_v")
    )
    total = per_part.agg(F.sum("_v").alias("_t"))
    return (
        per_part.join(F.broadcast(total))
        .where(
            _fixed_money(F.col("_v"), 2, round2=False)
            > _fixed_money(F.col("_t"), 2, round2=False) * 0.001
        )
        .select(
            "ps_partkey", _fixed_money(F.col("_v"), 2).alias("value")
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


ORACLE["tpch_q11"] = """
    SELECT l_partkey AS ps_partkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_5'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) > (
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) * 0.001
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_5')
    ORDER BY value DESC, ps_partkey
"""


@query("tpch_q12")
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping modes & priority: no l_shipmode column — the
    group key is l_linestatus and "late receipt" is l_shipdate >
    o_orderdate; same join + two-way conditional count shape."""
    t = Tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_shipdate") > F.col("o_orderdate"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


ORACLE["tpch_q12"] = """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate
    GROUP BY l_linestatus
    ORDER BY l_linestatus
"""


@query("tpch_q13")
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT OUTER join with
    a join-side filter (o_orderpriority stands in for the missing
    o_comment NOT LIKE), then the count-of-counts double aggregation."""
    t = Tables(spark, sf_dir)
    o = t.orders.where(F.col("o_orderpriority") != "5-LOW").select(
        "o_orderkey", "o_custkey"
    )
    return (
        t.customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE["tpch_q13"] = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@query("tpch_q14")
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: conditional revenue share over one
    ship month; ratio = exact-sum·100 exactly, then one IEEE division
    (bigint-cents fixed point — plans/queries.py:_fixed_money)."""
    t = Tables(spark, sf_dir)
    vol = (_cents100("l_extendedprice") * (100 - _cents100("l_discount"))).cast(
        "decimal(20,0)"
    )
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= _ts("1997-09-01"))
            & (F.col("l_shipdate") < _ts("1997-10-01"))
        )
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol)).alias("_promo"),
            F.sum(vol).alias("_all"),
        )
        .select(
            (
                # Σpromo·100 = promo_e4 / 100, exact decimal, one cast
                _fixed_money(F.col("_promo"), 2, round2=False)
                / _fixed_money(F.col("_all"), 4, round2=False)
            ).alias("promo_revenue")
        )
    )


ORACLE["tpch_q14"] = """
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol END)
                * CAST(100 AS DECIMAL(5,0)) AS DOUBLE)
           / CAST(SUM(vol) AS DOUBLE) AS promo_revenue
    FROM (
        SELECT p_type,
               CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS vol
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01')
"""


@query("tpch_q15")
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the revenue view + WHERE total_revenue =
    (SELECT MAX(...) FROM view) — Spark spelling: the view aggregated
    once, its 1-row MAX broadcast back as an equality join (ties all
    surface, as in the spec)."""
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_revenue_dec().alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_m"))
    return (
        t.supplier.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("_m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE["tpch_q15"] = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {REV_SQL} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""


@query("tpch_q16")
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship: derived partsupp, NOT-IN
    supplier exclusion (s_acctbal < 0 stands in for the complaint-comment
    filter), COUNT(DISTINCT supplier) per (brand, type, size)."""
    t = Tables(spark, sf_dir)
    ps = _partsupp(t)
    bad = t.supplier.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("_bad_key")
    )
    parts = t.part.where(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    return (
        ps.join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("ps_suppkey") == F.col("_bad_key"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE["tpch_q16"] = f"""
    WITH ps AS ({PS_SQL})
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps JOIN part ON ps_partkey = p_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("tpch_q17")
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated per-part
    AVG scalar subquery → per-part agg joined back (brand+size stands in
    for the missing p_container).  The 0.2·avg limit is
    0.2 · (exact-decimal-sum AS DOUBLE / count) — same expression both
    engines."""
    t = Tables(spark, sf_dir)
    parts = t.part.where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    lim = t.lineitem.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            0.2
            * (
                _fixed_money(
                    F.sum(_cents100("l_quantity").cast("decimal(20,0)")),
                    2,
                    round2=False,
                )
                / F.count("*")
            )
        ).alias("_qty_lim")
    )
    return (
        t.lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(lim, F.col("l_partkey") == F.col("_pk"))
        .where(F.col("l_quantity") < F.col("_qty_lim"))
        .agg(
            (
                _fixed_money(
                    F.sum(_cents100("l_extendedprice").cast("decimal(20,0)")),
                    2,
                    round2=False,
                )
                / 7.0
            ).alias("avg_yearly")
        )
    )


ORACLE["tpch_q17"] = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#23' AND p_size <= 10
      AND l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                        / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@query("tpch_q18")
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: HAVING SUM(qty) > 300 semi-joins
    the order set (all columns present; threshold meaningful — max order
    quantity in the corpus is ~458)."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy(F.col("l_orderkey").alias("_ok"))
        .agg(F.sum(_cents100("l_quantity").cast("decimal(20,0)")).alias("_q"))
        .where(_fixed_money(F.col("_q"), 2, round2=False) > 300)
    )
    return (
        t.orders.join(big, F.col("o_orderkey") == F.col("_ok"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            _fixed_money(F.col("_q"), 2, round2=False).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


ORACLE["tpch_q18"] = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
"""


@query("tpch_q19")
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: the disjunction-of-conjunctions
    predicate (brand × size-range × quantity-range stands in for the
    missing p_container/l_shipmode legs); Catalyst pushes the shared
    part-join key through the OR."""
    t = Tables(spark, sf_dir)
    j = t.lineitem.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.where(b1 | b2 | b3).agg(_revenue_dec().alias("revenue"))


ORACLE["tpch_q19"] = f"""
    SELECT {REV_SQL} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""


@query("tpch_q20")
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion: the IN-with-correlated-agg
    nest.  Derived availability = 1996 shipped quantity per (part,
    supplier); the correlated scalar = half of the 1997 quantity — a
    supplier qualifies when availqty > 0.5·qty97 for some 'red%' part
    (both sums exact integer-valued doubles).  Spark spelling: two
    per-pair year aggregates joined, semi-joined into supplier."""
    t = Tables(spark, sf_dir)

    def year_qty(y: int, alias: str) -> DataFrame:
        return (
            t.lineitem.where(F.year("l_shipdate") == y)
            .groupBy(
                F.col("l_partkey").alias(f"_pk{y}"),
                F.col("l_suppkey").alias(f"_sk{y}"),
            )
            .agg(
                _fixed_money(
                    F.sum(_cents100("l_quantity").cast("decimal(20,0)")),
                    2,
                    round2=False,
                ).alias(alias)
            )
        )

    red = t.part.where(F.col("p_name").like("red%")).select("p_partkey")
    qual = (
        year_qty(1996, "_q96")
        .join(
            year_qty(1997, "_q97"),
            (F.col("_pk1996") == F.col("_pk1997"))
            & (F.col("_sk1996") == F.col("_sk1997")),
        )
        .join(F.broadcast(red), F.col("_pk1996") == F.col("p_partkey"), "left_semi")
        .where(F.col("_q96") > 0.5 * F.col("_q97"))
        .select(F.col("_sk1996").alias("_qual_key"))
        .distinct()
    )
    return (
        t.supplier.join(
            F.broadcast(t.nation.where(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(qual, F.col("s_suppkey") == F.col("_qual_key"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


ORACLE["tpch_q20"] = """
    WITH q96 AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY l_partkey, l_suppkey),
    q97 AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY l_partkey, l_suppkey)
    SELECT s_name, s_suppkey
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
    WHERE s_suppkey IN (
        SELECT q96.sk FROM q96
        JOIN q97 ON q96.pk = q97.pk AND q96.sk = q97.sk
        WHERE q96.pk IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND q96.q > 0.5 * q97.q)
    ORDER BY s_name
"""


@query("tpch_q21")
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting: the
    multi-EXISTS/NOT-EXISTS self-join nest.  "Late" is l_shipdate >
    o_orderdate + 60 days (no receipt/commit dates).  Spark spelling:
    the standard aggregate rewrite — per-order distinct-supplier counts
    (total and late) replace EXISTS (≥2 suppliers) and NOT EXISTS
    (exactly one late supplier); the DuckDB oracle runs the canonical
    correlated form, so equality also validates the rewrite."""
    t = Tables(spark, sf_dir)
    o = t.orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    late = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    n_supp = li.groupBy(F.col("l_orderkey").alias("_ok_all")).agg(
        F.count_distinct("l_suppkey").alias("_n_supp")
    )
    n_late = late.groupBy(F.col("l_orderkey").alias("_ok_late")).agg(
        F.count_distinct("l_suppkey").alias("_n_late")
    )
    return (
        late.join(n_supp, F.col("l_orderkey") == F.col("_ok_all"))
        .join(n_late, F.col("l_orderkey") == F.col("_ok_late"))
        .where((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t.nation.where(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


ORACLE["tpch_q21"] = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
    WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


@query("tpch_q22")
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity: substring-derived country code
    (last 2 digits of c_name — no c_phone), above-positive-average
    balance scalar subquery, anti-join on orders.  Every corpus customer
    has orders, so the anti-join leg is "no URGENT order" — same
    NOT-EXISTS shape with a non-empty result.  The average is the exact
    decimal sum / count (one IEEE division)."""
    t = Tables(spark, sf_dir)
    codes = ("13", "17", "18", "23", "29", "30", "31")
    cc = F.substring(F.col("c_name"), -2, 2)
    cust = t.customer.where(cc.isin(*codes)).select(
        "c_custkey", "c_acctbal", cc.alias("cntrycode")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        ).alias("_avg")
    )
    urgent = t.orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


ORACLE["tpch_q22"] = """
    WITH cust AS (
        SELECT c_custkey, c_acctbal,
               substr(c_name, length(c_name) - 1, 2) AS cntrycode
        FROM customer
        WHERE substr(c_name, length(c_name) - 1, 2)
              IN ('13','17','18','23','29','30','31'))
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS totacctbal
    FROM cust
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM cust WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    ORDER BY cntrycode
"""
