"""r14 experiment: decimal-money arithmetic vs bigint fixed point.

The exact-money contract (plans/queries.py:_revenue_dec) multiplies
decimal(18,4) operands, whose product type decimal(37,8) is backed by
java.math.BigDecimal on every row — allocation-heavy.  The SAME exact
rational arithmetic is expressible in bigint cents fixed point (money
columns are 2-decimal doubles, so cents are exact integers), with one
HALF_UP integer rounding at the end.  This probe times both spellings of
TPC-H Q1 (the decimal-heaviest entry: a 3-factor charge product) and
asserts they produce IDENTICAL rows before any swap is considered.

Run after the correctness sweep (idle box): python tools/exp_decimal_r14.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from arcane_stream_microsoft_synapse_link_spark.plans.tpch import _ts
    from arcane_stream_microsoft_synapse_link_spark.plans.queries import DEC, _dec, _revenue_dec
    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    spark = get_spark("exp-decimal")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    t = Tables(spark, sf_dir)

    def q01_decimal(li):
        one4 = F.lit(1).cast("decimal(6,4)")
        disc = F.col("l_discount").cast("decimal(6,4)")
        charge = (
            F.col("l_extendedprice").cast("decimal(12,4)")
            * (one4 - disc)
            * (one4 + F.col("l_tax").cast("decimal(6,4)"))
        )
        return (
            li.where(F.col("l_shipdate") <= _ts("2001-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(_dec("l_quantity", DEC)).alias("_sq"),
                F.sum(_dec("l_extendedprice")).alias("_sp"),
                _revenue_dec().alias("sum_disc_price"),
                F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
                F.sum(F.col("l_discount").cast("decimal(8,4)")).alias("_sd"),
                F.count("*").alias("count_order"),
            )
            .select(
                "l_returnflag",
                "l_linestatus",
                F.col("_sq").cast("double").alias("sum_qty"),
                F.col("_sp").cast("double").alias("sum_base_price"),
                "sum_disc_price",
                "sum_charge",
                (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
                (F.col("_sp").cast("double") / F.col("count_order")).alias("avg_price"),
                (F.col("_sd").cast("double") / F.col("count_order")).alias("avg_disc"),
                "count_order",
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    def q01_fixed(li):
        # exact cents/fraction-hundredths as bigint: money columns are
        # 2-decimal doubles, so v*100 is within 1e-9 of an integer and
        # round() recovers it exactly
        p_c = F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
        d_c = F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)")
        t_c = F.expr("CAST(ROUND(l_tax * 100) AS BIGINT)")
        q_c = F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
        # revenue: Σ p·(1-d) at scale 1e4; charge: Σ p·(1-d)·(1+t) at 1e6
        return (
            li.where(F.col("l_shipdate") <= _ts("2001-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(q_c).alias("_sq4"),
                F.sum(p_c).alias("_sp4"),
                F.sum(p_c * (100 - d_c)).alias("_rev4"),
                F.sum(p_c * (100 - d_c) * (100 + t_c)).alias("_chg6"),
                F.sum(d_c).alias("_sd4"),
                F.count("*").alias("count_order"),
            )
            .select(
                "l_returnflag",
                "l_linestatus",
                (F.col("_sq4").cast("double") / 100).alias("sum_qty"),
                (F.col("_sp4").cast("double") / 100).alias("sum_base_price"),
                # HALF_UP round to cents, then correctly-rounded /100
                (F.expr("CAST((_rev4 + 50) DIV 100 AS DOUBLE)") / 100).alias(
                    "sum_disc_price"
                ),
                (F.expr("CAST((_chg6 + 5000) DIV 10000 AS DOUBLE)") / 100).alias(
                    "sum_charge"
                ),
                (F.col("_sq4").cast("double") / 100 / F.col("count_order")).alias(
                    "avg_qty"
                ),
                (F.col("_sp4").cast("double") / 100 / F.col("count_order")).alias(
                    "avg_price"
                ),
                (F.col("_sd4").cast("double") / 100 / F.col("count_order")).alias(
                    "avg_disc"
                ),
                "count_order",
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    li = t.lineitem
    a = q01_decimal(li).collect()
    b = q01_fixed(li).collect()
    same = [tuple(r) for r in a] == [tuple(r) for r in b]
    print("identical rows:", same)
    if not same:
        for ra, rb in zip(a, b):
            if tuple(ra) != tuple(rb):
                print("DIFF", ra, rb)
    for label, fn in (("decimal", q01_decimal), ("fixed", q01_fixed)):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            fn(li).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(label, ts)


if __name__ == "__main__":
    main()

def variant2() -> None:
    """Overflow-safe spelling: per-row products in long, accumulation in
    decimal (exact to 1e30, long-backed fast path), final HALF_UP round
    through decimal division (sign-correct, single rounding)."""
    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from arcane_stream_microsoft_synapse_link_spark.plans.tpch import _ts
    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    spark = get_spark("exp-decimal")
    t = Tables(spark, "/root/testdata/sf0.1")

    def q01_fixed2(li):
        p_c = F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
        d_c = F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)")
        t_c = F.expr("CAST(ROUND(l_tax * 100) AS BIGINT)")
        q_c = F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
        rev4 = F.sum((p_c * (100 - d_c)).cast("decimal(20,0)"))
        chg6 = F.sum((p_c * (100 - d_c) * (100 + t_c)).cast("decimal(22,0)"))
        return (
            li.where(F.col("l_shipdate") <= _ts("2001-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(q_c.cast("decimal(20,0)")).alias("_sq2"),
                F.sum(p_c.cast("decimal(20,0)")).alias("_sp2"),
                F.round(rev4.cast("decimal(30,0)") / 10000, 2).cast("double").alias("sum_disc_price"),
                F.round(chg6.cast("decimal(32,0)") / 1000000, 2).cast("double").alias("sum_charge"),
                F.sum(d_c.cast("decimal(20,0)")).alias("_sd2"),
                F.count("*").alias("count_order"),
            )
            .select(
                "l_returnflag",
                "l_linestatus",
                (F.col("_sq2").cast("double") / 100).alias("sum_qty"),
                (F.col("_sp2").cast("double") / 100).alias("sum_base_price"),
                "sum_disc_price",
                "sum_charge",
                (F.col("_sq2").cast("double") / 100 / F.col("count_order")).alias("avg_qty"),
                (F.col("_sp2").cast("double") / 100 / F.col("count_order")).alias("avg_price"),
                (F.col("_sd2").cast("double") / 100 / F.col("count_order")).alias("avg_disc"),
                "count_order",
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    import time as _t
    li = t.lineitem
    # compare against the decimal-contract spelling
    import importlib
    from arcane_stream_microsoft_synapse_link_spark.plans import tpch as T
    a = T.QUERIES["tpch_q01"] if False else None
    from arcane_stream_microsoft_synapse_link_spark.plans.queries import QUERIES as Q
    ref = Q["tpch_q01"](spark, "/root/testdata/sf0.1").collect()
    got = q01_fixed2(li).collect()
    print("identical to declared:", [tuple(r) for r in ref] == [tuple(r) for r in got])
    ts = []
    for _ in range(4):
        t0 = _t.perf_counter()
        q01_fixed2(li).write.format("noop").mode("overwrite").save()
        ts.append(round(_t.perf_counter() - t0, 3))
    print("fixed2", ts)


if __name__ == "__main__" and "--v2" in sys.argv:
    variant2()
