"""The bigint-cents fixed-point contract (plans/queries.py:_cents100).

Every money/rate/quantity column in the corpus is an exact 2-decimal
double, so RINT(v*100) must recover the integer hundredths exactly —
and identically to the ROUND (HALF_UP) spelling it replaced and the
CAST(v AS DECIMAL(18,2)) spelling that replaced: a tie (fractional
part exactly .5) is unreachable because v = k/100 carries at most
2⁻⁵³ relative error, putting v*100 within ~1e-8 of k.

Asserted at EVERY scale the harness uses (ADVICE r14): the gate runs
sf0.001/sf0.01, the bench sf0.1 — the contract is corpus-wide, so the
test is too.
"""

from __future__ import annotations

import glob
import os

import pytest

SFS = sorted(d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d))

COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "events": ["value"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
}


@pytest.mark.parametrize("sf", SFS)
def test_rint_cents_exact_on_every_money_column(spark, sf):
    for table, cols in COLS.items():
        df = spark.read.parquet(f"{sf}/{table}.parquet")
        for c in cols:
            bad = (
                df.selectExpr(
                    f"CAST(RINT({c} * 100) AS BIGINT) AS r",
                    f"CAST(ROUND({c} * 100) AS BIGINT) AS h",
                    f"CAST({c} AS DECIMAL(18,2)) * 100 AS d",
                )
                .where("r <> h OR CAST(r AS DECIMAL(20,0)) <> d")
                .count()
            )
            assert bad == 0, f"{sf} {table}.{c}: {bad} rows where rint/round/decimal disagree"
