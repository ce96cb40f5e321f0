"""Local replica of the driver's Spark-vs-DuckDB compare.

Runs a declared query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count + order-insensitive values
(columns sorted by name, rows sorted, floats compared with tight relative
tolerance, decimals/ints/strings exact).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb

from arcane_stream_microsoft_synapse_link_spark.catalog import TABLE_NAMES

# DuckDB result types the driver's type-sensitive value hash can match
# against a Spark result.  Anything outside this set (HUGEINT from a bare
# SUM(BIGINT) / list_sum is the recurring offender) compares equal locally
# (Python int == int) but hash-mismatches at the driver — so the harness
# rejects it outright instead of letting three scales of local sweeps pass.
_DUCKDB_TYPE_WHITELIST = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
}


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v, strict: bool = False):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        # strict mirrors the driver's hash: exact bits, no tolerance
        return ("f", v if strict else round(v, 9))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _rows(colnames, rows, strict: bool = False):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i], strict) for i in order))
    return sorted(out, key=lambda t: tuple(repr(x) for x in t))


def compare(spark, sf_dir: str, query_fn, oracle: str, strict: bool = False) -> tuple[bool, str]:
    """``strict=True`` mirrors the driver's value-HASH compare: normalized
    values must be exactly equal (no float tolerance). The default keeps
    the tolerant compare for smoke use; the correctness gate test runs
    strict, because a query that only approx-matches will hash-fail."""
    sdf = query_fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    con = duckdb_con(sf_dir)
    rel = con.sql(oracle)
    offtype = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in _DUCKDB_TYPE_WHITELIST
    ]
    if offtype:
        return False, (
            "oracle emits driver-incompatible DuckDB type(s) "
            f"{offtype} — CAST to one of {sorted(_DUCKDB_TYPE_WHITELIST)} "
            "(bare SUM/list_sum over BIGINT is HUGEINT)"
        )
    res = con.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    if sorted(scols) != sorted(dcols):
        return False, f"column mismatch: spark={sorted(scols)} duckdb={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duckdb={len(drows)}"

    s = _rows(scols, srows, strict)
    d = _rows(dcols, drows, strict)
    for i, (a, b) in enumerate(zip(s, d)):
        if a != b:
            if not strict and _approx_equal(a, b):
                continue
            return False, f"value mismatch at sorted row {i}: spark={a} duckdb={b}"
    return True, "ok"


def _approx_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if x is None or y is None:
            return False
        tx, vx = x
        ty, vy = y
        if {tx, ty} <= {"f", "dec", "i"}:
            fx, fy = float(vx if tx != "dec" else vx), float(vy if ty != "dec" else vy)
            if not math.isclose(fx, fy, rel_tol=1e-9, abs_tol=1e-9):
                return False
        else:
            return False
    return True
