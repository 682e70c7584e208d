"""Local duckdb-oracle harness — mirrors the driver's correctness gate.

Runs a registered query's Spark implementation and its oracle SQL on the
same parquet tables and compares row count, column names, and values
(order-insensitive, exact). Used by tests/test_parity.py and the
``python -m bigdatapipelne_spark.oracle`` CLI while iterating.
"""

from __future__ import annotations

import datetime
import math
import os
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from bigdatapipelne_spark.queries import ORACLE, QUERIES
from bigdatapipelne_spark.sources.testdata import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    detail: str = ""
    mismatches: list[str] = field(default_factory=list)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _norm_rows(rows, col_order):
    return sorted(tuple(_norm(row[i]) for i in col_order) for row in rows)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def check_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    sf_dir: str,
) -> ParityResult:
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = sdf.collect()

    if name not in ORACLE:
        return ParityResult(name, ok=True, spark_rows=len(spark_rows),
                            detail="rows-only (no oracle)")

    cur = con.execute(ORACLE[name])
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    res = ParityResult(name, ok=True, spark_rows=len(spark_rows), oracle_rows=len(oracle_rows))
    if sorted(spark_cols) != sorted(oracle_cols):
        res.ok = False
        res.detail = f"columns differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
        return res
    if len(spark_rows) != len(oracle_rows):
        res.ok = False
        res.detail = f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}"
        return res

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    o_order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
    s_sorted = _norm_rows([tuple(r) for r in spark_rows], order)
    o_sorted = _norm_rows(oracle_rows, o_order)
    if s_sorted != o_sorted:
        res.ok = False
        diffs = [i for i, (a, b) in enumerate(zip(s_sorted, o_sorted)) if a != b][:5]
        for i in diffs:
            res.mismatches.append(f"row {i}: spark={s_sorted[i]} oracle={o_sorted[i]}")
        res.detail = f"{sum(1 for a, b in zip(s_sorted, o_sorted) if a != b)} differing rows"
    return res


def check_all(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> list[ParityResult]:
    from bigdatapipelne_spark.queries import finalize_registry

    finalize_registry()
    con = duckdb_connection(sf_dir)
    out = []
    for name in names or QUERIES:
        try:
            out.append(check_query(spark, con, name, sf_dir))
        except Exception as e:  # surface, don't abort the sweep
            out.append(ParityResult(name, ok=False, detail=f"EXCEPTION: {e}"))
    return out


if __name__ == "__main__":
    import sys

    from bigdatapipelne_spark.session import get_spark

    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or None
    spark = get_spark("oracle-parity")
    results = check_all(spark, sf_dir, names)
    failed = [r for r in results if not r.ok]
    for r in results:
        mark = "OK " if r.ok else "FAIL"
        print(f"{mark} {r.name}: spark={r.spark_rows} oracle={r.oracle_rows} {r.detail}")
        for m in r.mismatches:
            print(f"      {m}")
    sys.exit(1 if failed else 0)
