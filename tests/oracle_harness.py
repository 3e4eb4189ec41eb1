"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same sf dir, compares
row count, column names, and an order-insensitive value comparison
(columns sorted by name, rows sorted, values normalized).
"""

from __future__ import annotations

import math
import os
from decimal import Decimal
from typing import Any

import duckdb

from data_engineer_task_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table = a DIRECTORY of part files (the
            # .sf1data layout); driver testdata is single-file parquet
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, Decimal):
        # Decimal (Spark DecimalType) vs float (DuckDB double) must
        # canonicalize identically, or repr-sorting permutes the two
        # sides differently and equal results report as mismatched
        return round(float(v), 9) + 0.0
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float noise and -0.0/0.0
        return round(v, 9) + 0.0
    if isinstance(v, int):
        return int(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    report = {"name": name, "rows": (len(s_rows), len(d_rows)), "cols_match": sorted(s_cols) == sorted(d_cols)}
    if not report["cols_match"]:
        report["cols"] = (sorted(s_cols), sorted(d_cols))
        report["ok"] = False
        return report
    a, b = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    report["values_match"] = a == b
    report["ok"] = report["values_match"] and len(s_rows) == len(d_rows)
    if not report["values_match"]:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        report["first_diffs"] = diffs
        if len(a) != len(b):
            report["len_diff"] = (len(a), len(b))
    return report
