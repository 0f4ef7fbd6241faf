"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row count + column names + order-insensitive values.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def spark_result(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def duck_result(con, sql):
    rel = con.sql(sql)
    cols_raw = rel.columns
    data = rel.fetchall()
    order = sorted(range(len(cols_raw)), key=lambda i: cols_raw[i])
    cols = [cols_raw[i] for i in order]
    rows = [tuple(_norm(r[i]) for i in order) for r in data]
    return cols, sorted(rows, key=repr)


def compare(df, con, sql, max_report: int = 5):
    """Returns (ok, message)."""
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    if s_cols != d_cols:
        return False, f"column mismatch: spark={s_cols} duck={d_cols}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    if diffs:
        msg = [f"{len(diffs)}/{len(s_rows)} differing rows (cols={s_cols}); first {max_report}:"]
        for a, b in diffs[:max_report]:
            msg.append(f"  spark={a}")
            msg.append(f"  duck ={b}")
        return False, "\n".join(msg)
    return True, f"ok ({len(s_rows)} rows)"
