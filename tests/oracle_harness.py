"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row count + column names + order-insensitive values.

Fidelity notes (learned from the round-1 driver artifact):

* The driver canonicalizes through **pandas** — ``sort_values`` over all
  columns — so a list-valued result column raises
  ``TypeError: unhashable type: 'list'`` at the gate even though plain
  fetchall-based comparison would succeed. This harness therefore also
  goes through pandas, so array-typed outputs fail *locally* first.
* The driver hashes values dtype-sensitively: DuckDB ``SUM(int)`` returns
  HUGEINT which pandas surfaces as float64, while Spark returns int64 —
  equal values, different hash. This harness compares dtype *kinds*
  (int vs float vs object) per column to catch that class of drift.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        if t == "events":
            # Parquet stores ts as TIMESTAMP(NANOS); Spark truncates to
            # microseconds (sources/tables.py). Pinned DuckDB 1.0.0 also
            # truncates on read, but newer DuckDB preserves TIMESTAMP_NS —
            # cast in the view so parity is version-independent.
            con.sql(f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(CAST(ts AS TIMESTAMP) AS ts) "
                    f"FROM read_parquet('{sf_dir}/{t}.parquet')")
        else:
            con.sql(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonical form: columns sorted by name, rows sorted by
    all columns. Raises TypeError on unhashable (list/dict) cells exactly
    like the driver's gate."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return pdf


_KIND = {"i": "i", "u": "i", "b": "i", "f": "f", "M": "M", "m": "m"}


def _kind(dtype) -> str:
    return _KIND.get(dtype.kind, "O")


def _float_eq(fa: float, fb: float) -> bool:
    if math.isnan(fa) or math.isnan(fb):
        return math.isnan(fa) and math.isnan(fb)
    if fa == fb == 0.0:
        # Python's == says -0.0 == +0.0 but the driver hashes the
        # canonical string, which distinguishes them (the r3
        # ann_knn_join red row slipped through here). Be as strict
        # as the driver.
        return math.copysign(1.0, fa) == math.copysign(1.0, fb)
    return fa == fb


def _cell_eq(a, b) -> bool:
    if a is None or b is None or a is pd.NaT or b is pd.NaT:
        return (a is None or a is pd.NaT) and (b is None or b is pd.NaT)
    if isinstance(a, float) and isinstance(b, float):
        return _float_eq(a, b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        return _float_eq(fa, fb)
    return a == b


def compare(df, con, sql, max_report: int = 5):
    """Returns (ok, message)."""
    s = _canon(df.toPandas())
    d = _canon(con.sql(sql).df())
    if list(s.columns) != list(d.columns):
        return False, (f"column mismatch: spark={list(s.columns)} "
                       f"duck={list(d.columns)}")
    if len(s) != len(d):
        return False, f"row count mismatch: spark={len(s)} duck={len(d)}"
    for c in s.columns:
        ks, kd = _kind(s[c].dtype), _kind(d[c].dtype)
        # Whole-column NULL can surface as object/float on either side.
        if ks != kd and not (s[c].isna().all() or d[c].isna().all()):
            return False, (f"dtype-kind mismatch on '{c}': spark "
                           f"{s[c].dtype} ({ks}) vs duck {d[c].dtype} "
                           f"({kd}) — driver hash would differ")
    diffs = []
    for c in s.columns:
        sv = s[c].to_numpy()
        dv = d[c].to_numpy()
        if _kind(s[c].dtype) in ("M", "m") and _kind(d[c].dtype) in ("M", "m"):
            sv = s[c].astype("datetime64[us]").to_numpy()
            dv = d[c].astype("datetime64[us]").to_numpy()
        for i in range(len(sv)):
            a = sv[i].item() if isinstance(sv[i], np.generic) else sv[i]
            b = dv[i].item() if isinstance(dv[i], np.generic) else dv[i]
            if not _cell_eq(a, b):
                diffs.append((i, c, a, b))
    if diffs:
        msg = [f"{len(diffs)} differing cells; first {max_report}:"]
        for i, c, a, b in diffs[:max_report]:
            msg.append(f"  row {i} col {c}: spark={a!r} duck={b!r}")
        return False, "\n".join(msg)
    return True, f"ok ({len(s)} rows)"
