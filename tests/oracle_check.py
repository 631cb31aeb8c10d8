"""Oracle-parity comparator mimicking the driver's correctness gate:
row-count + column names + order-insensitive value comparison.

Stricter than the driver in one way: floats are compared exactly by
default (our plans are engineered so Spark and DuckDB produce
bit-identical doubles); a per-query relative tolerance can be supplied
for the few queries where exactness is impossible.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _norm_cell(v, float_round: int | None):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        if float_round is not None:
            v = round(v, float_round)
        return ("f", repr(v))
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, (datetime, date, pd.Timestamp)):
        return ("t", str(v)[:26])
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm_cell(x, float_round) for x in v))
    return ("s", str(v))


def _norm_df(pdf: pd.DataFrame, float_round: int | None):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(_norm_cell(v, float_round) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def compare_frames(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    float_round: int | None = None,
    rel_tol: float | None = None,
) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, s_rows = _norm_df(spark_pdf, float_round)
    o_cols, o_rows = _norm_df(oracle_pdf, float_round)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    n_diff = 0
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            if rel_tol is not None and _rows_close(sr, orow, rel_tol):
                continue
            n_diff += 1
            if n_diff <= 5:
                problems.append(f"row {i}: spark={sr} oracle={orow}")
    if n_diff > 5:
        problems.append(f"... {n_diff} differing rows total")
    return problems


def _rows_close(a: tuple, b: tuple, rel_tol: float) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if x[0] == "f" and y[0] == "f":
            if math.isclose(float(x[1]), float(y[1]), rel_tol=rel_tol, abs_tol=rel_tol):
                continue
        return False
    return True


def run_parity(spark, duck, query, sf_dir: str, float_round=None, rel_tol=None):
    """Execute a registry Query on both engines and compare."""
    sdf = query.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    assert query.oracle is not None, f"{query.name} has no oracle"
    oracle_pdf = duck.execute(query.oracle).df()
    problems = compare_frames(spark_pdf, oracle_pdf, float_round=float_round, rel_tol=rel_tol)
    assert not problems, f"{query.name} mismatch vs oracle:\n" + "\n".join(problems)
    return spark_pdf
