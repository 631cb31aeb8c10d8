"""Reshape operators: unpivot (wide->long) and pivot (long->wide).

Reference analogs (SURVEY.md §2.3):
  * R1 explode-based unpivot — ``_explode_daily_values``,
    ``src/transform/bronze_processor.py:83-124`` (literal array [1..31]
    crossed via explode, then positional extraction).
  * R2 keyed pivot — ``_pivot_elements``,
    ``src/transform/silver_processor.py:79-84``
    (``groupBy(keys).pivot(col, values).agg(first(...))``).

Scale notes: ``stack`` unpivots N columns in one generate node without a
shuffle; pivot with an EXPLICIT value list avoids Spark's extra
value-discovery job (the reference also passes the list explicitly) and
plans a single hash aggregate. ``first`` is non-deterministic under
duplicate keys — default collapse here is ``max``; callers opting into
``first`` get reference semantics but lose hash-reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long via ``stack`` (single projection, no shuffle, no join).

    Equivalent semantics to the reference's explode-based unpivot but
    expressed as the idiomatic Spark ``stack`` generator; NULL cells are
    KEPT (callers filter if they want the reference's -9999-style drop).
    """
    n = len(value_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stack_expr = f"stack({n}, {pairs}) as (`{var_name}`, `{value_name}`)"
    return df.select(*id_cols, F.expr(stack_expr))


def explode_slots(
    df: DataFrame, n_slots: int, slot_col: str = "slot", start: int = 1
) -> DataFrame:
    """Cross each row with literal slots [start..start+n_slots-1].

    The reference's day-slot expansion driver (``bronze_processor.py:86-96``):
    ``explode(array(lit(1)..lit(31)))``. A generate node — rows fan out
    within their input partition, no shuffle.
    """
    slots = F.array(*[F.lit(i) for i in range(start, start + n_slots)])
    return df.withColumn(slot_col, F.explode(slots))


def pivot_wide(
    df: DataFrame,
    keys: list[str],
    pivot_col: str,
    pivot_values: list[str],
    value_col: str,
    agg: str = "max",
) -> DataFrame:
    """Long -> wide: ``groupBy(keys).pivot(col, values).agg(agg(value))``.

    ``pivot_values`` is required (explicit list = no discovery pass — same
    choice the reference makes with its required_elements list). ``agg``:
    'max'/'min'/'sum'/'avg' are deterministic; 'first' mirrors the
    reference exactly but is non-deterministic under duplicates.
    """
    agg_col: Column = getattr(F, agg)(value_col)
    return df.groupBy(*keys).pivot(pivot_col, pivot_values).agg(agg_col)
