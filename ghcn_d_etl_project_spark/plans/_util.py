"""Shared helpers for oracle-parity query plans.

The driver compares Spark output against DuckDB output by row count, schema,
and order-insensitive value hash — so every float that could differ in the
last bit between two engines (anything whose value depends on accumulation
order) must be made deterministic. The recipe:

  1. Row-level arithmetic stays in IEEE double — both engines compute
     bit-identical doubles from identical inputs.
  2. At aggregation boundaries, quantize to DECIMAL (exact, associative),
     aggregate, then cast back to DOUBLE — identical on both sides no
     matter the partitioning/accumulation order.
  3. Integer-ish outputs are cast to BIGINT on both sides (Spark year() is
     INT, DuckDB year() is BIGINT; pandas dtype equality needs one width).
  4. Dates/timestamps in output columns are formatted to strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ghcn_d_etl_project_spark.sources.readers import load_table

    return load_table(spark, sf_dir, name)


def dsum(col: Column | str, scale: int = 2, precision: int = 24) -> Column:
    """Order-insensitive exact sum of a money-like double.

    Quantizes each row to DECIMAL(precision, scale) (exact for the
    2-decimal synthetic money columns), sums exactly, casts back to DOUBLE.
    DuckDB twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 24) -> Column:
    """Exact-sum-based average: CAST(sum_dec AS DOUBLE) / count(col).

    Division of identical doubles by identical longs is bit-identical
    across engines. DuckDB twin:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(c)


def lsum(col: Column | str) -> Column:
    """Exact BIGINT sum (for integer-valued columns / flags)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("long")).cast("long")


def count_if(cond: Column) -> Column:
    """Conditional count as BIGINT — SUM(CASE WHEN cond THEN 1 ELSE 0 END)."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long")


def as_date_str(col: Column | str) -> Column:
    """Format a date/timestamp to 'yyyy-MM-dd' (string output parity).

    DuckDB twin: ``strftime(x, '%Y-%m-%d')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")
