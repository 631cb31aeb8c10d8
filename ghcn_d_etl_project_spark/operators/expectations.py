"""Declarative data expectations: the dbt-tests / Great-Expectations
staple as a FUSED distributed runner.

The reference's validator runs one job per metric
(``src/utils/data_validator.py:86-115`` — a count() per column); a
declarative suite run naively does the same, one pass per check. Here
the suite compiles into the minimum number of passes:

  * every ROW-LOCAL check (``not_null``, ``accepted_values``,
    ``in_range``, ``regex_match``) and every ``unique`` check folds
    into ONE aggregate over the table — violation flags are summed
    side by side, uniqueness is ``count(*) - count_distinct(col)``
    in the same pass (one distinct column plans the two-phase
    distinct rewrite, several plan one Expand — either way ONE scan,
    and the multiplier is #unique-checks, bounded by the suite, not
    the data);
  * each ``foreign_key`` check is one LEFT ANTI count against its
    parent keys (broadcast when the parent is small — Catalyst's
    choice, the suite never forces a shuffle). Its report row's
    ``n_rows`` references the fused aggregate; Catalyst prunes that
    reference to a ZERO-COLUMN count (parquet footer metadata at
    scale, no data pages re-read — pinned in the tests), which is why
    exchange reuse doesn't fire: the pruned twin is cheaper than a
    literal re-use would be.

So a 12-check suite over 100 TB costs one wide scan plus one anti-join
per FK — not 12 table scans.

NULL semantics follow the GE convention: ``not_null`` is the ONLY check
that counts NULLs — ``accepted_values`` / ``in_range`` /
``regex_match`` / ``foreign_key`` skip NULL values (compose with
``not_null`` to forbid them), and ``unique`` counts NULL as a value
(two NULL keys are duplicates).

Output: one row per expectation — ``check_id, kind, col,
n_violations, n_rows, passed`` — ordered as declared, so the report is
diffable run over run.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Expectation", "run_expectations"]

_ROW_LOCAL = ("not_null", "accepted_values", "in_range", "regex_match")
_KINDS = _ROW_LOCAL + ("unique", "foreign_key")


@dataclass(frozen=True)
class Expectation:
    kind: str
    col: str
    params: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def not_null(cls, col: str) -> "Expectation":
        return cls("not_null", col)

    @classmethod
    def unique(cls, col: str) -> "Expectation":
        return cls("unique", col)

    @classmethod
    def accepted_values(cls, col: str, values: list) -> "Expectation":
        if not values:
            raise ValueError("accepted_values needs a non-empty list")
        return cls("accepted_values", col, {"values": list(values)})

    @classmethod
    def in_range(cls, col: str, lo, hi) -> "Expectation":
        if not hi >= lo:
            raise ValueError("in_range needs hi >= lo")
        return cls("in_range", col, {"lo": lo, "hi": hi})

    @classmethod
    def regex_match(cls, col: str, pattern: str) -> "Expectation":
        if not pattern:
            raise ValueError("regex_match needs a pattern")
        return cls("regex_match", col, {"pattern": pattern})

    @classmethod
    def foreign_key(cls, col: str, parent: DataFrame, parent_col: str) -> "Expectation":
        return cls("foreign_key", col, {"parent": parent, "parent_col": parent_col})

    @property
    def check_id(self) -> str:
        return f"{self.kind}:{self.col}"

    def _violation_flag(self) -> Column:
        """Row-local kinds only: 1 where the row violates, else 0."""
        x = F.col(self.col)
        if self.kind == "not_null":
            bad = x.isNull()
        elif self.kind == "accepted_values":
            bad = x.isNotNull() & ~x.isin(self.params["values"])
        elif self.kind == "in_range":
            bad = x.isNotNull() & ~x.between(self.params["lo"], self.params["hi"])
        else:  # regex_match
            bad = x.isNotNull() & ~x.rlike(self.params["pattern"])
        return F.when(bad, F.lit(1)).otherwise(F.lit(0))


def run_expectations(df: DataFrame, checks: list[Expectation]) -> DataFrame:
    """Run a declared expectation suite over ``df`` — see the module
    docstring for the pass-fusion and NULL contract. Raises up front on
    an empty suite, an unknown kind, a missing column, or a duplicate
    ``check_id`` (two checks of the same kind on the same column would
    collide in the report)."""
    if not checks:
        raise ValueError("empty expectation suite")
    seen: set[str] = set()
    for c in checks:
        if c.kind not in _KINDS:
            raise ValueError(f"unknown expectation kind {c.kind!r}")
        if c.col not in df.columns:
            raise ValueError(f"{c.check_id}: column {c.col!r} not in input")
        if c.check_id in seen:
            raise ValueError(f"duplicate expectation {c.check_id}")
        seen.add(c.check_id)

    fused = [c for c in checks if c.kind in _ROW_LOCAL or c.kind == "unique"]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in fused:
        if c.kind == "unique":
            # count_distinct ignores NULLs; the declared convention is
            # NULL-is-a-value, so one all-NULL group contributes
            # (n_nulls - 1) duplicates via the has-null term
            agg = (
                F.count(F.lit(1))
                - F.count_distinct(F.col(c.col))
                - F.coalesce(
                    F.max(F.col(c.col).isNull().cast("long")), F.lit(0)
                )
            ).cast("long")
        else:
            agg = F.sum(c._violation_flag()).cast("long")
        aggs.append(agg.alias(f"__v{len(aggs) - 1}"))
    wide = df.agg(*aggs) if fused else df.agg(aggs[0])

    rows: list[DataFrame] = []
    order: dict[str, int] = {c.check_id: i for i, c in enumerate(checks)}

    def report_row(c: Expectation, violations: Column) -> Column:
        return F.struct(
            F.lit(order[c.check_id]).alias("__ord"),
            F.lit(c.check_id).alias("check_id"),
            F.lit(c.kind).alias("kind"),
            F.lit(c.col).alias("col"),
            violations.alias("n_violations"),
            F.col("__n").cast("long").alias("n_rows"),
            (violations == 0).alias("passed"),
        )

    structs = [
        report_row(c, F.col(f"__v{i}")) for i, c in enumerate(fused)
    ]
    if structs:
        rows.append(
            wide.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
        )

    # the fused pass already carries the row total — FK branches reuse it
    # instead of re-scanning the table for a count
    total = wide.select("__n")
    for c in checks:
        if c.kind != "foreign_key":
            continue
        parent = c.params["parent"].select(
            F.col(c.params["parent_col"]).alias(c.col)
        )
        orphans = (
            df.select(c.col)
            .where(F.col(c.col).isNotNull())
            .join(parent, on=c.col, how="left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("__orph"))
        )
        rows.append(
            orphans.crossJoin(F.broadcast(total)).select(
                F.lit(order[c.check_id]).alias("__ord"),
                F.lit(c.check_id).alias("check_id"),
                F.lit(c.kind).alias("kind"),
                F.lit(c.col).alias("col"),
                F.col("__orph").alias("n_violations"),
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__orph") == 0).alias("passed"),
            )
        )

    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("__ord").drop("__ord")
