"""Change-data-capture application: MERGE-style upsert and SCD2 history.

The reference pipeline rebuilds its dimension outputs from scratch every
run — every layer writes ``mode("overwrite")`` (reference:
``src/transform/bronze_processor.py:132``,
``src/transform/silver_processor.py:149``,
``src/transform/gold_processor.py:253``, and the shared writer default
in ``src/utils/spark_utils.py:38-40``). At 100 TB a rebuild is not an
option: the engine needs to APPLY a (small) change set to a (huge)
existing snapshot.
These operators are the batch form of warehouse ``MERGE INTO``:

* :func:`merge_upsert` — produce the post-merge snapshot from (target,
  source) with the standard three-arm semantics: matched+delete-flag →
  DELETE, matched → UPDATE, unmatched source without delete-flag →
  INSERT, unmatched target → carry through.
* :func:`scd2_apply` — slowly-changing-dimension type 2: instead of
  overwriting attributes in place, close the current history row
  (``valid_to`` = change timestamp) and open a new one, preserving full
  attribute lineage.

Both offer two physical strategies with identical results:
``"shuffle"`` — ONE full-outer join, one shuffle on the merge key for
both sides (or none when the snapshot is already bucketed/partitioned
by the key, which is exactly why the bucketed layout writer exists in
``sources/writers.py``); and ``"broadcast"`` — the full-outer split
into three map-only broadcast arms for the overwhelmingly common CDC
case (small change batch, huge snapshot), where the snapshot is scanned
narrowly but NEVER shuffled. Spark cannot broadcast either side of a
full-outer join, so the arm-split is the only way to get the
broadcast shape — AQE alone can't rescue the full-outer plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_T, _S = "__merge_t_present", "__merge_s_present"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str | list[str],
    set_cols: dict[str, str] | None = None,
    insert_defaults: dict[str, Column] | None = None,
    delete_col: str | None = None,
    strategy: str = "shuffle",
) -> DataFrame:
    """Apply ``source`` changes onto ``target``; return the new snapshot
    with exactly ``target``'s columns.

    ``set_cols`` maps target column → source column holding its new
    value (default: every non-key target column that also exists in
    source, by name). On UPDATE, unmapped target columns keep their
    value; on INSERT they take ``insert_defaults[col]`` (a Column) or
    NULL. ``delete_col`` names a boolean source column: matched rows
    with it true are deleted, unmatched source rows with it true are
    ignored (standard MERGE: a delete for a missing key is a no-op).

    ``strategy`` picks the physical shape (results are identical —
    pinned in tests):

    * ``"shuffle"`` (default): one full-outer join. Spark cannot
      broadcast a full-outer's stream side, so this always plans a
      shuffle join of BOTH inputs — the right choice when the change
      batch is comparable to the snapshot, and shuffle-free when the
      target is bucketed by the key (``sources/writers.py``).
    * ``"broadcast"``: for the overwhelmingly common CDC case — a small
      change batch against a huge snapshot — the full-outer is split
      into three broadcast arms so the TARGET IS NEVER SHUFFLED: a
      map-only left broadcast join (update/delete/carry), a map-only
      left-semi broadcast pass collecting the matched keys (bounded by
      |source|), and a broadcast anti join on the source for inserts.
      Two narrow scans of the snapshot instead of one full shuffle —
      at 100 TB, scanning twice is far cheaper than shuffling once.
      Plan pinned: 3 BroadcastHashJoins, zero SortMergeJoin.

    Raises if the reserved marker column names collide with inputs.
    """
    keys = [key] if isinstance(key, str) else list(key)
    for k in keys:
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"merge key {k!r} must exist on both sides")
    for marker in (_T, _S):
        if marker in target.columns or marker in source.columns:
            raise ValueError(f"reserved column name in input: {marker!r}")
    if set_cols is None:
        set_cols = {
            c: c for c in target.columns if c not in keys and c in source.columns
        }
    for tc, sc in set_cols.items():
        if tc not in target.columns:
            raise ValueError(f"set_cols target column {tc!r} not in target")
        if sc not in source.columns:
            raise ValueError(f"set_cols source column {sc!r} not in source")
    insert_defaults = insert_defaults or {}

    if strategy not in ("shuffle", "broadcast"):
        raise ValueError(f"unknown strategy {strategy!r} (shuffle|broadcast)")

    # Markers, not outer-join null probing: a null key or null attribute
    # must not be mistaken for "row absent on that side". Source value
    # columns are prefixed so names shared with the target (the common
    # case — set_cols {c: c}) never collide in the joined plan.
    t = target.withColumn(_T, F.lit(True))
    s_vals = sorted({*set_cols.values()} | ({delete_col} if delete_col else set()))
    s = source.select(
        *keys, *[F.col(c).alias(f"__src_{c}") for c in s_vals]
    ).withColumn(_S, F.lit(True))

    s_present = F.col(_S).isNotNull()
    deleting = (
        F.coalesce(F.col(f"__src_{delete_col}"), F.lit(False))
        if delete_col
        else F.lit(False)
    )

    def project(t_present: Column, from_target: bool) -> list[Column]:
        """Output columns for a joined frame (from_target=True) or a
        source-only insert frame (from_target=False)."""
        cols: list[Column] = []
        for c in target.columns:
            if c in keys:
                cols.append(F.col(c).alias(c))
            elif c in set_cols:
                src_val = F.col(f"__src_{set_cols[c]}")
                cols.append(
                    (
                        F.when(s_present, src_val).otherwise(F.col(c))
                        if from_target
                        else src_val
                    ).alias(c)
                )
            else:
                ins = insert_defaults.get(
                    c, F.lit(None).cast(target.schema[c].dataType)
                )
                cols.append(
                    (F.when(t_present, F.col(c)).otherwise(ins) if from_target else ins)
                    .alias(c)
                )
        return cols

    if strategy == "broadcast":
        # Arm 1 (update/delete/carry): map-only left broadcast join —
        # the snapshot is scanned, never shuffled.
        bulk = (
            t.join(F.broadcast(s), on=keys, how="left")
            .filter(~(s_present & deleting))
            .select(*project(F.lit(True), from_target=True))
        )
        # Arm 2: matched keys, bounded by |source| — a second map-only
        # broadcast pass (left semi) over just the snapshot's key columns.
        matched = (
            target.select(*keys)
            .join(F.broadcast(source.select(*keys)), on=keys, how="left_semi")
            .distinct()
        )
        # Arm 3 (inserts): source rows matching no snapshot key; the anti
        # join's build side is `matched` (small), so this is map-only too.
        inserts = (
            s.join(F.broadcast(matched), on=keys, how="left_anti")
            .filter(~deleting)
            .select(*project(F.lit(False), from_target=False))
        )
        return bulk.unionByName(inserts)

    j = t.join(s, on=keys, how="full_outer")
    t_present = F.col(_T).isNotNull()
    # keep: matched-not-deleted, target-only, or source-only inserts
    kept = j.filter(~(s_present & deleting)).filter(t_present | s_present)
    return kept.select(*project(t_present, from_target=True))


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: str | list[str],
    attrs: list[str],
    eff_col: str = "eff_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    strategy: str = "shuffle",
) -> DataFrame:
    """Apply a change batch to an SCD2 history table.

    ``history`` rows carry ``valid_from``/``valid_to`` (NULL ``valid_to``
    = current). ``changes`` carries the key, the new ``attrs`` values,
    and the change timestamp ``eff_col``. Semantics per key with a
    change: if any tracked attribute differs from the current row (or no
    current row exists), the current row is CLOSED (``valid_to`` := the
    change's ``eff_col``) and a new current row opens at ``eff_col``;
    an identical change is a no-op. Closed history rows are never
    touched. One change per key per batch (the usual micro-batch
    contract) — callers with multiple should pre-collapse to the latest.

    ``strategy`` picks the physical shape (identical rows — pinned in
    tests), mirroring :func:`merge_upsert`:

    * ``"shuffle"`` (default): the history splits current-vs-closed by a
      cheap filter; the CURRENT slice full-outer-joins the change batch.
      Spark cannot execute a full-outer as a broadcast join on either
      side, so this ALWAYS shuffles the current slice (and the batch) —
      shuffle-free only when both sides are already bucketed by the key.
      Closed rows pass through untouched either way — the property that
      makes SCD2 appends cheap at 100 TB.
    * ``"broadcast"``: for the common CDC shape — a small change batch
      against a huge dimension — the full-outer splits into three
      broadcast arms so the current slice is SCANNED (narrowly, three
      times) BUT NEVER SHUFFLED: a map-only left broadcast join
      (close-or-carry + opens for matched differing keys), a left-semi
      broadcast pass collecting matched keys (output bounded by the
      batch), and a broadcast anti join on the batch for fresh-key
      opens. Plan pinned: 3 BroadcastHashJoins, zero SortMergeJoin.

    Raises if any reserved internal column name (``__cur``, ``__chg``,
    ``__eff``, ``__new_<attr>``) already exists on either input.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if strategy not in ("shuffle", "broadcast"):
        raise ValueError(f"unknown strategy {strategy!r} (shuffle|broadcast)")
    reserved = ["__cur", "__chg", "__eff", *[f"__new_{a}" for a in attrs]]
    for marker in reserved:
        if marker in history.columns or marker in changes.columns:
            raise ValueError(f"reserved column name in input: {marker!r}")
    closed = history.filter(F.col(valid_to).isNotNull())
    current = history.filter(F.col(valid_to).isNull()).withColumn(
        "__cur", F.lit(True)
    )

    ch = changes.select(
        *keys,
        *[F.col(a).alias(f"__new_{a}") for a in attrs],
        F.col(eff_col).alias("__eff"),
    ).withColumn("__chg", F.lit(True))

    has_change = F.col("__chg").isNotNull()
    has_current = F.col("__cur").isNotNull()
    differs = F.lit(False)
    for a in attrs:
        # null-safe inequality: NULL -> value IS a change
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"__new_{a}"))

    def kept_current_cols(real_change: Column) -> list[Column]:
        """Current rows, possibly closed by a differing change."""
        return [
            *[F.col(c) for c in keys],
            *[F.col(a) for a in attrs],
            F.col(valid_from).alias(valid_from),
            F.when(real_change, F.col("__eff"))
            .otherwise(F.lit(None))
            .alias(valid_to),
        ]

    opened_cols = [
        *[F.col(c) for c in keys],
        *[F.col(f"__new_{a}").alias(a) for a in attrs],
        F.col("__eff").alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
    ]

    if strategy == "broadcast":
        # Arm 1: map-only left broadcast join over the current slice —
        # reused for both the close-or-carry projection and the opens
        # for matched keys whose attrs differ (two narrow scans).
        jb = current.join(F.broadcast(ch), on=keys, how="left")
        kept_current = jb.select(*kept_current_cols(has_change & differs))
        opened_matched = jb.filter(has_change & differs).select(*opened_cols)
        # Arm 2: matched keys — left-semi broadcast pass whose OUTPUT is
        # bounded by the batch (one current row per key), so it
        # broadcasts into arm 3.
        matched = (
            current.select(*keys)
            .join(F.broadcast(ch.select(*keys)), on=keys, how="left_semi")
            .distinct()
        )
        # Arm 3: fresh-key opens — batch rows matching no current key.
        opened_fresh = ch.join(
            F.broadcast(matched), on=keys, how="left_anti"
        ).select(*opened_cols)
        return (
            closed.select(*keys, *attrs, valid_from, valid_to)
            .unionByName(kept_current)
            .unionByName(opened_matched)
            .unionByName(opened_fresh)
        )

    j = current.join(ch, on=keys, how="full_outer")
    real_change = has_change & (~has_current | differs)
    kept_current = j.filter(has_current).select(*kept_current_cols(real_change))
    # newly-opened rows for real changes (new key or differing attrs)
    opened = j.filter(real_change).select(*opened_cols)
    return closed.select(*keys, *attrs, valid_from, valid_to).unionByName(
        kept_current
    ).unionByName(opened)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    attrs: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Diff two snapshot versions into a CDC change set — the INVERSE of
    :func:`merge_upsert` (the change-data-feed every table format
    derives; the reference can only overwrite, so its consumers must
    re-read whole outputs to learn what changed).

    One row per differing key: ``op`` = ``'I'`` (in ``new`` only),
    ``'D'`` (in ``old`` only), ``'U'`` (present in both with any tracked
    attribute differing, null-safely); identical rows are absent.
    ``attrs`` defaults to every non-key column the sides share. Emitted
    attribute values are the NEW side's for I/U and the OLD side's for D
    (so a delete row still identifies what vanished).

    Round-trip law (property-tested): applying the diff back onto
    ``old`` with ``merge_upsert(old, diff, delete_col=...)`` reproduces
    ``new`` exactly.

    Shuffle shape: one full-outer join — both sides shuffle on the key
    (both are snapshots, so neither broadcasts in general), and the
    shuffle vanishes when both versions are bucketed by the key
    (``sources/writers.py:write_bucketed``), the layout a snapshot store
    should use anyway. Raises on reserved marker collisions.
    """
    keys = [key] if isinstance(key, str) else list(key)
    for k in keys:
        if k not in old.columns or k not in new.columns:
            raise ValueError(f"diff key {k!r} must exist on both sides")
    if attrs is None:
        attrs = [
            c for c in old.columns if c not in keys and c in new.columns
        ]
    reserved = ["__old_present", "__new_present", op_col,
                *[f"__new_{a}" for a in attrs]]
    for marker in reserved:
        if marker in old.columns or marker in new.columns:
            raise ValueError(f"reserved column name in input: {marker!r}")

    o = old.select(*keys, *attrs).withColumn("__old_present", F.lit(True))
    n = new.select(
        *keys, *[F.col(a).alias(f"__new_{a}") for a in attrs]
    ).withColumn("__new_present", F.lit(True))
    j = o.join(n, on=keys, how="full_outer")

    in_old = F.col("__old_present").isNotNull()
    in_new = F.col("__new_present").isNotNull()
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"__new_{a}"))
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(differs, F.lit("U"))
    )
    return j.withColumn(op_col, op).filter(F.col(op_col).isNotNull()).select(
        *keys,
        op_col,
        *[
            F.when(F.col(op_col) == "D", F.col(a))
            .otherwise(F.col(f"__new_{a}"))
            .alias(a)
            for a in attrs
        ],
    )


def evolve_target_schema(
    target: DataFrame, source: DataFrame, key: str | list[str]
) -> DataFrame:
    """Schema evolution for drifting CDC feeds: return ``target`` with
    every non-key ``source`` column it lacks appended as a typed NULL
    column, so a subsequent :func:`merge_upsert` with default
    ``set_cols`` carries the new attribute (NULL for never-updated rows,
    the source value on update/insert) — the ADD-COLUMN half of what a
    table format's ``mergeSchema`` does, as a pure projection (zero
    shuffle, zero scan cost beyond the merge itself).

    Type CHANGES are refused loudly: a column present on both sides with
    different types raises instead of silently casting — narrowing casts
    corrupt data, and widening policy belongs to the caller.
    """
    keys = [key] if isinstance(key, str) else list(key)
    for c in source.columns:
        if c in target.columns and c not in keys:
            st, tt = source.schema[c].dataType, target.schema[c].dataType
            if st != tt:
                raise ValueError(
                    f"type change for column {c!r}: target {tt.simpleString()} "
                    f"vs source {st.simpleString()} — cast explicitly"
                )
    new_cols = [
        F.lit(None).cast(source.schema[c].dataType).alias(c)
        for c in source.columns
        if c not in target.columns and c not in keys
    ]
    return target.select("*", *new_cols) if new_cols else target
