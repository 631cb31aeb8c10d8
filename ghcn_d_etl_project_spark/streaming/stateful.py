"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windowed aggregations cover time-bucketed state; this module
is the escape hatch for state machines Spark's operators can't express
(running totals re-emitted per micro-batch, per-key custom lifecycles).
State is Arrow-batched per key group — the Pandas-UDF slow path, used
ONLY where built-ins genuinely cannot express the semantics (the rest of
the engine is UDF-free).

Scale notes: state lives in the executor state store partitioned by
grouping key, so memory is bounded by (#keys x state row size), not by
stream length; watermark-based timeouts (GroupStateTimeout) are how
abandoned keys get evicted in production jobs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    sdf: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, sum) emitted every micro-batch.

    A custom stateful operator: state = (n, total) per key, updated with
    each batch's arrivals and re-emitted — the "live leaderboard"
    pattern. Batch-mode equivalent is a plain groupBy count/sum, which
    tests/test_streaming.py uses as the convergence oracle.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
