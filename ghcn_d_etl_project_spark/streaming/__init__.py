"""Structured Streaming surface: event-time windows, watermarks, and
streaming job builders.

The reference is pure batch ("incremental processing and watermarking"
is listed as future work, reference README.md:309) — this package is the
engine's extension surface (SURVEY.md §2.10, §7.2 step 9). Window
operators are written against the unified DataFrame API so the SAME
function builds both the batch plan (oracle-checkable vs DuckDB) and the
streaming plan (tested with readStream → memory sink in tests/).
"""

from ghcn_d_etl_project_spark.streaming.windows import (  # noqa: F401
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
