"""Query plans: importing this package registers every named query.

Each module covers one operator family from SURVEY.md §2; the registry in
``registry.py`` is the single source of truth consumed by
``__spark_entry__.py``, the pytest oracle-parity suite, and ``bench.py``.
"""

from ghcn_d_etl_project_spark.plans import (  # noqa: F401
    aggregates,
    core,
    joins,
    llm,
    multimodal,
    quality,
    reshape,
    sampling,
    streaming,
    windows,
)
from ghcn_d_etl_project_spark.plans.registry import Query, all_queries, register

__all__ = ["Query", "all_queries", "register"]
