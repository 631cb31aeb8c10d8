"""ghcn_d_etl_project_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark (DataFrame/SQL/Catalyst) engine exposing the
full query and data-processing capability surface of the reference project
sundar139/GHCN-D-ETL-Project (medallion ETL over NOAA GHCN-D fixed-width
climate records) as a library of composable, scale-safe operators — plus
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) and Structured-Streaming windows.

Layout:
    session    — SparkSession factory tuned for local testing / cluster scale
    sources    — readers (parquet tables, text, fixed-width colspec) + writers
    functions  — scalar Column helpers (seasonal encodings, conversions, text)
    operators  — operator families (aggregates, reshape, joins, windows,
                 quality, dedup, similarity, textops, multimodal)
    plans      — the named query registry driving correctness + bench
    streaming  — Structured Streaming windows / sessionization
    pipelines  — GHCN bronze/silver/gold parity pipeline (fixed-width input)
"""

__version__ = "0.1.0"
