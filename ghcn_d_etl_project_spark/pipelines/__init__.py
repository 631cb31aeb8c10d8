"""End-to-end pipeline compositions proving the operators together.

``ghcn`` reproduces the reference's medallion semantics (bronze explode →
silver pivot/enrich → four gold marts) from its fixed-width inputs, with
the reference's intentional quirks preserved (SURVEY.md §7.4.2).
"""

from ghcn_d_etl_project_spark.pipelines import ghcn  # noqa: F401
