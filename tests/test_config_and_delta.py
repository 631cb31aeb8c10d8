"""Config loader (reference config_loader.py:13-36 parity) and the
optional Delta writer path."""

from __future__ import annotations

import pytest

from ghcn_d_etl_project_spark.sources.writers import delta_available, write_partitioned
from ghcn_d_etl_project_spark.utils.config import PipelineConfig

YAML_DOC = """
pipeline:
  name: ghcn-etl
quality:
  temperature_max: 500
  bounds: [1, 2]
spark_conf:
  spark.sql.shuffle.partitions: "8"
"""


def test_yaml_dotted_get(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(YAML_DOC)
    cfg = PipelineConfig(str(p))
    assert cfg.get("pipeline.name") == "ghcn-etl"
    assert cfg.get("quality.temperature_max") == 500
    assert cfg.get("quality.bounds") == [1, 2]
    assert cfg.get("missing.key", "dflt") == "dflt"
    # partial path into a non-dict returns the default, not a crash
    assert cfg.get("pipeline.name.deeper", 0) == 0
    assert cfg.spark_conf() == {"spark.sql.shuffle.partitions": "8"}


def test_json_fallback(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text('{"a": {"b": 1}}')
    assert PipelineConfig(str(p)).get("a.b") == 1


def test_delta_write_path(spark, tmp_path):
    """Delta write goes through when delta-spark is installed; otherwise the
    option plumbing is still exercised up to the format resolution error."""
    df = spark.range(10).selectExpr("id", "cast(id % 2 as int) as part")
    if delta_available():
        write_partitioned(df, str(tmp_path / "d"), partition_by=["part"], fmt="delta")
        assert spark.read.format("delta").load(str(tmp_path / "d")).count() == 10
    else:
        with pytest.raises(Exception, match="delta|DATA_SOURCE"):
            write_partitioned(
                df, str(tmp_path / "d"), partition_by=["part"], fmt="delta"
            )


def test_parquet_default_still_works(spark, tmp_path):
    df = spark.range(20).selectExpr("id", "cast(id % 4 as int) as part")
    write_partitioned(df, str(tmp_path / "p"), partition_by=["part"])
    back = spark.read.parquet(str(tmp_path / "p"))
    assert back.count() == 20
    assert "part=3" in " ".join(back.inputFiles())
