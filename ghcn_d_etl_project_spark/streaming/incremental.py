"""Incremental pipeline building blocks: streaming dedup and
checkpointed file-to-file incremental aggregation.

The reference processes everything as full overwrites and lists
"incremental processing and watermarking" as future work
(reference README.md:309) — this module is that capability: a file-source
stream, exactly-once state via checkpointing, and idempotent re-runs
(a second invocation with the same checkpoint processes zero new files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.sources.readers import nanos_to_ts, normalize_temporal


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream with the same schema
    normalization as the batch loader (nanos-as-long AND timestamp_ntz
    both land as TIMESTAMP; session tz pinned UTC so the NTZ cast is
    stable — see ``load_table``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # without this a TIMESTAMP(NANOS) encoding fails the schema probe
    # below with PARQUET_TYPE_ILLEGAL on foreign sessions (same defense
    # as load_table)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", nanos_to_ts("ts"))
    return normalize_temporal(raw)


def dedup_stream(
    sdf: DataFrame, key_cols: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Streaming deduplication with bounded state: duplicates of a key
    arriving within the watermark horizon are dropped; state for keys
    older than the watermark is evicted. The streaming twin of exact
    dedup — what an always-on ingest pipeline runs so the batch corpus
    never accumulates replayed records."""
    return sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def incremental_hourly_rollup(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Incremental ETL: new event files → hourly per-type rollup →
    parquet, exactly-once via the checkpoint. ``availableNow`` drains
    everything currently unprocessed and stops — the batch-cadence
    incremental pattern (run from cron; each run picks up only new
    files). Append mode emits each window once its watermark passes."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
