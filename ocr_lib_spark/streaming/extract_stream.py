"""Streaming extraction + windowed metrics.

The reference has no streaming (progress atoms are its only live state,
core.clj:15-19). Here the batch extraction core is reused verbatim under
Structured Streaming — mapInPandas is stateless per-turn, so the
streaming plan is the batch plan with a source swap, plus a watermarked
tumbling-window metrics aggregation (late turns tolerated up to the
watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_lib_spark.config import DEFAULT_CONFIG, ExtractionConfig
from ocr_lib_spark.pipeline import EXTRACTED_SCHEMA
from ocr_lib_spark.operators.extract import extract_batch
from ocr_lib_spark.operators.prototypes import taught_prototypes
from ocr_lib_spark.sources.synth import transcripts_spark_schema


def stream_transcripts(spark, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream of transcript parquet (kafka in production —
    same downstream plan)."""
    return (
        spark.readStream.schema(transcripts_spark_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(transcripts: DataFrame, cfg: ExtractionConfig = DEFAULT_CONFIG) -> DataFrame:
    """Streaming twin of pipeline.extract_turns (no repartition: the
    micro-batch split is the parallelism unit; keeps ts for watermarks)."""
    spark = transcripts.sparkSession
    bc = spark.sparkContext.broadcast(taught_prototypes())

    # copy — StructType.add mutates in place and EXTRACTED_SCHEMA is shared
    schema = T.StructType(
        list(EXTRACTED_SCHEMA.fields) + [T.StructField("ts", T.TimestampType())]
    )

    def run(batches):
        protos, labels, keep = bc.value
        for pdf in batches:
            res = extract_batch(pdf["text"], cfg, protos, labels, keep)
            out = pdf[["conv_id", "turn_idx", "role", "ts"]].copy()
            out["extracted_text"] = res["extracted_text"].values
            out["spans"] = res["spans"].values
            out["n_blocks"] = res["n_blocks"].values
            out["unknown_blocks"] = res["unknown_blocks"].values
            yield out[
                [
                    "conv_id", "turn_idx", "role", "extracted_text",
                    "spans", "n_blocks", "unknown_blocks", "ts",
                ]
            ]

    return transcripts.mapInPandas(run, schema=schema)


def windowed_extraction_metrics(
    extracted: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-window extraction metrics with late-data watermark — the
    durable recast of the reference's progress-percentage atoms
    (core.clj:21-44)."""
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("extracted_text") != "", 1).otherwise(0)).alias(
                "n_content_turns"
            ),
            F.sum("n_blocks").alias("n_blocks"),
        )
        .select(F.col("w.start").alias("window_start"), "n_turns", "n_content_turns", "n_blocks")
    )


def run_stream_to_memory(spark, src_path: str, name: str = "extract_out") -> None:
    """Drive a bounded file stream to completion synchronously (test/bench
    harness; production would use a real trigger + checkpointLocation)."""
    st = extract_stream(stream_transcripts(spark, src_path))
    q = (
        st.drop("spans")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
