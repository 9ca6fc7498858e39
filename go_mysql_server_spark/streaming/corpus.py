"""Streaming corpus ingestion — the LLM-pipeline surface as a live stream.

A production training-data pipeline ingests documents continuously; this is
the Structured Streaming twin of the batch `pipeline_end_to_end_corpus`
composition: quality filter → language ID → exact dedup (bounded state) →
per-(source, lang) accounting. The batch operators from operators/text.py
are pure Column expressions, so the SAME expressions run on the stream —
that equivalence is what tests/test_streaming.py asserts.

Scale notes: the only stateful operator is the dedup
(dropDuplicatesWithinWatermark keyed by content hash — state is bounded by
the watermark horizon, the standard bound for exact-dup state on an
unbounded corpus); the final aggregate is an update-mode keyed count, tiny
per trigger. No reference analogue (go-mysql-server has no streaming);
additive per the project brief.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    fingerprint_md5, langid_of_tokens, min_shingle_fingerprint_of_tokens,
    quality_score_of_tokens, tokens,
    token_count_of_tokens,
)
from ..session import tune_session


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (file source = replayable
    stream; same staging-symlink trick as events_stream). An ingest
    timestamp column drives the dedup watermark — in production this is
    the landing time."""
    tune_session(spark)
    src = os.path.join(sf_dir, "documents.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = os.path.join(
        "/tmp/gms_spark_stream_docs", sf_dir.strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    return stream.withColumn("ingest_ts", F.current_timestamp())


def corpus_ingest(docs: DataFrame, min_quality: float = 0.5,
                  watermark: str = "1 hour") -> DataFrame:
    """Quality-gate, language-ID, dedup, and account the incoming stream.

    Returns the per-(source, predicted-lang) accumulator in update mode:
    docs kept and tokens kept — the numbers a corpus dashboard tracks."""
    # One shared token column for quality + langid + token count (the
    # stopword HOF filters would each re-run the split — langid_of_tokens).
    cleaned = (
        docs.withColumn("_toks", tokens(F.col("text")))
        .filter(quality_score_of_tokens(
            F.col("text"), F.col("_toks")) >= min_quality)
        .withColumn("lang_pred", langid_of_tokens(F.col("_toks")))
        .withColumn("fp", fingerprint_md5(F.col("text")))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    return (
        cleaned.groupBy("source", "lang_pred")
        .agg(F.count("*").alias("kept_docs"),
             F.sum(token_count_of_tokens(F.col("_toks")))
             .alias("kept_tokens"))
    )


def neardup_suppress(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming NEAR-duplicate suppression at ingest: key the watermarked
    dedup on the min-shingle rolling fingerprint (winnowing-lite) instead
    of the exact content hash, so small edits of an already-seen document
    are dropped too. The fingerprint is a pure Column expression computed
    scan-side on the stream; state is one row per surviving fingerprint,
    bounded by the watermark horizon — the same state bound as exact dedup,
    which is what makes near-dup suppression viable on an unbounded
    100 TB/day firehose (a minhash band-join is a batch construct; at
    ingest time a single-key rolling fingerprint is the streamable form)."""
    return (
        docs.withColumn("_toks", tokens(F.col("text")))
        .withColumn("fp_shingle",
                    min_shingle_fingerprint_of_tokens(F.col("_toks")))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp_shingle"])
        .select("fp_shingle", "doc_id", "source")
    )


def neardup_suppress_batch_twin(docs: DataFrame) -> DataFrame:
    """Batch parity oracle: one surviving row per fingerprint (the
    deterministic min doc_id representative)."""
    return (
        docs.withColumn("_toks", tokens(F.col("text")))
        .withColumn("fp_shingle",
                    min_shingle_fingerprint_of_tokens(F.col("_toks")))
        .groupBy("fp_shingle")
        .agg(F.min("doc_id").alias("doc_id"))
    )


def corpus_ingest_batch_twin(docs: DataFrame,
                             min_quality: float = 0.5) -> DataFrame:
    """The identical computation as a batch plan (dedup keeps one row per
    fingerprint) — the parity oracle for the stream."""
    cleaned = (
        docs.withColumn("_toks", tokens(F.col("text")))
        .filter(quality_score_of_tokens(
            F.col("text"), F.col("_toks")) >= min_quality)
        .withColumn("lang_pred", langid_of_tokens(F.col("_toks")))
        .withColumn("fp", fingerprint_md5(F.col("text")))
        .dropDuplicates(["fp"])
    )
    return (
        cleaned.groupBy("source", "lang_pred")
        .agg(F.count("*").alias("kept_docs"),
             F.sum(token_count_of_tokens(F.col("_toks")))
             .alias("kept_tokens"))
    )
