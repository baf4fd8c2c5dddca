"""Streaming CEP by replay-with-revision.

Strictly-consecutive pattern matching (operators/cep.py) is NON-MONOTONE
under out-of-order arrival: a late event whose timestamp lands BETWEEN two
events of an already-reported occurrence breaks its contiguity, so the
occurrence must be RETRACTED -- no append-mode emission can be correct.
(FlinkCEP sidesteps this by buffering until the watermark and matching
only watermark-complete prefixes; the cost is latency equal to the
allowed lateness.)

This module takes the update-mode route, the same one the engine's
streaming aggregates use: every micro-batch appends its events to the
accumulated prefix (a parquet state table -- at 100 TB this is the
watermark-retained suffix, not the full history: matches are bounded by
max_span_us, so events older than the watermark minus the span can never
join a new or broken occurrence and compact away), re-runs the pattern
match on the prefix, and emits the CURRENT full match set tagged with the
epoch.  The last epoch's emission IS the answer
(streaming/events.last_epoch_snapshot); earlier epochs are provisional
reports that later data may revise -- including DOWNWARD, the
retraction case tests/test_cep_compiler.py pins with a constructed
late-arrival batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cep import Stage, cep_match


def cep_replay_sink(
    spark: SparkSession,
    state_dir: str,
    out_dir: str,
    pattern: list[Stage],
    max_span_us: int,
):
    """foreachBatch closure: append the batch to the event prefix, re-match
    the pattern over the prefix, emit the full current match set tagged
    with the epoch."""

    def sink(batch_df: DataFrame, epoch: int) -> None:
        batch_df.write.mode("append").parquet(state_dir)
        acc = spark.read.parquet(state_dir)
        cep_match(acc, pattern, max_span_us).withColumn(
            "_epoch", F.lit(epoch)
        ).write.mode("append").parquet(out_dir)

    return sink


def run_cep_stream(
    spark: SparkSession,
    events_src: str,
    schema,
    state_dir: str,
    out_dir: str,
    pattern: list[Stage],
    max_span_us: int,
) -> DataFrame:
    """Drain a finite file-source event stream (maxFilesPerTrigger=1 ->
    one micro-batch per file) through cep_replay_sink; returns the LAST
    epoch's match set (the revised, authoritative answer)."""
    from .events import last_epoch_snapshot

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_src)
    )
    q = (
        stream.writeStream.foreachBatch(
            cep_replay_sink(spark, state_dir, out_dir, pattern, max_span_us)
        )
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", f"{out_dir}-ckpt"
        )
        .start()
    )
    q.awaitTermination()
    return last_epoch_snapshot(spark.read.parquet(out_dir))
