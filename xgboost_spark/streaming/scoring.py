"""Structured Streaming: model scoring and stateful aggregation.

The reference's "streaming" is iterator ingestion
(`XGDMatrixCreateFromDataIter`, `include/xgboost/c_api.h:424`) — data
arrives in batches and is consumed incrementally.  Spark's native
answer is Structured Streaming: the SAME model-scoring mapInPandas
used for batch transform works unchanged on a streaming DataFrame, and
windowed/stateful aggregations cover incremental statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xgboost_spark.plans.model import GBDTModel
from xgboost_spark.sources.tables import ensure_event_time


def score_stream(model: GBDTModel, stream_df: DataFrame,
                 feature_cols: list[str] | None = None,
                 array_col: str | None = None) -> DataFrame:
    """Score a readStream DataFrame — identical plan to batch transform
    (broadcast model + Arrow-batched traversal); Spark handles
    micro-batching."""
    return model.transform(stream_df, feature_cols=feature_cols, array_col=array_col)


def windowed_event_stats(stream_df: DataFrame, ts_col: str = "ts",
                         key_col: str = "event_type", value_col: str = "value",
                         window: str = "5 minutes", slide: str | None = None,
                         watermark: str = "10 minutes") -> DataFrame:
    """Watermarked sliding-window aggregation over an event stream —
    late rows beyond the watermark are dropped, state is bounded."""
    stream_df = ensure_event_time(stream_df, ts_col)
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(w, key_col)
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("sum_value"),
             F.avg(value_col).alias("avg_value"))
    )


def streaming_dedup(stream_df: DataFrame, text_col: str = "text",
                    ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: dropDuplicates on content digest within
    the watermark horizon — the streaming form of operators/dedup.py."""
    stream_df = ensure_event_time(stream_df, ts_col)
    return (
        stream_df.withColumn("_dig", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["_dig"])
        .drop("_dig")
    )


def run_available_now(stream_df: DataFrame, query_name: str):
    """Drive a streaming query over all currently-available input and
    stop — the smoke-test harness pattern (memory sink)."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
