"""Structured Streaming smoke tests: windowed aggregation, streaming
dedup, and model scoring over a stream (availableNow + memory sink)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster
from xgboost_spark.sources.tables import load_table
from xgboost_spark.streaming import scoring


def test_windowed_event_stats(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    p = str(tmp_path / "events_stream")
    ev.write.mode("overwrite").parquet(p)
    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(p)
    agg = scoring.windowed_event_stats(stream, window="60 minutes", watermark="2 hours")
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("winagg").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("select * from winagg").toPandas()
    batch = (ev.groupBy(F.window("ts", "60 minutes"), "event_type")
             .agg(F.count("*").alias("n")).toPandas())
    assert len(out) > 0
    assert out["n"].sum() <= batch["n"].sum()  # watermark may hold back tail windows


def test_windowed_event_stats_ntz(spark, sf_dir, tmp_path):
    """Regression: a TIMESTAMP_NTZ event-time column (how the harness
    parquet decodes when nanosAsLong isn't set before the first footer
    read) must be normalized before withWatermark — round-1 failure
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz"))
    p = str(tmp_path / "events_stream_ntz")
    ev.write.mode("overwrite").parquet(p)
    stream = spark.readStream.schema(ev.schema).parquet(p)
    assert dict(stream.dtypes)["ts"] == "timestamp_ntz"
    agg = scoring.windowed_event_stats(stream, window="60 minutes", watermark="2 hours")
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("winagg_ntz").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("select * from winagg_ntz").toPandas()
    assert len(out) > 0


def test_stateful_sessionize_ntz(spark, tmp_path):
    """Same regression for the applyInPandasWithState path."""
    from xgboost_spark.streaming.stateful import (
        run_update_to_memory, stateful_sessionize)
    pdf = pd.DataFrame({
        "user_id": [1] * 4 + [2] * 2,
        "ts": pd.to_datetime([
            "2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 12:00",
            "2024-01-01 12:01", "2024-01-01 09:00", "2024-01-01 16:00"]),
    })
    df = spark.createDataFrame(pdf).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    p = str(tmp_path / "sess_ntz")
    df.write.mode("overwrite").parquet(p)
    stream = spark.readStream.schema(df.schema).parquet(p)
    assert dict(stream.dtypes)["ts"] == "timestamp_ntz"
    sess = stateful_sessionize(stream, gap_minutes=30, watermark="1 hour")
    run_update_to_memory(sess, "sess_ntz_out")
    out = spark.sql("select * from sess_ntz_out").toPandas()
    # user 1's 10:00-10:05 session closes via the 12:00 gap event
    assert ((out["user_id"] == 1) & (out["n_events"] == 2)).any()


def test_streaming_scoring(spark, reg_df, reg_data, tmp_path):
    X, y = reg_data
    fc = [f"c{i}" for i in range(X.shape[1])]
    model = SparkBooster(TrainParams(num_boost_round=2, max_depth=3)).fit(
        reg_df, feature_cols=fc)
    p = str(tmp_path / "stream_in")
    reg_df.limit(500).write.mode("overwrite").parquet(p)
    stream = spark.readStream.schema(reg_df.schema).parquet(p)
    scored = scoring.score_stream(model, stream, feature_cols=fc)
    q = (scored.writeStream.outputMode("append").format("memory")
         .queryName("scored").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("select * from scored").toPandas()
    assert len(out) == 500
    batch = model.transform(reg_df.limit(500), feature_cols=fc).toPandas()
    assert np.allclose(np.sort(out["prediction"]), np.sort(batch["prediction"]), rtol=1e-9)


def test_streaming_dedup(spark, tmp_path):
    pdf = pd.DataFrame({
        "doc_id": range(6),
        "text": ["a", "b", "a", "c", "b", "d"],
        "ts": pd.to_datetime(["2024-01-01 10:00"] * 6),
    })
    df = spark.createDataFrame(pdf)
    p = str(tmp_path / "docs_stream")
    df.write.mode("overwrite").parquet(p)
    stream = spark.readStream.schema(df.schema).parquet(p)
    ded = scoring.streaming_dedup(stream, text_col="text", ts_col="ts")
    q = (ded.writeStream.outputMode("append").format("memory")
         .queryName("dedup_out").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_out").toPandas()
    assert sorted(out["text"]) == ["a", "b", "c", "d"]


def test_streaming_incremental_training(spark, reg_df, tmp_path):
    # two micro-batches of the regression set -> continuation adds
    # rounds_per_batch trees per batch; cuts freeze on batch one
    import numpy as np
    from xgboost_spark.config import TrainParams
    from xgboost_spark.streaming.training import StreamingTrainer
    fc = [f"c{i}" for i in range(5)]
    src_dir = str(tmp_path / "stream_src")
    half = reg_df.count() // 2
    a = reg_df.limit(half)
    b = reg_df.subtract(a)
    a.coalesce(1).write.parquet(src_dir)
    b.coalesce(1).write.mode("append").parquet(src_dir)
    sch = spark.read.parquet(src_dir).schema
    stream = (spark.readStream.schema(sch)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    ckpt = str(tmp_path / "models")
    st = StreamingTrainer(TrainParams(max_depth=3, max_bin=32, seed=2),
                          rounds_per_batch=3, checkpoint_dir=ckpt,
                          feature_cols=fc, label_col="label")
    q = st.start(stream)
    q.awaitTermination()
    assert st.batches_trained == 2
    assert len(st.model.trees) == 6          # 3 rounds x 2 batches
    # frozen cuts: continuation reuses batch-one bin edges
    import os
    assert os.path.exists(os.path.join(ckpt, "latest.json"))
    pred = (st.model.transform(reg_df, feature_cols=fc)
            .toPandas()["prediction"].to_numpy())
    assert np.isfinite(pred).all()
    lab = reg_df.toPandas()["label"].to_numpy()
    assert np.corrcoef(pred, lab)[0, 1] > 0.8
