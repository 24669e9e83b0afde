"""Incremental training over a Structured Stream.

The reference trains on static DMatrices; a Spark-native engine can keep
a model fresh against an unbounded stream: each micro-batch continues
boosting from the current model (``xgb_model=`` continuation — the same
mechanism as reference ``training.py:183``), appending
``rounds_per_batch`` trees fit to that batch's gradients.

This is ONLINE boosting in the practical sense (new trees correct the
ensemble's residuals on the newest data), not a streaming re-derivation
of batch GBDT: early trees never revisit later data.  For drifting
streams that recency bias is usually the point; for stationary data
prefer periodic batch retrains.  Quantile cuts are learned on the FIRST
batch and frozen so bin semantics stay consistent across the stream
(QuantileDMatrix ref= semantics).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster


class StreamingTrainer:
    """foreachBatch-driven continuation trainer.

    Usage::

        st = StreamingTrainer(TrainParams(num_boost_round=5, max_depth=4),
                              feature_cols=[...], label_col="y")
        q = st.start(stream_df)      # a writeStream query
        q.awaitTermination()
        model = st.model             # trees from every processed batch

    ``checkpoint_dir``: when set, the model JSON is saved there after
    every batch (``model_b{batch_id}.json`` + ``latest.json``) so a
    serving job can hot-reload; pair with the writeStream
    ``checkpointLocation`` for restartable pipelines.
    """

    def __init__(self, params: TrainParams | dict,
                 rounds_per_batch: int | None = None,
                 checkpoint_dir: str | None = None,
                 min_batch_rows: int = 1,
                 **fit_kw):
        p = (params if isinstance(params, TrainParams)
             else TrainParams.from_dict(params))
        self.params = p
        self.rounds_per_batch = int(rounds_per_batch or p.num_boost_round)
        self.checkpoint_dir = checkpoint_dir
        self.min_batch_rows = int(min_batch_rows)
        self.fit_kw = fit_kw
        self.model = None
        self.batches_trained = 0
        self._lock = threading.Lock()

    # foreachBatch may be invoked concurrently by multiple queries in
    # exotic setups; continuation must be serial
    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        with self._lock:
            if batch_df.isEmpty():
                return
            if self.min_batch_rows > 1 and batch_df.count() < self.min_batch_rows:
                return
            import dataclasses
            p = dataclasses.replace(self.params,
                                    num_boost_round=self.rounds_per_batch)
            kw = dict(self.fit_kw)
            if self.model is not None:
                kw["xgb_model"] = self.model   # frozen first-batch cuts ride along
            self.model = SparkBooster(p).fit(batch_df, **kw)
            self.batches_trained += 1
            if self.checkpoint_dir:
                os.makedirs(self.checkpoint_dir, exist_ok=True)
                self.model.save(os.path.join(self.checkpoint_dir,
                                             f"model_b{batch_id}.json"))
                self.model.save(os.path.join(self.checkpoint_dir, "latest.json"))

    def start(self, stream_df: DataFrame, query_name: str = "xgbspark_fit_stream",
              trigger: dict | None = None, checkpoint_location: str | None = None):
        """Start the training query.  ``trigger`` kwargs pass through to
        ``writeStream.trigger`` (default ``availableNow=True`` — drain
        what exists, then stop; use ``processingTime='1 minute'`` for a
        long-running refresher)."""
        w = (stream_df.writeStream.queryName(query_name)
             .foreachBatch(self._on_batch)
             .trigger(**(trigger or {"availableNow": True})))
        if checkpoint_location:
            w = w.option("checkpointLocation", checkpoint_location)
        return w.start()
