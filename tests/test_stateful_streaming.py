"""applyInPandasWithState sessionization vs the batch window-lag oracle.

The streaming operator emits only CLOSED sessions; on a bounded input
with availableNow, every emitted session must be a true session of the
full history, and at most one (the still-open tail) per user may be
withheld.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from xgboost_spark.streaming.stateful import run_update_to_memory, stateful_sessionize

GAP_MIN = 30


def _make_events() -> pd.DataFrame:
    rng = np.random.default_rng(5)
    rows = []
    base = pd.Timestamp("2024-01-01")
    for uid in range(20):
        t = base + pd.Timedelta(minutes=int(rng.integers(0, 60)))
        for _ in range(int(rng.integers(3, 40))):
            t = t + pd.Timedelta(minutes=int(rng.integers(1, 90)))
            rows.append((uid, t))
    return pd.DataFrame(rows, columns=["user_id", "ts"]).sort_values("ts")


def _batch_sessions(pdf: pd.DataFrame):
    """Oracle: per-user gap-split sessions from the full history."""
    out = []
    for uid, g in pdf.groupby("user_id"):
        ts = sorted(g["ts"])
        start = last = None
        n = 0
        for t in ts:
            if last is not None and (t - last) > pd.Timedelta(minutes=GAP_MIN):
                out.append((uid, start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        out.append((uid, start, last, n))  # final (possibly open) session
    return out


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    pdf = _make_events()
    # two micro-batch files in event-time order
    half = len(pdf) // 2
    src = tmp_path / "stream_in"
    src.mkdir()
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(str(src / "b1"))
    # the file source orders micro-batches by modification time — pin it
    import os
    import time
    now = time.time()
    for i, d in enumerate(("b0", "b1")):
        for root, _, files in os.walk(src / d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i * 10, now + i * 10))
    sch = spark.read.parquet(str(src / "b0")).schema
    stream = (spark.readStream.schema(sch)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    sess = stateful_sessionize(stream, gap_minutes=GAP_MIN, watermark="1 minute")
    run_update_to_memory(sess, "sess_out")
    got = spark.table("sess_out").toPandas()

    oracle = _batch_sessions(pdf)
    truth = {(u, int(s.value // 1000), int(e.value // 1000), n)
             for u, s, e, n in oracle}
    got_set = {(int(r.user_id), int(r.session_start), int(r.session_end), int(r.n_events))
               for r in got.itertuples()}
    assert got_set, "no sessions emitted"
    assert got_set <= truth          # every emitted session is a true one
    per_user_truth: dict[int, int] = {}
    for u, *_ in oracle:
        per_user_truth[u] = per_user_truth.get(u, 0) + 1
    per_user_got = got.groupby("user_id").size().to_dict()
    for u, total in per_user_truth.items():
        assert per_user_got.get(u, 0) >= total - 1  # only the open tail may be withheld

    # the batch relational operator agrees on the total session count
    from xgboost_spark.operators.relational import sessionize
    bdf = spark.createDataFrame(pdf.assign(event_id=range(len(pdf)), value=0.0))
    n_batch = (sessionize(bdf, gap_minutes=GAP_MIN)
               .select("user_id", "session_id").distinct().count())
    assert n_batch == len(oracle)


def test_tws_sessionize_matches_applyinpandaswithstate(spark, tmp_path):
    """The transformWithStateInPandas sessionizer (modern Spark 4
    StatefulProcessor API, RocksDB state store, explicit event-time
    timers) must emit the same closed sessions as the
    applyInPandasWithState form on identical bounded input.

    Skipped when protobuf is absent: the TWS Python worker protocol
    requires it (not bundled in this container) — the operator is
    cluster-ready, the gate is environmental, mirroring the PIL/librosa
    codec gates."""
    import os
    import time

    import pytest
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas worker protocol needs protobuf")

    from xgboost_spark.streaming.stateful import stateful_sessionize_tws

    pdf = _make_events()
    half = len(pdf) // 2
    src = tmp_path / "tws_in"
    src.mkdir()
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(str(src / "b1"))
    now = time.time()
    for i, d in enumerate(("b0", "b1")):
        for root, _, files in os.walk(src / d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i * 10, now + i * 10))
    sch = spark.read.parquet(str(src / "b0")).schema

    def run(maker, name, rocksdb):
        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        sess = maker(stream, gap_minutes=GAP_MIN, watermark="1 minute")
        run_update_to_memory(sess, name, rocksdb=rocksdb)
        return {(int(r.user_id), int(r.session_start), int(r.session_end),
                 int(r.n_events))
                for r in spark.table(name).toPandas().itertuples()}

    legacy = run(stateful_sessionize, "tws_ref_out", rocksdb=False)
    tws = run(stateful_sessionize_tws, "tws_out", rocksdb=True)
    assert tws, "no sessions emitted by transformWithState"
    # gap-closed sessions must agree exactly; the two APIs may differ
    # only on whether the final watermark fired a given tail timer
    truth = {(u, int(s.value // 1000), int(e.value // 1000), n)
             for u, s, e, n in _batch_sessions(pdf)}
    assert tws <= truth
    assert legacy <= truth
    sym = legacy ^ tws
    assert len(sym) <= 20, f"APIs diverge beyond tail sessions: {sorted(sym)[:5]}"
    per_user = {}
    for u, *_ in sym:
        per_user[u] = per_user.get(u, 0) + 1
    assert all(v <= 1 for v in per_user.values())  # at most the tail per user


def test_sessionize_checkpoint_restart_exactly_once(spark, tmp_path):
    """Stop the stateful query after the first batch, deliver more
    data, restart from the SAME checkpoint into a file sink: per-key
    state must survive the restart and every closed session appears
    exactly once in the sink (no duplicates, no holes) — the
    recovery contract a long-running 100 TB pipeline depends on."""
    import os
    import time

    pdf = _make_events()
    half = len(pdf) // 2
    src = tmp_path / "cp_in"
    src.mkdir()
    out = str(tmp_path / "cp_out")
    cp = str(tmp_path / "cp_state")

    def write_batch(name, part, mtime):
        spark.createDataFrame(part).coalesce(1).write.parquet(str(src / name))
        for root, _, files in os.walk(src / name):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    now = time.time()
    write_batch("b0", pdf.iloc[:half], now)
    sch = spark.read.parquet(str(src / "b0")).schema

    def run_once():
        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        sess = stateful_sessionize(stream, gap_minutes=GAP_MIN,
                                   watermark="1 minute")
        q = (sess.writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run_once()                       # batch 0, then the query stops
    write_batch("b1", pdf.iloc[half:], now + 30)
    run_once()                       # restart from checkpoint, batch 1

    got = spark.read.parquet(out).toPandas()
    truth = {(u, int(s.value // 1000), int(e.value // 1000), n)
             for u, s, e, n in _batch_sessions(pdf)}
    rows = [(int(r.user_id), int(r.session_start), int(r.session_end),
             int(r.n_events)) for r in got.itertuples()]
    assert rows, "no sessions written across restarts"
    assert len(rows) == len(set(rows)), "duplicate sessions after restart"
    assert set(rows) <= truth
    # state survived: sessions spanning the restart boundary closed with
    # their full event counts, and at most the open tail is withheld
    per_user = {}
    for u, *_ in truth:
        per_user[u] = per_user.get(u, 0) + 1
    got_per_user = {}
    for u, *_ in set(rows):
        got_per_user[u] = got_per_user.get(u, 0) + 1
    for u, total in per_user.items():
        assert got_per_user.get(u, 0) >= total - 1
