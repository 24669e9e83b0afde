"""Incremental cross-corpus dedup: minhash_band_index /
index_collisions / dedup_against_index + the exact-digest variants.

The index is the persistable artifact (written/reloaded through parquet
here) — a new batch is checked against an accumulated corpus without
re-pairing the corpus with itself, the shape production pipelines need
at 100 TB (the self-join family in minhash_lsh_pairs re-pairs
everything every run)."""

import pyspark.sql.functions as F
import pytest

from xgboost_spark.operators.dedup import (dedup_against_index,
                                           dedup_exact_against,
                                           exact_digest_index,
                                           index_collisions,
                                           minhash_band_index)

LONG_A = ("the quick brown fox jumps over the lazy dog while the "
          "sleepy cat watches from the warm windowsill every single day")
LONG_B = ("completely different content about distributed query engines "
          "processing petabytes of training data with columnar scans and "
          "vectorized execution kernels")
FAMILY = dict(n_hashes=8, bands=4, shingle_n=3)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, LONG_A), (2, LONG_B), (3, "unrelated third corpus doc "
                                       "holding enough words to shingle")],
        "doc_id bigint, text string")


@pytest.fixture(scope="module")
def new_batch(spark):
    return spark.createDataFrame(
        [(101, LONG_A),          # exact copy of corpus doc 1
         (102, "a wholly novel document that shares no three gram "
               "shingles with anything indexed before"),
         (103, "too short")],    # < shingle_n words: no signature
        "doc_id bigint, text string")


def test_index_roundtrips_and_collides(spark, corpus, new_batch, tmp_path):
    idx = minhash_band_index(corpus, **FAMILY)
    assert idx.columns == ["id", "band", "bucket"]
    # corpus docs long enough to shingle emit one row per band
    assert idx.count() == 3 * FAMILY["bands"]
    # persist/reload: the artifact survives a run boundary
    p = str(tmp_path / "idx")
    idx.write.parquet(p)
    loaded = spark.read.parquet(p)
    hits = index_collisions(new_batch, loaded, **FAMILY).collect()
    got = {(r.id, r.corpus_id) for r in hits}
    # identical text => identical signature => collides in every band,
    # but index_collisions dedups to ONE (id, corpus_id) pair
    assert got == {(101, 1)}


def test_dedup_against_index_strips_only_collisions(corpus, new_batch):
    idx = minhash_band_index(corpus, **FAMILY)
    novel = dedup_against_index(new_batch, idx, **FAMILY)
    assert sorted(r.doc_id for r in novel.collect()) == [102, 103]
    # all original columns survive the anti-join
    assert novel.columns == new_batch.columns


def test_disjoint_sides_no_self_pairs(corpus):
    # checking a corpus against its own index marks every doc a dup —
    # the documented contract is DISJOINT sides; verify the failure
    # mode is the obvious one (every doc collides with itself)
    idx = minhash_band_index(corpus, **FAMILY)
    hits = index_collisions(corpus, idx, **FAMILY)
    self_hits = hits.filter(F.col("id") == F.col("corpus_id"))
    assert self_hits.count() == 3


def test_exact_digest_variants(spark, corpus, new_batch, tmp_path):
    idx = exact_digest_index(corpus)
    assert idx.columns == ["dig"]
    p = str(tmp_path / "dig")
    idx.write.parquet(p)
    loaded = spark.read.parquet(p)
    novel = dedup_exact_against(new_batch, loaded)
    assert sorted(r.doc_id for r in novel.collect()) == [102, 103]
    # null text never matches (md5(NULL) joins false), like SQL
    nulls = spark.createDataFrame([(9, None)], "doc_id bigint, text string")
    assert dedup_exact_against(nulls, loaded).count() == 1


def test_index_plan_is_aggregate_not_window(corpus):
    # scale audit: the index build must stay a HashAggregate pipeline —
    # no global window, no cartesian
    plan = minhash_band_index(corpus, **FAMILY)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_streaming_ingest_dedup_exact(spark, corpus, new_batch, tmp_path):
    """Ingest-time dedup gate: a STREAMING new batch anti-joined against
    the static digest index (Spark supports stream-static left_anti with
    the static side on the right) — the shape an always-on ingest
    pipeline uses so known content never lands in the corpus store."""
    src = str(tmp_path / "stream_src")
    new_batch.write.parquet(src)
    idx = exact_digest_index(corpus)
    stream = spark.readStream.schema(new_batch.schema).parquet(src)
    gated = dedup_exact_against(stream, idx)
    assert gated.isStreaming
    q = (gated.writeStream.format("memory")
         .queryName("ingest_gate").outputMode("append").start())
    try:
        q.processAllAvailable()
        got = sorted(r.doc_id for r in
                     spark.table("ingest_gate").collect())
    finally:
        q.stop()
    assert got == [102, 103]
