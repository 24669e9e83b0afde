"""Physical-plan audits: the scale contracts that local-mode row counts
can't catch.  A query can be CORRECT at sf0.01 and still carry a
single-partition window or an unpushed filter that kills it at 100 TB —
these tests pin the plan shape itself.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from xgboost_spark.operators import relational, textstats
from xgboost_spark.operators.scan import prefix_sums


def plan_of(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_sessionize_no_global_window(spark, events):
    p = plan_of(relational.sessionize(events, "user_id", "ts", 30))
    assert "Window" in p
    assert "SinglePartition" not in p


def test_topk_no_global_window(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = plan_of(relational.topk_per_group(orders, ["o_custkey"], "o_totalprice", 3))
    assert "SinglePartition" not in p
    # rank<=k must compile to WindowGroupLimit: map-side partial top-k
    # BEFORE the shuffle, so a giant group never fully sorts
    assert "WindowGroupLimit" in p


def test_repetition_stats_no_global_exchange(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(textstats.repetition_stats(docs))
    assert "SinglePartition" not in p
    # the heavy groupBy(id, gram) must partial-aggregate before the shuffle
    assert p.count("HashAggregate") >= 2


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.filter(F.col("source") == "src0").select("doc_id", "n_chars")
    p = plan_of(q)
    assert "PushedFilters: [IsNotNull(source), EqualTo(source,src0)]" in p
    # column pruning: the scan must not read the wide text column
    assert "text" not in p.split("ReadSchema")[1].splitlines()[0]


def test_prefix_sums_no_global_window(spark, events):
    out = prefix_sums(events.select("event_id", "value"), "event_id", ["value"])
    p = plan_of(out)
    assert "SinglePartition" not in p


def test_asof_join_global_path_windows_are_partitioned(spark, events):
    # by=None as-of: the DATA-side window must be partitioned by _pid.
    # (The n_partitions-row boundary-carry table legitimately uses one
    # global window — that's metadata scale, bounded by cluster size.)
    left = events.select("event_id", "ts", "user_id")
    right = events.select("ts", F.col("value").alias("quote"))
    out = relational.asof_join(left, right, on="ts")
    p = plan_of(out, mode="simple").replace(" ", "")
    assert "[_pid" in p and "windowspecdefinition(_pid" in p.lower()


def test_minhash_signature_agg_is_hash_aggregate(spark, sf_dir):
    # bigint (fixed-width) min buffers keep the signature aggregation a
    # HashAggregate; string mins would fall back to SortAggregate, which
    # sorts the whole exploded shingle stream — the dominant cost at scale
    from xgboost_spark.operators import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = dedup.minhash_signatures(
        dedup.word_shingles(docs, "text", "doc_id", 3), 8)
    p = plan_of(sig)
    assert "SortAggregate" not in p
    assert "HashAggregate" in p


def test_feature_ops_windows_are_partitioned(spark, events):
    # rolling/lag windows must partition by the entity key — a global
    # window would serialize the whole table through one task
    from xgboost_spark.operators import features
    p1 = plan_of(features.rolling_agg(events, "user_id", "ts", "value", 3600))
    p2 = plan_of(features.lag_features(events, "user_id", "ts", "value",
                                       lags=(1,), tiebreak_col="event_id"))
    for p in (p1, p2):
        assert "Window" in p
        assert "SinglePartition" not in p


def test_target_encode_broadcasts_stats(spark, sf_dir):
    from xgboost_spark.operators import features
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = plan_of(features.target_encode(li, "l_returnflag", "l_extendedprice"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_semantic_dedup_pairwise_is_equi_join(spark, sf_dir):
    """The within-cluster pairwise stage must compile to an equi-join
    keyed on the cluster id (hash/sort-merge exchange), never a
    cartesian/broadcast-nested-loop over the corpus — at 100 TB a BNLJ
    here is quadratic over everything."""
    from xgboost_spark.operators.similarity import semantic_dedup
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # plan only (no execution): inspect the pairs stage via the final df
    out = semantic_dedup(emb, n_clusters=8, threshold=0.5)
    p = plan_of(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ivf_scale_assignment_has_no_shuffle(spark):
    """The broadcast-NumPy assignment path is a pure map: no Exchange
    between the scan and the MapInPandas node."""
    import numpy as np
    from xgboost_spark.operators.similarity import _assign_lists_np
    rows = [(i, [float(i), float(i + 1)]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.random.default_rng(0).normal(size=(128, 2))
    p = plan_of(_assign_lists_np(df, cents, "embedding"))
    assert "MapInPandas" in p
    assert "Exchange" not in p


def test_waiting_suppliers_joins_are_equi(spark, sf_dir):
    """The Q21-shaped double correlation must compile to equi semi/anti
    joins — a BNLJ here is |orders|^2 at scale."""
    import __spark_entry__ as E
    p = plan_of(E.queries()["waiting_suppliers"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_top_supplier_filter_pushdown(spark, sf_dir):
    """The quarter filter must reach the parquet scan — assert
    l_shipdate appears INSIDE the bracketed PushedFilters list (the
    ReadSchema right after it also mentions the column, which would
    make a naive substring check pass on an empty filter list)."""
    import re

    import __spark_entry__ as E
    p = plan_of(E.queries()["top_supplier"](spark, sf_dir))
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", p), p


def test_train_ranker_has_no_pair_join(spark, sf_dir):
    """q_train_ranker's all-pairs pairwise gradients must compile to
    rank-count WINDOWS over (qid, rel) group counts — never a per-group
    self-join (O(sum n_q^2) rows) or a cartesian product.  The only
    join allowed is the rows -> per-(qid, rel) gh equi-join."""
    import __spark_entry__ as E
    p = plan_of(E.queries()["train_ranker"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p
    assert "Window" in p
    # the scan windows run single-partition over the 31-bin histogram
    # (bins-sized, constant), but the per-qid rank-count windows must be
    # hash-partitioned by qid
    assert "hashpartitioning(qid" in p


def test_strip_spans_keep_first_is_hash_aggregate(spark, sf_dir):
    """strip_duplicate_spans keep-first witness must be a
    partial-aggregable HashAggregate over the packed (id, pos) decimal
    key joined back with a ShuffledHashJoin — NOT a row_number sort
    window partitioned by gram hash, which funnels every occurrence of
    a hot gram (10^8-10^9 at corpus scale) into one sorting task.  The
    ONLY Sort allowed in the plan is the per-document (id, pos) islands
    window, which is partitioned by doc id and bounded by one doc."""
    import re

    from xgboost_spark.operators import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(dedup.strip_duplicate_spans(docs, "text", "doc_id"))
    assert "SortAggregate" not in p
    assert "SortMergeJoin" not in p
    assert "HashAggregate" in p
    assert "ShuffledHashJoin" in p
    # every Sort node must order by (id, pos) — never by the gram hash
    for m in re.finditer(r"\(\d+\) Sort\n.*?Arguments: (\[[^\]]*\])", p, re.S):
        assert "gh#" not in m.group(1), m.group(1)


def test_similarity_join_is_equi_join_no_cartesian(spark, sf_dir):
    """similarity_join's candidate stage must be an equi-join on the
    prefix shingle (hash-partitionable at any scale) — never a
    cartesian / broadcast nested loop over the pair space — and its
    df + intersection aggregates must partial-aggregate map-side.
    The only windows are partitioned by doc id (bounded by one doc)."""
    from xgboost_spark.operators import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(dedup.similarity_join(docs, threshold=0.5, shingle_n=2))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SinglePartition" not in p
    assert p.count("HashAggregate") >= 4  # df, candidate-distinct, inter partials


def test_kmeans_lloyd_means_partial_aggregate(spark, sf_dir):
    """The Lloyd step's per-(cluster, dim) mean must be a map-side
    partial HashAggregate of the exploded train set — one shuffle whose
    payload is n_clusters x dim partials per task, not the corpus."""
    from pyspark.sql import functions as FF

    from xgboost_spark.operators.similarity import _assign_lists
    import numpy as np
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .withColumn("embedding", F.col("embedding").cast("array<double>")))
    cents = np.zeros((8, 64))
    assigned = _assign_lists(emb.select(F.col("embedding").alias("v")), cents, "v")
    means = (assigned.select("list_id", FF.posexplode("v").alias("d", "x"))
             .groupBy("list_id", "d").agg(FF.round(FF.avg("x"), 6).alias("mx")))
    p = plan_of(means)
    assert "SinglePartition" not in p
    assert p.count("HashAggregate") >= 2  # partial + final


def test_span_gram_hashing_runs_after_repartition(spark, sf_dir):
    """The per-char md5 gram hashing must execute AFTER the
    parallelizing Exchange, never before it: on a single-row-group
    file an Exchange placed above the Generate leaves every hash on
    one core (the regression fixed in round 6 — strip_spans went
    6.1s -> 0.5s at sf0.1).  In formatted explain the leaf is (1) and
    execution flows upward, so the RoundRobin Exchange's node number
    must be LOWER than the hashing Generate's."""
    import re

    from xgboost_spark.operators.dedup import _span_gram_hashes
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(_span_gram_hashes(docs, "text", "doc_id", 20))
    gen = re.search(r"\((\d+)\) Generate", p)
    exch = None
    for m in re.finditer(r"\((\d+)\) Exchange\n.*?Arguments: ([^\n]*)", p, re.S):
        if "RoundRobinPartitioning" in m.group(2):
            exch = int(m.group(1))
    assert gen is not None and exch is not None, p
    assert exch < int(gen.group(1)), p


def test_span_ops_gram_pipeline_computed_once(spark, sf_dir):
    """Round-14 optimization: the (id, pos, gh) gram pipeline — whose
    per-char md5 transform is the expensive part of the span dedup
    plans — must be a lazily-checkpointed barrier serving BOTH the
    occurrence-count aggregate and the position probe, never inlined
    into each consumer (per-branch column pruning makes the copies
    canonically different, so exchange reuse can never fire).  In-plan
    signature: consumers read Scan ExistingRDD, and the document scan
    appears at most once per genuine use (strip: the text-rebuild join;
    dup: none) instead of once per gram consumer.  Construction stays
    job-free (lazy checkpoint planned in the AQE-off clone session —
    see _lazy_local_checkpoint)."""
    from xgboost_spark.operators import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()
    dedup._barrier_clone(spark)     # prime outside the job-count window
    ds = spark.sparkContext._jsc.sc().dagScheduler()
    n0 = ds.nextJobId()
    strip = dedup.strip_duplicate_spans(docs, "text", "doc_id")
    dup = dedup.duplicate_spans(docs, "text", "doc_id")
    assert ds.nextJobId() == n0, "span-op construction ran Spark jobs"
    p_strip = plan_of(strip)
    p_dup = plan_of(dup)
    assert p_strip.count("Scan ExistingRDD") >= 1, p_strip
    assert p_dup.count("Scan ExistingRDD") >= 1, p_dup
    # 2 scans in strip (src text join; AQE prints subquery copies at
    # most once each), 0 in dup — before the barrier these were 6 and 4
    assert p_strip.count("Scan parquet") <= 2, p_strip
    assert p_dup.count("Scan parquet") == 0, p_dup
