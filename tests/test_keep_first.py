"""operators/util.keep_first: the shared skew-proof keep-first primitive
behind dedup_exact / exact_duplicates / segment_dedup.

Pins (a) value semantics against a window-based reference (including
the hot-key inputs the primitive exists for), (b) NULL-key retention —
an inner equi-join on md5(text) would silently drop null-text docs,
(c) the string-id fallback warning, and (d) the physical-plan contract:
a partial-aggregable HashAggregate over the packed decimal key, never a
row_number window over the content key.
"""

import contextlib
import io
import warnings

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xgboost_spark.operators import dedup
from xgboost_spark.operators.util import (KF_CNT, KF_FIRST, KF_MIN_ID,
                                          keep_first)


def plan_of(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def _window_reference(rows, with_pos=False):
    """(key, id[, pos]) -> {(row): (first, cnt, min_id)} via plain
    python — the row_number-over-window semantics keep_first replaces."""
    from collections import defaultdict
    groups = defaultdict(list)
    for r in rows:
        groups[r[0]].append(r)
    out = {}
    for k, g in groups.items():
        order = sorted(g, key=lambda r: (r[1], r[2]) if with_pos else r[1])
        for i, r in enumerate(order):
            out[tuple(r)] = (i == 0, len(g), order[0][1])
    return out


@pytest.fixture(scope="module")
def kf_df(spark):
    rows = [("a", 3), ("a", 1), ("a", 2),
            ("b", 10),
            (None, 7), (None, 5),
            ("c", 4), ("c", 9)]
    return spark.createDataFrame(rows, "k string, id long")


def test_integral_path_matches_window_reference(spark, kf_df):
    out = keep_first(kf_df, "k", "id").toPandas()
    ref = _window_reference([(r["k"], r["id"]) for _, r in out.iterrows()])
    assert len(out) == 8  # NULL-keyed rows are RETAINED
    for _, r in out.iterrows():
        first, cnt, mid = ref[(r["k"], r["id"])]
        assert bool(r[KF_FIRST]) == first, r
        assert int(r[KF_CNT]) == cnt, r
        assert int(r[KF_MIN_ID]) == mid, r


def test_null_key_group_keeps_one_representative(spark, kf_df):
    out = keep_first(kf_df, "k", "id").toPandas()
    nulls = out[out["k"].isna()]
    assert len(nulls) == 2
    assert sorted(nulls["id"]) == [5, 7]
    assert set(nulls[KF_CNT]) == {2}
    firsts = nulls[nulls[KF_FIRST]]
    assert list(firsts["id"]) == [5]
    assert set(nulls[KF_MIN_ID]) == {5}


def test_min_group_count_filters_before_join(spark, kf_df):
    out = keep_first(kf_df, "k", "id", min_group_count=2).toPandas()
    # group b (size 1) dropped entirely; null group (size 2) retained
    assert set(out["id"]) == {1, 2, 3, 4, 5, 7, 9}
    p = plan_of(keep_first(kf_df, "k", "id", min_group_count=2))
    # filtered witness is tiny -> shuffled hash join, no sort on the key
    assert "ShuffledHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pos_packing_preserves_id_pos_order(spark):
    # (id=1, pos=5) precedes (id=2, pos=0): id dominates the packing
    rows = [("k", 2, 0), ("k", 1, 5), ("k", 1, 7), ("q", 9, 3)]
    df = spark.createDataFrame(rows, "k string, id long, pos int")
    out = keep_first(df, "k", "id", pos_col="pos").toPandas()
    ref = _window_reference(rows, with_pos=True)
    for _, r in out.iterrows():
        first, cnt, _ = ref[(r["k"], r["id"], r["pos"])]
        assert bool(r[KF_FIRST]) == first, r
        assert int(r[KF_CNT]) == cnt, r
    assert KF_MIN_ID not in out.columns  # only emitted when pos_col is None


def test_string_id_falls_back_to_window_with_warning(spark, kf_df):
    sdf = kf_df.withColumn("id", F.format_string("id%03d", F.col("id")))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = keep_first(sdf, "k", "id").toPandas()
    assert any("window-based keep-first" in str(x.message) for x in w)
    # same rows kept (ids formatted so lexical order == numeric order),
    # including the NULL-key group
    assert len(out) == 8
    got = {(r["k"], r["id"]): (bool(r[KF_FIRST]), int(r[KF_CNT]))
           for _, r in out.iterrows()}
    assert got[(None, "id005")] == (True, 2)
    assert got[(None, "id007")] == (False, 2)
    assert got[("a", "id001")] == (True, 3)
    assert got[("b", "id010")] == (True, 1)


def test_tied_ids_all_marked_first(spark):
    # documented precondition: (id[, pos]) unique per row; ties on the
    # packed key are ALL flagged (min-vs-self can't single one out)
    df = spark.createDataFrame([("k", 1), ("k", 1), ("k", 2)],
                               "k string, id long")
    out = keep_first(df, "k", "id").toPandas()
    assert int(out[out["id"] == 1][KF_FIRST].sum()) == 2
    assert not out[out["id"] == 2][KF_FIRST].any()


def test_integral_plan_is_hash_aggregate_no_window(spark, kf_df):
    p = plan_of(keep_first(kf_df, "k", "id"))
    assert "HashAggregate" in p
    assert "SortAggregate" not in p
    assert "Window" not in p
    # null-safe join keys must still extract as equi-join keys — any
    # nested-loop fallback would be a per-row scan of the witness
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


# ---- the three converted dedup sites, on a hot-key corpus ----------

HOT = 10_000


@pytest.fixture(scope="module")
def hot_docs(spark):
    """10^4-copy hot document + uniques + null-text rows + an id-order
    trap (the lowest id of the hot group appears LAST in input order)."""
    rows = [(100_000, "hot boilerplate cookie banner text " * 3)]
    rows += [(100_000 + i, rows[0][1]) for i in range(1, HOT - 1)]
    rows += [(7, rows[0][1])]  # true representative, appended last
    rows += [(200_000 + i, f"unique document number {i} with words") for i in range(50)]
    rows += [(300_000, None), (300_001, None), (300_002, None)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(8)


def test_dedup_exact_hot_key(spark, hot_docs):
    kept = dedup.dedup_exact(hot_docs).toPandas()
    # 1 hot rep (min id 7) + 50 uniques + 1 null-text rep (min id 300000)
    assert len(kept) == 52
    ids = set(kept["doc_id"])
    assert 7 in ids and 300_000 in ids
    assert not any(100_000 <= i < 200_000 for i in ids)
    assert {300_001, 300_002}.isdisjoint(ids)


def test_exact_duplicates_hot_key(spark, hot_docs):
    d = dedup.exact_duplicates(hot_docs).toPandas()
    hot = d[d["dup_group"] == 7]
    assert len(hot) == HOT
    assert set(hot["group_size"]) == {HOT}
    nulls = d[d["dup_group"] == 300_000]
    assert len(nulls) == 3 and set(nulls["group_size"]) == {3}
    assert len(d) == HOT + 3  # uniques never widen the joined stream


def test_segment_dedup_hot_key(spark, hot_docs):
    out = dedup.segment_dedup(hot_docs.filter(F.col("text").isNotNull()),
                              seg_words=4).toPandas().set_index("id")
    # every distinct segment owned exactly once: sum(n_owned) ==
    # count(distinct segment) over the corpus
    segs = (hot_docs.filter(F.col("text").isNotNull())
            .select(F.posexplode(F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(F.split(F.trim(F.lower("text")), r"\s+")) / 4.0)
                    .cast("int") - 1),
                lambda i: F.array_join(
                    F.slice(F.split(F.trim(F.lower("text")), r"\s+"),
                            i * 4 + 1, 4), " "))).alias("i", "seg")))
    n_distinct = segs.select("seg").distinct().count()
    assert int(out["n_owned"].sum()) == n_distinct
    # the hot group's owner is doc 7 (lowest id): it owns all its segs
    assert out.loc[7, "dup_frac"] == 0.0
    assert (out.loc[[100_000 + i for i in range(0, HOT - 1, 997)],
                    "dup_frac"] == 1.0).all()


def test_dedup_plans_have_no_content_key_window(spark, hot_docs):
    """Generalized plan audit across the keep_first call sites: the
    content-key reduction must be a HashAggregate (map-side partial
    combine collapses a hot key before the shuffle) and the plan must
    carry NO Window at all — a row_number window over the digest is
    the 100 TB straggler this family was rewritten to remove."""
    nn = hot_docs.filter(F.col("text").isNotNull())
    for q in (dedup.dedup_exact(hot_docs),
              dedup.exact_duplicates(hot_docs),
              dedup.segment_dedup(nn, seg_words=4)):
        p = plan_of(q)
        assert "Window" not in p, p
        assert "SortAggregate" not in p, p
        assert "HashAggregate" in p, p
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p


def test_segment_dedup_single_explode_no_joinback(spark, hot_docs):
    """Round-14 optimization: segment_dedup needs only per-document
    COUNTS, never the marked per-instance rows, so the witness
    join-back — which recomputed the entire explode pipeline for the
    probe side (per-branch column pruning defeats exchange reuse) and
    shuffled every segment INSTANCE through the join — is gone: the
    owner doc is decoded from the packed min key with an exact decimal
    integral division.  Plan pins: exactly ONE Generate (the explode
    is computed once), and every join input is a per-doc/per-segment
    AGGREGATE (no join consumes the raw exploded stream)."""
    import re
    nn = hot_docs.filter(F.col("text").isNotNull())
    p = plan_of(dedup.segment_dedup(nn, seg_words=4))
    tree = p.split("(1) ")[0]     # node tree only; details repeat names
    assert tree.count("Generate") == 1, p
    # the exploded stream's one consumer is a HashAggregate, never a
    # join probe: walking UP from the Generate node (strictly
    # decreasing indentation = ancestor chain), a HashAggregate must
    # appear before any Join does
    lines = tree.splitlines()

    def _depth(ln):
        return len(re.match(r"^[\s:+|-]*", ln).group(0))

    gi = next(i for i, ln in enumerate(lines) if "Generate" in ln)
    d = _depth(lines[gi])
    first_anc = None
    for i in range(gi - 1, -1, -1):
        di = _depth(lines[i])
        if di < d:
            d = di
            if "HashAggregate" in lines[i]:
                first_anc = "agg"
                break
            if "Join" in lines[i]:
                first_anc = "join"
                break
    assert first_anc == "agg", p
    # owner decode keeps the skew-proof shape pins of the old form
    assert "Window" not in p and "SortAggregate" not in p, p


def test_segment_dedup_owner_decode_null_id(spark):
    """The decoded-owner form must keep the join-back form's null-id
    semantics bit-for-bit: a null-id doc's instances never win
    ownership (min skips null packed keys), its own n_owned is NULL
    (the join-back form summed NULL comparisons), and a group whose
    min lives on a real doc is owned by exactly that doc."""
    rows = [(None, "a b c d"), (1, "a b c d"), (2, "e f g h"),
            (None, "z z z z")]
    syn = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id"]): r for r in
           dedup.segment_dedup(syn, seg_words=4).collect()}
    assert out[1]["n_owned"] == 1 and out[1]["dup_frac"] == 0.0
    assert out[2]["n_owned"] == 1
    assert out[None]["n_segs"] == 2
    assert out[None]["n_owned"] is None and out[None]["dup_frac"] is None


def test_segment_dedup_owner_decode_negative_id(spark):
    """Floor-division decode of the packed min key: hashed 64-bit doc
    ids are routinely NEGATIVE, and a truncating `div` decodes the min
    key id*2^31+seg_idx of a negative id to a phantom id (e.g. -2^31+1
    -> 0), silently dropping the owner count in the left join.  Doc -1
    owns BOTH its segments (it is the globally-first occurrence of
    'a b c d' by min packed key), so its dup_frac must be 0."""
    rows = [(-1, "x x x x a b c d"), (2, "a b c d"),
            (-(2 ** 62), "q q q q")]
    syn = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           dedup.segment_dedup(syn, seg_words=4).collect()}
    assert out[-1]["n_segs"] == 2
    assert out[-1]["n_owned"] == 2 and out[-1]["dup_frac"] == 0.0
    assert out[2]["n_owned"] == 0 and out[2]["dup_frac"] == 1.0
    assert out[-(2 ** 62)]["n_owned"] == 1
    assert out[-(2 ** 62)]["dup_frac"] == 0.0
