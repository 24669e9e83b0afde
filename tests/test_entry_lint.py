"""Structural lint: every operator-backed `queries()` entry must execute
shipped engine code.

Rounds 8-9 eliminated the inline-replica gate-hole class by hand (an
entry that re-derives the operator's math inline means the driver's
correctness gate never executes the real operator, so the gate can't
catch a regression in it).  This test pins the invariant with AST
analysis so the class can't silently come back with new entries: each
entry must import from `xgboost_spark` — directly or through a local
helper chain — unless it is explicitly whitelisted as a composed
training oracle, a kernel SQL twin, or a TPC-H/relational query SHAPE
whose declarative DataFrame plan *is* the operator.

Pure AST, no SparkSession needed.
"""

import ast
import inspect
import textwrap

import __spark_entry__ as E

# table/conf/parallelism plumbing — loading parquet through the engine's
# reader must NOT count as "executes the operator under test"
LOADER_HELPERS = {"_table", "_prep", "_par"}
LOADER_MODULES = {"xgboost_spark.sources.tables", "xgboost_spark.operators.util"}

#: Entries that are intentionally inline, by audited category.  A name
#: here that STARTS importing engine code fails test_whitelist_is_tight
#: so the list can only shrink.
INLINE_OK = {
    # --- TPC-H / relational / analytics query SHAPES: the declarative
    # DataFrame plan is the operator (Catalyst is the execution engine);
    # there is no separate xgboost_spark kernel to call
    "q1_pricing", "shipping_priority", "custdist", "funnel",
    "order_priority_check", "nation_volume", "market_share",
    "promo_revenue", "small_qty_revenue", "large_orders",
    "min_acctbal_supplier", "waiting_suppliers", "supplier_part_counts",
    "top_supplier", "bundle_revenue", "idle_customers",
    "revenue_forecast", "local_supplier_volume", "returned_items",
    "priority_lines", "product_profit", "important_parts",
    "excess_suppliers", "time_rollup", "pivot_events", "melt_measures",
    "json_extract", "retention", "group_quantiles", "vocab",
    # --- canonical Structured-Streaming plans: readStream -> join/window
    # -> sink is Spark-native plumbing (the engine's own streaming
    # modules are gate-covered by stream_distinct/stream_score/
    # stream_sessions/stream_dedup/train_stream)
    "stream_enrich", "stream_join", "stream_window",
    # --- composed training oracles / kernel SQL twins: deliberately
    # replay the reference math as deterministic rounded DataFrame
    # expressions so the DuckDB oracle is an independent bit-for-bit
    # replay (the REAL trainers are gate-covered by train_multi_quantile
    # / train_dart / train_expectile and the pytest parity suites)
    "fit_stump", "subsample", "train_ranker",
    "train_string_cat",
    # train_ranker's weighted twin (round 12): same composed closed
    # form plus the w_group * (n_groups/sum w) factor — the REAL
    # weighted objective/trainer code is pinned by
    # tests/test_ranking_objectives.py engine twins
    "train_ranker_weighted",
}


def _local_fn(name):
    fn = getattr(E, name, None)
    return fn if (inspect.isfunction(fn)
                  and fn.__module__ == "__spark_entry__") else None


def _scan(fn):
    """(engine modules imported, local helper names called) in fn's source."""
    src = textwrap.dedent(inspect.getsource(fn))
    mods, calls = set(), set()
    for n in ast.walk(ast.parse(src)):
        if isinstance(n, ast.ImportFrom) and n.module \
                and n.module.startswith("xgboost_spark"):
            mods.add(n.module)
        elif isinstance(n, ast.Import):
            mods |= {a.name for a in n.names
                     if a.name.startswith("xgboost_spark")}
        elif isinstance(n, ast.Call):
            if isinstance(n.func, ast.Name):
                calls.add(n.func.id)
            # a bare-name argument is a function reference handed to a
            # combinator (pool.submit(_exact_cut_values, ...), map(f, xs))
            # — part of the call graph even though it isn't a Call node
            for a in list(n.args) + [k.value for k in n.keywords]:
                if isinstance(a, ast.Name):
                    calls.add(a.id)
    return mods, calls


def touches_engine(fn, _seen=None) -> bool:
    """True if fn imports non-loader engine code, directly or through a
    chain of __spark_entry__ helper functions (recursive, cycle-safe)."""
    _seen = _seen if _seen is not None else set()
    mods, calls = _scan(fn)
    if mods - LOADER_MODULES:
        return True
    for c in calls - LOADER_HELPERS - _seen:
        _seen.add(c)
        helper = _local_fn(c)
        if helper is not None and touches_engine(helper, _seen):
            return True
    return False


def test_registry_entries_execute_engine_code():
    bad = [name for name, fn in E.queries().items()
           if name not in INLINE_OK and not touches_engine(fn)]
    assert not bad, (
        f"gate entries that never execute shipped engine code (inline "
        f"replicas?): {bad} — call the real operator or whitelist with "
        f"an audited reason in INLINE_OK")


def test_whitelist_is_tight():
    q = E.queries()
    unknown = [n for n in INLINE_OK if n not in q]
    assert not unknown, f"whitelisted names not in the registry: {unknown}"
    stale = [n for n in INLINE_OK if touches_engine(q[n])]
    assert not stale, (
        f"entries now execute engine code — remove from INLINE_OK: {stale}")


def test_lint_fails_on_synthetic_inline_replica():
    """Sensitivity self-check: a plausible inline-replica entry (loads a
    table through the loader helper, re-derives math with DataFrame
    expressions, calls no engine code) must FAIL the check."""
    assert not touches_engine(_q_fake_inline)


def _q_fake_inline(spark, sf_dir):
    from pyspark.sql import functions as F
    li = _table(spark, sf_dir, "lineitem")  # noqa: F821
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("l_tax")))
    return li.agg(F.round(F.sum(p - F.col("l_discount")), 4))


def test_lint_passes_on_rewired_entry():
    """Sensitivity self-check #2: the round-9 rewired sessionize entry
    (imports the real operator inside the function) passes, and the
    depth-2 helper chain (train_stump -> _composed_stump_rounds ->
    _exact_cut_values -> operators.sketch) resolves."""
    q = E.queries()
    assert touches_engine(q["sessionize"])
    assert touches_engine(q["train_stump"])
    # chain through a function REFERENCE: best_split ->
    # _exact_cuts_parallel -> pool.submit(_exact_cut_values, ...) ->
    # operators.sketch (the round-14 thread-pool overlap pattern)
    assert touches_engine(q["best_split"])
