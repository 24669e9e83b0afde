"""Relational convenience operators a training-data pipeline needs that
Spark lacks as single calls: as-of join, range join, sessionization,
top-k per group.  Each is a composition of built-in DataFrame ops so
Catalyst plans it (no UDFs in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(df: DataFrame, group_cols: list[str], order_col: str, k: int,
                   desc: bool = True, tie_col: str | None = None) -> DataFrame:
    ob = [F.col(order_col).desc() if desc else F.col(order_col).asc()]
    if tie_col:
        ob.append(F.col(tie_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*ob)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str | None = None,
              tolerance_seconds: float | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (``direction="backward"``, default) or the
    earliest with ``right.on >= left.on`` (``"forward"``) in the same
    ``by`` group — pandas ``merge_asof`` directions.

    Implementation: union-and-window — tag both sides, order by
    (by, on, side) in one window, carry the last-seen right payload
    forward with ``last(ignorenulls)``.  One shuffle on ``by`` (or a
    range partition when ``by`` is None); no range-explosion theta
    join.  (Spark lacks a native as-of join; pandas ``merge_asof``
    semantics.)

    Skew caveat: the ``by``-keyed window serializes each ``by`` group
    into one task, and AQE does NOT split skewed window partitions
    (its skew handling covers shuffle joins only) — a single hot
    ``by`` key (one symbol carrying most of the tape) sorts on one
    core.  That is inherent to per-key as-of semantics here; when
    ``by`` cardinality is low-and-hot, prefer ``by=None`` per key
    slice (the range-partitioned + boundary-stitch path below, which
    parallelizes a single key across the time axis).

    ``tolerance_seconds`` on non-TIMESTAMP inputs (TIMESTAMP_NTZ /
    string) casts through the session timezone; the check depends only
    on the DIFFERENCE of two same-zone casts, so the zone cancels except
    across a DST gap — pin ``spark.sql.session.timeZone=UTC`` (as the
    harness does) for zone-independent results.
    """
    rcols = [c for c in right.columns if c not in (on, by)]
    rtypes = dict(right.dtypes)
    l_keyed = left.withColumn("_rowid", F.monotonically_increasing_id())
    l_sel = l_keyed.select(
        *([F.col(by)] if by else []), F.col(on).alias("_on"), F.col("_rowid"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in rcols],
    )
    r_sel = right.select(
        *([F.col(by)] if by else []), F.col(on).alias("_on"),
        F.lit(None).cast("long").alias("_rowid"), F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    u = l_sel.unionByName(r_sel)
    # forward = the same carry-last trick over the REVERSED order: the
    # last right row seen scanning desc(on) is the earliest one >= on;
    # at equal keys _side asc puts right(0) before left(1) either way,
    # so exact-timestamp matches join in both directions
    asc = direction == "backward"
    on_order = F.col("_on").asc() if asc else F.col("_on").desc()
    # the matched right row travels as ONE struct so all its columns come
    # from the SAME row (per-column last(ignorenulls) would mix rows when
    # a right column is legitimately NULL)
    rstruct = F.struct(F.col("_on").alias("_m_on"),
                       *[F.col(f"_r_{c}").alias(c) for c in rcols])
    carry_in = F.when(F.col("_side") == 0, rstruct)
    if by is not None:
        w = (Window.partitionBy(by)
             .orderBy(on_order, F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
        m = u.withColumn("_m", F.last(carry_in, ignorenulls=True).over(w))
    else:
        # no grouping key: a bare window would collapse to ONE partition
        # (WindowExec "No Partition Defined") — instead range-partition
        # on the time axis, carry within each partition in parallel, and
        # stitch partitions with a tiny (n_partitions-row) boundary
        # table, exactly the operators/scan.prefix_sums pattern
        spark = u.sparkSession
        n_part = spark.sparkContext.defaultParallelism
        # range key is _on ONLY: adding _side to the key lets a range
        # boundary fall BETWEEN the two sides of one timestamp (right
        # t0 in partition p, left t0 in p+1) and the forward-direction
        # boundary carry — which only consults partitions ABOVE p+1 —
        # then misses the exact-timestamp match.  Keying on _on alone
        # co-locates every tie, so in-partition window order handles
        # equal keys in both directions.
        d = (u.repartitionByRange(n_part, F.col("_on"))
               .sortWithinPartitions("_on", "_side")
               .withColumn("_pid", F.spark_partition_id()))
        d = d.localCheckpoint(eager=True)  # pin partitioning for both passes
        w = (Window.partitionBy("_pid")
             .orderBy(on_order, F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
        d = d.withColumn("_m", F.last(carry_in, ignorenulls=True).over(w))
        # per-partition extreme right row (the value carried OUT of the
        # partition in scan order), then a prefix carry-last over the
        # n_part boundary rows (metadata-scale; its global window is
        # bounded by the partition count, not the data)
        extreme = F.max_by if asc else F.min_by
        bnd = (d.filter(F.col("_side") == 0)
                 .groupBy("_pid").agg(extreme(rstruct, F.col("_on")).alias("_bm")))
        pids = spark.range(n_part).select(F.col("id").cast("int").alias("_pid"))
        wb = (Window.orderBy(F.col("_pid").asc() if asc else F.col("_pid").desc())
              .rowsBetween(Window.unboundedPreceding, -1))
        carry = (pids.join(bnd, "_pid", "left")
                 .withColumn("_carry", F.last("_bm", ignorenulls=True).over(wb))
                 .select("_pid", "_carry"))
        m = (d.join(F.broadcast(carry), "_pid")
              .withColumn("_m", F.coalesce(F.col("_m"), F.col("_carry"))))
    matched = m.filter(F.col("_side") == 1).select(
        "_rowid", F.col("_m._m_on").alias("_last_on"),
        *[F.col(f"_m.{c}").alias(c) for c in rcols])
    out = l_keyed.join(matched, "_rowid", "left")
    if tolerance_seconds is not None:
        gap = (F.unix_timestamp(F.col(on).cast("timestamp"))
               - F.unix_timestamp(F.col("_last_on").cast("timestamp")))
        if direction == "forward":
            gap = -gap
        within = gap <= F.lit(float(tolerance_seconds))
        for c in rcols:
            out = out.withColumn(c, F.when(within, F.col(c)))
    return out.drop("_rowid", "_last_on")


def range_join(left: DataFrame, ranges: DataFrame, value_col: str,
               lo_col: str = "lo", hi_col: str = "hi",
               bucket_width: float | None = None) -> DataFrame:
    """value-in-[lo,hi) join.  With ``bucket_width`` both sides are
    bucketized so the join is an equi-join on bucket + residual filter
    (avoids the O(n*m) theta join); ranges spanning multiple buckets are
    exploded on the (small) ranges side.
    """
    if bucket_width is None:
        return left.join(ranges, (F.col(value_col) >= F.col(lo_col))
                         & (F.col(value_col) < F.col(hi_col)))
    bw = float(bucket_width)
    l_b = left.withColumn("_bkt", F.floor(F.col(value_col) / bw))
    r_b = ranges.withColumn(
        "_bkt",
        F.explode(F.sequence(F.floor(F.col(lo_col) / bw), F.floor((F.col(hi_col)) / bw))),
    )
    return (
        l_b.join(r_b, "_bkt")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("_bkt")
    )


def sessionize(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Sessionization: new session when the gap to the previous event of
    the same user exceeds the threshold; session_id = cumulative count
    of session starts.  One shuffle on user.

    Non-TIMESTAMP ``ts_col`` inputs (TIMESTAMP_NTZ / string) are cast to
    session-zone TIMESTAMP; gap arithmetic depends only on differences,
    so the session timezone cancels out, and the window orders by the
    SAME casted expression so ordering and gaps always agree."""
    ts_ltz = F.col(ts_col).cast("timestamp")
    w = Window.partitionBy(user_col).orderBy(ts_ltz)
    gap = F.unix_timestamp(ts_ltz) - F.unix_timestamp(F.lag(ts_ltz).over(w))
    d = df.withColumn("_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return d.withColumn("session_id", F.sum("_new").over(wc)).drop("_new")


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt_factor: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join that survives a skewed key without AQE: the LEFT (big,
    skewed) side gets a random-but-deterministic salt in [0, salt_factor)
    derived from a content hash of its other columns; the RIGHT side is
    EXPLODED salt_factor times so every (key, salt) pair matches.  One
    hot key's rows then spread over ``salt_factor`` reducers instead of
    one straggler task.

    Same result set as ``left.join(right, key, how)`` for inner/left
    joins (right-side duplication is undone by the salt equality).  Use
    when the skew is known and AQE's runtime skew-split isn't available
    (e.g. inside a cached subplan).  The right side grows by
    ``salt_factor`` — keep it the smaller input.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    others = [c for c in left.columns if c != key] or [key]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in others]),
                  F.lit(salt_factor)).cast("int")
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])))
    return l.join(r, [key, "_salt"], how).drop("_salt")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16,
               out_col: str = "zkey",
               ranges: dict[str, tuple[float, float]] | None = None) -> DataFrame:
    """Z-order (Morton) clustering key over 2+ numeric columns: each
    column min-max-normalizes to a ``bits``-bit integer and the bits
    interleave, so sorting by ``out_col`` co-locates rows that are close
    in EVERY dimension — the layout trick behind multi-column data
    skipping (write sorted by zkey; parquet row-group min/max stats then
    prune on any of the columns, not just the leading sort key).

    ``ranges``: optional {col: (min, max)}; default = one tiny agg for
    all columns.  The key itself is a pure column expression (shifts and
    ORs), so the only cost beyond the scan is the final sort-for-write.
    """
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds a signed long")
    if ranges is None:
        row = df.agg(*[f for c in cols
                       for f in (F.min(c).alias(f"mn_{c}"),
                                 F.max(c).alias(f"mx_{c}"))]).first()
        ranges = {c: (float(row[f"mn_{c}"]), float(row[f"mx_{c}"])) for c in cols}
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = ranges[c]
        span = (hi - lo) or 1.0
        q = F.floor((F.col(c) - lo) / span * top + 0.5).cast("bigint")
        scaled.append(F.greatest(F.lit(0), F.least(F.lit(top), q)))
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, s in enumerate(scaled):
            # bit b of column i lands at position b*len(cols)+i
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit.cast("bigint"), b * len(cols) + i)
    return df.withColumn(out_col, z)
