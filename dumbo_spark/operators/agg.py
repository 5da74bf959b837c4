"""Aggregation operators — dumbo's reducer stdlib, Catalyst-native.

Reference surface re-expressed here:

- ``sumreducer`` (dumbo/lib/__init__.py:~20): per-key sum, doubled as
  its own combiner → :func:`group_sum`. Catalyst's HashAggregate runs
  partial (map-side) + final automatically, so the combiner concept
  needs no user surface.
- ``sumsreducer`` (dumbo/lib/__init__.py:~25): elementwise tuple sum →
  :func:`group_multi_sum` (several aggregates in one pass).
- ``statscombiner``/``statsreducer`` (dumbo/lib/__init__.py:~60/~70):
  mergeable (n, Σx, Σx², min, max) partials → (count, mean, std, min,
  max) → :func:`group_stats`, same algebra but with exact decimal
  moments so results are shuffle-order-independent.
- ``examples/multicount.py`` (tagged keys, one pass, many metrics) →
  :func:`tagged_multicount` and, as the declarative upgrade,
  :func:`rollup_counts`.
- ``examples/itertwice.py`` / ``Job.additer`` (chained iterations) →
  :func:`two_phase_agg`: iteration chaining is just plan composition;
  Catalyst pipelines both "jobs" with no temp-path materialization.

Scale notes (100 TB): every aggregate here is algebraic → map-side
partial aggregation bounds shuffle volume by |groups|·partitions, not
by input rows. Group-by keys are low-cardinality; AQE coalesces the
tiny post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dumbo_spark.functions.numeric import dmoney, dsum


def group_sum(lineitem: DataFrame) -> DataFrame:
    """Per-key sum (lib.sumreducer): total quantity per return flag."""
    return lineitem.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"),
    )


def group_multi_sum(lineitem: DataFrame) -> DataFrame:
    """Elementwise multi-sum (lib.sumsreducer): several metrics, one pass."""
    revenue = dmoney("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dmoney("l_discount"))
    return lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        F.sum(revenue).cast("double").alias("sum_revenue"),
        F.count("*").alias("n_rows"),
    )


def group_stats(lineitem: DataFrame) -> DataFrame:
    """(count, mean, std, min, max) per key (lib.statsreducer).

    Same mergeable-moments algebra as dumbo's statscombiner —
    (n, Σx, Σx²) partials — but on exact decimals, then finalized in
    float and rounded to 4dp so the result is independent of shuffle
    order (a raw stddev over doubles is not).
    """
    d = dmoney("l_extendedprice")
    n = F.count("*")
    s = F.sum(d)
    s2 = F.sum(d * d)
    mean = s.cast("double") / n
    var = s2.cast("double") / n - mean * mean
    return lineitem.groupBy("l_returnflag").agg(
        n.alias("n_items"),
        F.round(mean, 4).alias("mean_price"),
        F.round(F.sqrt(var), 4).alias("std_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


def count_distinct(orders: DataFrame) -> DataFrame:
    """Exact distinct (absent in dumbo — SURVEY §2.4 gap row)."""
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


def approx_distinct(events: DataFrame) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path where exact distinct's
    full shuffle of the key column is the bottleneck. No SQL oracle:
    Spark's HLL++ and DuckDB's sketch give different estimates by
    design (rows-only check; a unit test pins relative error < 5%)."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count("*").alias("n_events"),
    )


def approx_distinct_checked(events: DataFrame) -> DataFrame:
    """:func:`approx_distinct` with its error bound made EXTERNALLY
    checkable (VERDICT r4 #6): the sketch estimate itself is
    engine-specific, but the CLAIM about it — within 5% of exact — is
    a boolean an ANSI oracle can assert (the oracle computes exact and
    emits TRUE; a sketch drifting out of bounds flips the hash).
    rsd=0.01 gives ~5σ of headroom under the 5% gate (ADVICE r5: the
    earlier rsd=0.02 left only ~2.5σ, close enough for a fixture
    regeneration or HLL seed change to flip the boolean).

    Output: (event_type, exact_users, n_events, within_5pct)."""
    est = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("_approx"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count("*").alias("n_events"),
    )
    return est.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("within_5pct"),
    )


def hll_rollup_checked(events: DataFrame) -> DataFrame:
    """:func:`hll_partitioned_counts`' mergeability claim made
    externally checkable (VERDICT r4 #6): per-(day, type) Datasketches
    HLL sketches, unioned per type, must estimate within 5% of the
    exact distinct — the oracle computes the exact count and day
    cardinality and asserts TRUE for the bound. Register-max merge is
    commutative and fixed-seed, so the boolean is run-stable.
    lgConfigK=14 puts the sketch RSE at ~0.8%, ≥6σ under the 5% gate
    (ADVICE r5: the lgK-12 default's ~1.6% RSE left only ~3σ).

    Output: (event_type, n_days, exact_users, within_5pct)."""
    daily = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_approx"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("within_5pct"),
    )


def approx_percentiles_checked(lineitem: DataFrame) -> DataFrame:
    """:func:`approx_percentiles`' rank-error guarantee made externally
    checkable (VERDICT r4 #6), in RANK space: the sketch value's true
    rank interval [#(x < v)+1, #(x ≤ v)] must intersect
    p·n ± (n/accuracy + 2) — exact integer counts, so the boolean is
    independent of the interpolation-definition differences that make
    the sketch VALUES engine-specific. The oracle computes group sizes
    and asserts TRUE per band.

    Scale: the second pass is one broadcast join (|groups| rows) plus
    a conditional-count scan — no extra shuffle of the fact side.

    Output: (l_returnflag, n_rows, p50_in_band, p90_in_band)."""
    price = F.col("l_extendedprice").cast("double")
    ap = lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.approx_percentile(price, F.array(F.lit(0.5), F.lit(0.9)), 10_000).alias(
            "_ap"
        ),
    )
    j = lineitem.select("l_returnflag", price.alias("_x")).join(
        F.broadcast(ap), "l_returnflag"
    )
    counts = j.groupBy("l_returnflag").agg(
        F.max("n_rows").alias("n_rows"),
        F.sum((F.col("_x") < F.col("_ap")[0]).cast("long")).alias("_lt50"),
        F.sum((F.col("_x") <= F.col("_ap")[0]).cast("long")).alias("_le50"),
        F.sum((F.col("_x") < F.col("_ap")[1]).cast("long")).alias("_lt90"),
        F.sum((F.col("_x") <= F.col("_ap")[1]).cast("long")).alias("_le90"),
    )
    n = F.col("n_rows").cast("double")
    slack = n / F.lit(10_000.0) + F.lit(2.0)

    def in_band(p: float, lt: str, le: str):
        target = F.lit(p) * n
        return (F.col(lt) <= target + slack) & (F.col(le) >= target - slack)

    return counts.select(
        "l_returnflag",
        "n_rows",
        in_band(0.5, "_lt50", "_le50").alias("p50_in_band"),
        in_band(0.9, "_lt90", "_le90").alias("p90_in_band"),
    )


def rollup_counts(orders: DataFrame) -> DataFrame:
    """ROLLUP over status × priority — the declarative upgrade of
    examples/multicount.py's hand-tagged multi-level counts."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


def cube_counts(orders: DataFrame) -> DataFrame:
    """CUBE over status × priority — all 2ⁿ grouping sets in one pass
    (absent in dumbo; rollup's sibling, SURVEY §2.4)."""
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice", "sum_price")
    )


def grouping_sets_counts(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — the general form of rollup/cube
    (absent in dumbo; the E5 tagged-key idiom is its manual cousin).
    One pass computes (status, priority), (priority) and the grand
    total; the (status)-only set is deliberately omitted to show the
    sets are arbitrary, not a rollup prefix chain."""
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "sum_price"))


def tagged_multicount(documents: DataFrame) -> DataFrame:
    """examples/multicount.py: one pass emitting several keyed metrics.

    Dumbo's mapper emits ('lang:<x>', 1) and ('source:<y>', 1) style
    tagged keys; here a single generated ``explode(array(...))`` feeds
    one hash aggregate — still one pass, one shuffle.
    """
    tag = F.explode(
        F.array(
            F.concat(F.lit("lang:"), F.col("lang")),
            F.concat(F.lit("source:"), F.col("source")),
        )
    ).alias("tag")
    return documents.select(tag).groupBy("tag").agg(F.count("*").alias("n_docs"))


def group_percentiles(lineitem: DataFrame) -> DataFrame:
    """Exact percentiles per group (absent in dumbo — computing a
    median under MapReduce required a full secondary sort job).

    ``F.percentile`` (exact, linear interpolation) matches DuckDB's
    ``quantile_cont``; it sorts each group inside one task, so this is
    the documented small-input shape. The 100 TB forms are
    :func:`bucketed_group_percentiles` (EXACT, range-partitioned, same
    oracle) and ``approx_percentile`` (t-digest, fixed memory,
    unit-test bound instead of an oracle, like HLL).
    """
    pcts = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.get(pcts, 0), 4).alias("p50_price"),
        F.round(F.get(pcts, 1), 4).alias("p90_price"),
        F.round(F.get(pcts, 2), 4).alias("p99_price"),
    )


def approx_percentiles(lineitem: DataFrame) -> DataFrame:
    """Sketch percentiles (approx_percentile / t-digest-style) — the
    100 TB path where exact percentiles' full value shuffle is the
    bottleneck. Fixed accuracy knob, bounded memory. Like HLL: engines'
    sketches differ → rows-only check + unit-tested error bound."""
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", 0.5, 10_000).alias("p50_price"),
        F.approx_percentile("l_extendedprice", 0.9, 10_000).alias("p90_price"),
    )


def hourly_active_users(events: DataFrame) -> DataFrame:
    """Distinct users per hour × event type — the canonical activity
    metric (exact distinct per calendar bucket; the streaming twin
    would use HLL state)."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def group_collect(lineitem: DataFrame) -> DataFrame:
    """Deterministic collect-to-array: per key, the SORTED distinct
    statuses (collect_set order is arbitrary; array_sort fixes the
    contract — dumbo reducers that built Python lists had the same
    arbitrary-order trap)."""
    return lineitem.groupBy("l_returnflag").agg(
        F.array_sort(F.collect_set("l_linestatus")).alias("statuses"),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


def pivot_status(lineitem: DataFrame) -> DataFrame:
    """Pivot (absent in dumbo; the manual version is multicount's
    tagged keys). Pivot values are declared, not discovered — at scale
    an undeclared pivot is two jobs (distinct scan + agg)."""
    return (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dmoney("l_quantity")).cast("double"))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
    )


def two_phase_agg(orders: DataFrame) -> DataFrame:
    """examples/itertwice.py / Job.additer: two chained MR iterations.

    Phase 1 keys by customer (orders per customer); phase 2 re-keys by
    the phase-1 value (customers per order-count). In dumbo this is two
    Hadoop jobs with a temp path between; here it is one plan with two
    exchanges that Catalyst pipelines — no intermediate materialization.
    """
    per_customer = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return per_customer.groupBy("n_orders").agg(F.count("*").alias("n_customers"))

def price_histogram(orders: DataFrame, width: int = 25_000) -> DataFrame:
    """Fixed-width histogram of order value (absent in dumbo; the
    MapReduce idiom was mapper-side bucketing + sumreducer — this is
    that idiom as one hash aggregate).

    The bucket id is exact integer arithmetic on the decimal price
    (floor division), so bucket edges are engine-independent; the
    aggregate is a plain partial+final count/sum — the cheapest
    possible shape at 100 TB.
    """
    bucket = F.floor(dmoney("o_totalprice") / width).cast("bigint")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * width).cast("double"))
    )


def hll_partitioned_counts(events: DataFrame) -> DataFrame:
    """Distinct users per event type via MERGEABLE HLL sketches: build
    a Datasketches HLL per (day, type) partition, then union the daily
    sketches per type and estimate — the pre-aggregation pattern that
    makes 100 TB distinct-counting incremental (yesterday's sketches
    are a few KB each and never recomputed; today's partition is the
    only new work; any rollup level merges for free, which a raw
    ``approx_count_distinct`` over the union cannot do).

    Deterministic given the input set (register-max merge is
    commutative, the hash is fixed-seed), so the estimate column is
    run-stable — but engine-specific, hence rows-only externally; the
    error bound vs exact is pinned in tests/test_round4_ops.py.
    """
    daily = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        )
    )


def winsorized_stats(lineitem: DataFrame) -> DataFrame:
    """Winsorized (percentile-clipped) robust mean per group: clip
    ``l_extendedprice`` to its group's [p05, p95] and average — the
    outlier-resistant aggregate feature pipelines use where a plain
    mean is hostage to a few extreme rows (absent in dumbo: exact
    percentiles needed a dedicated secondary-sort job, lib/__init__.py
    statsreducer only tracked min/max).

    Determinism: the clip bounds are exact percentiles rounded to 2dp
    and cast to DECIMAL(18,2), so clipping and the clipped sum are
    exact decimal arithmetic — order-independent; only the final mean
    division is floating point. Plan shape: one percentile pass per
    group (tiny result, broadcast back) + one scan-aggregate pass —
    two scans, no window, no skew hazard at 100 TB.

    Round-5 upgrade: the bounds pass now runs through
    :func:`grouped_exact_percentiles` (range-partitioned exact ranks),
    so no group ever sorts inside one task — the last member of the
    exact-percentile perf-weak family retired, with the SAME oracle
    (the interpolation reproduces quantile_cont bit-for-bit).
    """
    bounds = grouped_exact_percentiles(
        lineitem,
        "l_returnflag",
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        (0.05, 0.95),
        ("_lo_d", "_hi_d"),
        round_dp=2,
    ).select(
        "l_returnflag",
        F.col("_lo_d").cast("decimal(18,2)").alias("_lo"),
        F.col("_hi_d").cast("decimal(18,2)").alias("_hi"),
    )
    v = dmoney("l_extendedprice")
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        lineitem.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_lo").cast("double").alias("clip_lo"),
            F.min("_hi").cast("double").alias("clip_hi"),
            F.sum((v < F.col("_lo")).cast("long")).alias("n_clipped_lo"),
            F.sum((v > F.col("_hi")).cast("long")).alias("n_clipped_hi"),
            F.round(
                F.sum(clipped).cast("double") / F.count("*").cast("double"), 4
            ).alias("winsor_mean"),
        )
    )


def weighted_median_price(lineitem: DataFrame) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median price per return flag — the
    weighted-percentile primitive (plain medians answer "the typical
    line"; this answers "the typical shipped unit", which is what
    pricing reads). No built-in computes it: weighted quantiles need a
    cumulative-weight sweep over the value order.

    Scale-safe two-phase form (same family as topk.global_rank):
    range-repartition on (flag, price, tie-break) so each task holds a
    contiguous value range, sum weights per (partition, flag), prefix
    those per-partition sums over the tiny (num_partitions × |flags|)
    frame, then one in-partition cumulative-weight window — no task
    ever sweeps a whole flag's rows. The median is the first price
    where 2·cum ≥ total (exact DECIMAL compare, no division).

    Output: (l_returnflag, total_qty, weighted_median_price).
    """
    cum = _weighted_cum_sweep(lineitem)
    return (
        cum.where(F.lit(2) * F.col("_cum") >= F.col("_tot"))
        .groupBy("l_returnflag")
        .agg(
            F.max("_tot").cast("double").alias("total_qty"),
            F.min("_p").cast("double").alias("weighted_median_price"),
        )
    )


def _weighted_cum_sweep(lineitem: DataFrame) -> DataFrame:
    """The SHARED quantity-weighted cumulative sweep behind
    :func:`weighted_median_price` and :func:`weighted_price_quartiles`
    (round-5 second review: the two had diverging copies):
    range-repartition on (flag, price, tie-break), per-(partition,
    flag) weight sums prefix-summed over the tiny partition×flag
    frame, one in-partition cumulative-weight window. Returns
    (l_returnflag, _p price, _cum cumulative qty, _tot flag total) —
    callers apply their threshold aggregates.
    """
    from dumbo_spark.operators.topk import shuffle_partitions

    price = F.col("l_extendedprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    li = lineitem.select(
        "l_returnflag",
        price.alias("_p"),
        qty.alias("_q"),
        "l_orderkey",
        "l_linenumber",
    )
    parts = shuffle_partitions(li)
    order = [
        F.col("l_returnflag").asc(),
        F.col("_p").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]
    # localCheckpoint pins ONE realization of the range shuffle before
    # the offsets/data branch split — without it the two branches can
    # each sample their own boundaries when pruning defeats
    # ReuseExchange, and the offsets silently describe the wrong
    # partitions (the round-9 global_rank fix; full mechanism in
    # topk.global_rank).
    r = (
        li.repartitionByRange(parts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    pc = r.groupBy("_pid", "l_returnflag").agg(F.sum("_q").alias("_w"))
    w_off = (
        Window.partitionBy("l_returnflag")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = pc.select(
        "_pid",
        "l_returnflag",
        F.coalesce(F.sum("_w").over(w_off), F.lit(0).cast("decimal(18,2)")).alias(
            "_off"
        ),
    )
    totals = li.groupBy("l_returnflag").agg(F.sum("_q").alias("_tot"))
    w_in = (
        Window.partitionBy("_pid", "l_returnflag")
        .orderBy("_p", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r.join(F.broadcast(offsets), ["_pid", "l_returnflag"])
        .join(F.broadcast(totals), "l_returnflag")
        .withColumn("_cum", F.col("_off") + F.sum("_q").over(w_in))
        .select("l_returnflag", "_p", "_cum", "_tot")
    )


def grouped_exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_cols: list,
    ps: tuple,
    aliases: tuple,
    round_dp: int = 4,
) -> DataFrame:
    """EXACT per-group continuous quantiles WITHOUT per-group sorts —
    the generic machinery behind :func:`bucketed_group_percentiles`
    and events.daily_value_percentiles.

    Same two-phase family as :func:`weighted_median_price` but
    count-based and interpolating: range-repartition on (group, value,
    tie-breaks), per-(partition, group) counts prefix-summed over the
    tiny partition×group frame give each row its exact within-group
    rank; the continuous-quantile targets (h = (n−1)p + 1, the
    quantile_cont definition) select the two bracketing order
    statistics per (group, p) via a broadcast target join, and the
    final interpolation is scalar math. No task ever holds more than
    one contiguous value range of one group — the property
    ``F.percentile``'s single-task group sort loses at 100 TB.

    Output: one row per group — (group_col, *aliases), ``round_dp``dp.
    """
    base = df.select(
        group_col, F.col(value_col).cast("double").alias("_v"), *tiebreak_cols
    )
    from dumbo_spark.operators.topk import shuffle_partitions

    parts = shuffle_partitions(base)
    order = [
        F.col(group_col).asc(),
        F.col("_v").asc(),
        *[F.col(c).asc() for c in tiebreak_cols],
    ]
    # localCheckpoint: pin one realization of the range shuffle before
    # the offsets/data branch split (round-9 global_rank fix — see
    # topk.global_rank for the full dual-exchange mechanism).
    r = (
        base.repartitionByRange(parts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    pc = r.groupBy("_pid", group_col).agg(F.count("*").alias("_c"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = pc.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("_pid", group_col).orderBy("_v", *tiebreak_cols)
    ranked = r.join(F.broadcast(offsets), ["_pid", group_col]).withColumn(
        "_rank", F.col("_off") + F.row_number().over(w_in)
    )
    # quantile targets in double: (n-1)*p+1 with floor/ceil is exact as
    # long as the product is below 2^53 ulp-loss territory — for the
    # p-grids used here (exact decimals ≤ 2 places) that holds for
    # group counts up to ~2^45, far past any per-group cardinality this
    # runs at; beyond that, compute lo/hi on integer rationals
    # (round(p*100)·(n−1) divmod 100) as the weighted-quartile path
    # does (ADVICE r5 bound note)
    n = F.col("_n").cast("double")
    # group counts from the per-partition counts over the CHECKPOINTED
    # range layout, not a second scan of the raw input (r15: the old
    # base.groupBy(count) re-read and re-projected the full input once
    # more per call; pc holds every row of r, so summing its _c per
    # group is the identical integer — guide §1.2, don't compute
    # things twice)
    targets = (
        pc.groupBy(group_col)
        .agg(F.sum("_c").alias("_n"))
        .select(
            group_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("p"),
                            F.floor((n - 1) * F.lit(p) + 1).alias("lo"),
                            F.ceil((n - 1) * F.lit(p) + 1).alias("hi"),
                            ((n - 1) * F.lit(p) + 1                 # noqa: W504
                             - F.floor((n - 1) * F.lit(p) + 1)).alias("frac"),
                        )
                        for p in ps
                    ]
                )
            ).alias("t"),
        )
        .select(group_col, "t.p", "t.lo", "t.hi", "t.frac")
    )
    hits = ranked.join(
        F.broadcast(targets),
        (ranked[group_col] == targets[group_col])
        & ((F.col("_rank") == F.col("lo")) | (F.col("_rank") == F.col("hi"))),
    ).select(ranked[group_col].alias("_grp"), "p", "frac", "_rank", "lo", "_v")
    per_p = hits.groupBy("_grp", "p", "frac").agg(
        F.max(F.when(F.col("_rank") == F.col("lo"), F.col("_v"))).alias("_vlo"),
        F.max(F.col("_v")).alias("_vhi"),
    )
    val = F.col("_vlo") + F.col("frac") * (F.col("_vhi") - F.col("_vlo"))
    wide = per_p.groupBy("_grp").agg(
        *[
            F.round(F.max(F.when(F.col("p") == F.lit(p), val)), round_dp).alias(a)
            for p, a in zip(ps, aliases)
        ]
    )
    return wide.withColumnRenamed("_grp", group_col)


def bucketed_group_percentiles(
    lineitem: DataFrame, ps: tuple = (0.5, 0.9, 0.99)
) -> DataFrame:
    """:func:`group_percentiles`' output contract computed the
    scale-safe way (see :func:`grouped_exact_percentiles` for the
    machinery and the 100 TB argument) — bit-compatible with the
    ``group_percentiles`` oracle (rounded 4dp).

    Output: (l_returnflag, p50_price, p90_price, p99_price).
    """
    return grouped_exact_percentiles(
        lineitem,
        "l_returnflag",
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        ps,
        tuple(f"p{str(p)[2:].ljust(2, '0')}_price" for p in ps),
    )


def weighted_price_quartiles(lineitem: DataFrame) -> DataFrame:
    """Exact quantity-weighted price quartiles per return flag — the
    general weighted-percentile form of :func:`weighted_median_price`
    (same range-partitioned cumulative-weight sweep, three thresholds
    in one pass): wq(p) = the smallest price whose cumulative quantity
    reaches p·total, with 100·cum ≥ ⌈100p⌉·tot as the exact integer
    comparison (no float thresholds).

    Output: (l_returnflag, wq25_price, wq50_price, wq75_price).
    """
    cum = _weighted_cum_sweep(lineitem)
    return cum.groupBy("l_returnflag").agg(
        *[
            F.min(
                F.when(
                    F.lit(100) * F.col("_cum") >= F.lit(q100) * F.col("_tot"),
                    F.col("_p"),
                )
            )
            .cast("double")
            .alias(f"wq{q100}_price")
            for q100 in (25, 50, 75)
        ]
    )
