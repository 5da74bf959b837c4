"""Random-query differential fuzzing: arbitrary generated
filter/group/agg specs must match DuckDB bit-exactly — the
property-based generalization of the fixed oracle pairs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dumbo_spark.testing import AGG_FNS, TABLE_COLS, run_spec_differential


@st.composite
def agg_spec(draw):
    table = draw(st.sampled_from(sorted(TABLE_COLS)))
    cols = TABLE_COLS[table]
    group_by = draw(
        st.lists(st.sampled_from(cols["cat"]), unique=True, max_size=2)
    )
    n_aggs = draw(st.integers(min_value=1, max_value=3))
    aggs = []
    for i in range(n_aggs):
        fn = draw(st.sampled_from(AGG_FNS))
        # decimal sums need numeric input; min/max/count_distinct work on any
        pool = cols["num"] if fn == "sum" else cols["num"] + cols["cat"]
        col = draw(st.sampled_from(pool))
        aggs.append((fn, col, f"a{i}"))
    filters = []
    if draw(st.booleans()):
        col = draw(st.sampled_from(cols["num"]))
        op = draw(st.sampled_from(["<", ">="]))
        lit = draw(st.integers(min_value=0, max_value=60))
        filters.append((col, op, float(lit)))
    return {"table": table, "group_by": group_by, "aggs": aggs, "filters": filters}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=agg_spec())
def test_random_agg_specs_match_duckdb(spark, sf_dir, spec):
    res = run_spec_differential(spark, sf_dir, spec)
    assert res.ok, res.report()


@st.composite
def join_spec(draw):
    return {
        "how": draw(st.sampled_from(["inner", "left", "left_semi", "left_anti"])),
        "c_filter": draw(st.one_of(st.none(), st.integers(0, 9000))),
        "o_filter": draw(st.one_of(st.none(), st.integers(0, 400_000))),
    }


def _join_spark(spark, sf_dir, spec):
    from pyspark.sql import functions as F

    from dumbo_spark.functions.numeric import dsum
    from dumbo_spark.sources.catalog import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    if spec["c_filter"] is not None:
        cust = cust.where(F.col("c_acctbal") >= float(spec["c_filter"]))
    if spec["o_filter"] is not None:
        orders = orders.where(F.col("o_totalprice") >= float(spec["o_filter"]))
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, spec["how"])
    aggs = [F.count("*").alias("n")]
    if spec["how"] in ("inner", "left"):
        aggs.append(F.count("o_orderkey").alias("n_orders"))
        aggs.append(dsum("c_acctbal", "sum_bal"))
    return j.groupBy("c_mktsegment").agg(*aggs)


def _join_sql(spec):
    c_w = (
        f"WHERE c_acctbal >= {float(spec['c_filter'])}" if spec["c_filter"] is not None else ""
    )
    o_w = (
        f"WHERE o_totalprice >= {float(spec['o_filter'])}" if spec["o_filter"] is not None else ""
    )
    c = f"(SELECT * FROM customer {c_w})"
    o = f"(SELECT * FROM orders {o_w})"
    if spec["how"] in ("inner", "left"):
        jt = "JOIN" if spec["how"] == "inner" else "LEFT JOIN"
        return f"""
        SELECT c_mktsegment, COUNT(*) AS n, COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM {c} c {jt} {o} o ON c.c_custkey = o.o_custkey
        GROUP BY c_mktsegment
        """
    pred = "EXISTS" if spec["how"] == "left_semi" else "NOT EXISTS"
    return f"""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM {c} c
    WHERE {pred} (SELECT 1 FROM {o} o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """


@st.composite
def setop_spec(draw):
    return {
        "op": draw(st.sampled_from(["union_all", "intersect", "except"])),
        "col_a": draw(st.sampled_from(["c_nationkey", "c_custkey"])),
        "filter_a": draw(st.one_of(st.none(), st.integers(0, 20))),
        "filter_b": draw(st.one_of(st.none(), st.integers(0, 20))),
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=setop_spec())
def test_random_setop_specs_match_duckdb(spark, sf_dir, spec):
    from pyspark.sql import functions as F

    from dumbo_spark.sources.catalog import load_table
    from dumbo_spark.testing import compare_frames, duckdb_connect

    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.select(F.col(spec["col_a"]).cast("long").alias("k"))
    b = supp.select(F.col("s_nationkey").cast("long").alias("k"))
    wa = f"WHERE {spec['col_a']} % 25 >= {spec['filter_a']}" if spec["filter_a"] is not None else ""
    wb = f"WHERE s_nationkey % 25 >= {spec['filter_b']}" if spec["filter_b"] is not None else ""
    if spec["filter_a"] is not None:
        a = a.where(F.col("k") % 25 >= spec["filter_a"])
    if spec["filter_b"] is not None:
        b = b.where(F.col("k") % 25 >= spec["filter_b"])
    if spec["op"] == "union_all":
        got = a.unionByName(b)
        op_sql = "UNION ALL"
    elif spec["op"] == "intersect":
        got = a.intersect(b)
        op_sql = "INTERSECT"
    else:
        got = a.subtract(b)
        op_sql = "EXCEPT"
    sql = f"""
    SELECT CAST({spec['col_a']} AS BIGINT) AS k FROM customer {wa}
    {op_sql}
    SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier {wb}
    """
    con = duckdb_connect(sf_dir)
    try:
        duck_pdf = con.execute(sql).fetch_df()
    finally:
        con.close()
    res = compare_frames(f"setop:{spec}", got.toPandas(), duck_pdf)
    assert res.ok, res.report()


@st.composite
def topk_window_spec(draw):
    return {
        "part": draw(st.sampled_from(["o_orderstatus", "o_orderpriority"])),
        "fn": draw(st.sampled_from(["row_number", "rank", "dense_rank"])),
        "desc": draw(st.booleans()),
        "k": draw(st.integers(1, 10)),
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=topk_window_spec())
def test_random_topk_window_specs_match_duckdb(spark, sf_dir, spec):
    # r10 note: this test and its strategy were silently SHADOWED by
    # the same-named window fuzz below from r9 until this rename —
    # the top-k-filtered variant never ran
    from pyspark.sql import Window, functions as F

    from dumbo_spark.sources.catalog import load_table
    from dumbo_spark.testing import compare_frames, duckdb_connect

    order = (
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
        if spec["desc"]
        else [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    )
    w = Window.partitionBy(spec["part"]).orderBy(*order)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[
        spec["fn"]
    ]
    spark_pdf = (
        load_table(spark, sf_dir, "orders")
        .select(spec["part"], "o_orderkey", "o_totalprice")
        .withColumn("r", fn().over(w))
        .where(F.col("r") <= spec["k"])
        .toPandas()
    )
    direction = "DESC" if spec["desc"] else "ASC"
    sql = f"""
    SELECT * FROM (
      SELECT {spec['part']}, o_orderkey, o_totalprice,
             CAST({spec['fn']}() OVER (PARTITION BY {spec['part']}
                  ORDER BY o_totalprice {direction}, o_orderkey ASC) AS INTEGER) AS r
      FROM orders)
    WHERE r <= {spec['k']}
    """
    con = duckdb_connect(sf_dir)
    try:
        duck_pdf = con.execute(sql).fetch_df()
    finally:
        con.close()
    res = compare_frames(f"window:{spec}", spark_pdf, duck_pdf)
    assert res.ok, res.report()


def test_decimal_sum_invariant_under_partitioning(spark, sf_dir):
    """The determinism contract itself: exact-decimal aggregation gives
    BIT-identical results for any partitioning (raw double sums do
    not — this is why functions/numeric.py exists)."""
    from dumbo_spark.operators.agg import group_multi_sum
    from dumbo_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    a = sorted(map(tuple, group_multi_sum(li.repartition(1)).collect()))
    b = sorted(map(tuple, group_multi_sum(li.repartition(37, "l_partkey")).collect()))
    assert a == b


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=join_spec())
def test_random_join_specs_match_duckdb(spark, sf_dir, spec):
    from dumbo_spark.testing import compare_frames, duckdb_connect

    spark_pdf = _join_spark(spark, sf_dir, spec).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        duck_pdf = con.execute(_join_sql(spec)).fetch_df()
    finally:
        con.close()
    res = compare_frames(f"join:{spec}", spark_pdf, duck_pdf)
    assert res.ok, res.report()


# ── fuzzed joins with NULLABLE keys + SKEW at the gate scale ─────────────
#
# VERDICT r10 Next #5: the fixture-key join fuzz above never exercises
# NULL join keys or pathological key skew — the classic residual risk
# (engines agree that NULL = NULL is no match, but NOT-IN-style oracles
# and NaN-coerced materializations silently diverge). These specs
# generate 15k-row left frames (the rank-gate scale) with controlled
# null density and key-domain skew; keys are STRINGS so the
# Spark→pandas→DuckDB materialization preserves NULL (a long key would
# coerce to NaN, and DuckDB treats NaN = NaN as TRUE — a false
# divergence of the harness, not the engines). Anti joins are checked
# against NOT EXISTS, the form that shares Spark's anti-join NULL
# semantics.


@st.composite
def null_skew_join_spec(draw):
    return {
        "how": draw(
            st.sampled_from(
                ["inner", "left", "right", "full", "left_semi", "left_anti"]
            )
        ),
        # key domain size: 3 = ~5k rows per key (heavy skew), 1000 =
        # mostly-unique right side
        "domain": draw(st.sampled_from([3, 10, 1000])),
        # id % mod == 0 -> NULL key; 0 disables nulls on that side
        "null_mod_l": draw(st.sampled_from([0, 2, 7])),
        "null_mod_r": draw(st.sampled_from([0, 2, 7])),
        "n_right": draw(st.sampled_from([5, 200])),
    }


def _null_skew_frame(spark, n, domain, null_mod, salt, id_offset=0):
    from pyspark.sql import functions as F

    k = F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(domain)).cast("string")
    if null_mod:
        k = F.when(F.col("id") % null_mod != 0, k)  # else NULL
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("id"),
        k.alias("k"),
        (F.pmod(F.xxhash64("id", F.lit(salt + 1)), F.lit(100))).cast(
            "double"
        ).alias("v"),
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=null_skew_join_spec())
def test_fuzzed_null_skew_joins_at_gate_scale(spark, spec):
    import duckdb
    from pyspark.sql import functions as F

    from dumbo_spark.functions.numeric import dsum
    from dumbo_spark.testing import compare_frames

    left = _null_skew_frame(spark, _GATE_N, spec["domain"], spec["null_mod_l"], 3)
    right = _null_skew_frame(
        spark, spec["n_right"], spec["domain"], spec["null_mod_r"], 11,
        id_offset=1_000_000,
    ).select(F.col("id").alias("rid"), F.col("k").alias("rk"), F.col("v").alias("w"))
    l_pdf, r_pdf = left.toPandas(), right.toPandas()

    if spec["how"] in ("left_semi", "left_anti"):
        got = left.join(right, left.k == right.rk, spec["how"]).toPandas()
        pred = "EXISTS" if spec["how"] == "left_semi" else "NOT EXISTS"
        sql = f"""
        SELECT id, k, v FROM lframe l
        WHERE {pred} (SELECT 1 FROM rframe r WHERE r.rk = l.k)
        """
    else:
        jt = {
            "inner": "JOIN", "left": "LEFT JOIN",
            "right": "RIGHT JOIN", "full": "FULL JOIN",
        }[spec["how"]]
        got = (
            left.join(right, left.k == right.rk, spec["how"])
            .groupBy(left.k.alias("lk"), right.rk.alias("rk"))
            .agg(
                F.count("*").alias("n"),
                F.count("rid").alias("n_r"),
                dsum("v", "v_sum"),
            )
            .toPandas()
        )
        sql = f"""
        SELECT l.k AS lk, r.rk AS rk, COUNT(*) AS n, COUNT(r.rid) AS n_r,
               CAST(SUM(CAST(l.v AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
        FROM lframe l {jt} rframe r ON l.k = r.rk
        GROUP BY 1, 2
        """
    con = duckdb.connect()
    try:
        con.register("lframe", l_pdf)
        con.register("rframe", r_pdf)
        duck_pdf = con.execute(sql).fetch_df()
    finally:
        con.close()
    res = compare_frames(f"nulljoin:{spec}", got, duck_pdf)
    assert res.ok, res.report()


@st.composite
def upsert_case(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    keys = draw(
        st.lists(st.integers(min_value=0, max_value=15), min_size=n, max_size=n)
    )
    versions = draw(
        st.lists(st.integers(min_value=0, max_value=5), min_size=n, max_size=n)
    )
    values = draw(
        st.lists(st.integers(min_value=-100, max_value=100), min_size=n, max_size=n)
    )
    split = draw(st.integers(min_value=0, max_value=n))
    return list(zip(keys, versions, values)), split


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(upsert_case())
def test_upsert_latest_matches_model(spark, case):
    """Property: upsert_latest == 'max version wins, update side wins
    ties' computed by a python reference model, for arbitrary
    key/version multisets split arbitrarily into snapshot/updates."""
    from dumbo_spark.operators.shape import upsert_latest

    rows, split = case
    snap_rows = [(k, v, x) for k, v, x in rows[:split]]
    upd_rows = [(k, v, x) for k, v, x in rows[split:]]
    schema = "k long, version long, x long"
    # model: per key, max (version, is_update, arrival) wins — but the
    # operator's tie-break inside one side is the window's row order,
    # which is only deterministic for unique (key, version) per side;
    # restrict to cases where the winning row is unambiguous
    best = {}
    for src, side in ((0, snap_rows), (1, upd_rows)):
        for k, v, x in side:
            cur = best.get(k)
            if cur is None or (v, src) > (cur[0], cur[1]):
                best[k] = (v, src, {x})
            elif (v, src) == (cur[0], cur[1]):
                cur[2].add(x)
    snap = spark.createDataFrame(snap_rows or [(999, -1, 0)], schema)
    upd = spark.createDataFrame(upd_rows or [(999, -1, 0)], schema)
    if not snap_rows or not upd_rows:
        return  # degenerate split: empty side handled by unionByName anyway
    got = {
        r.k: (r.version, r.x)
        for r in upsert_latest(snap, upd, key="k", version="version").collect()
    }
    assert set(got) == set(best)
    for k, (v, _src, xs) in best.items():
        assert got[k][0] == v
        assert got[k][1] in xs  # any member of the tied winning set


@st.composite
def window_spec(draw):
    from dumbo_spark.testing import WINDOW_FNS

    table = draw(st.sampled_from(sorted(TABLE_COLS)))
    cols = TABLE_COLS[table]
    partition = draw(
        st.lists(st.sampled_from(cols["cat"]), unique=True, max_size=2)
    )
    order = draw(st.sampled_from(cols["num"]))
    fn = draw(st.sampled_from(WINDOW_FNS))
    return {"table": table, "partition": partition, "order": order, "fn": fn}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=window_spec())
def test_random_window_specs_match_duckdb(spark, sf_dir, spec):
    from dumbo_spark.testing import run_window_spec_differential

    res = run_window_spec_differential(spark, sf_dir, spec)
    assert res.ok, res.report()


# ── fuzzed rank machinery at the gate scale (VERDICT r9 Next #5) ────────
#
# The r8 rank-machinery bug (repartitionByRange consumed twice with
# diverging column pruning) only manifests at row counts large enough
# for independent boundary samplings to diverge — 15k, the
# test_round9_rank_machinery scale. These specs fuzz the EXACT hazard
# shape over generated 15k-row frames with varying tie density, bucket
# count, and sort direction, comparing the repo's range-partitioned
# global_ntile/global_rank against DuckDB over the identical data
# (Spark generates, DuckDB receives the materialized frame — both
# engines see the same rows by construction).


@st.composite
def rank_machinery_spec(draw):
    return {
        # score modulus controls tie density: 7 → ~2100 rows per tied
        # score value, 999983 → essentially unique
        "mod": draw(st.sampled_from([7, 97, 9973, 999983])),
        "k": draw(st.integers(min_value=2, max_value=16)),
        "fn": draw(st.sampled_from(["ntile", "rank"])),
        "desc": draw(st.booleans()),
    }


_GATE_N = 15000


def _gate_frame(spark, mod):
    from pyspark.sql import functions as F

    return (
        spark.range(_GATE_N)
        .withColumn("score", (F.xxhash64("id") % mod).cast("double"))
        .withColumn("y", (F.xxhash64("id", F.lit(1)) % 2 == 0).cast("int"))
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=rank_machinery_spec())
def test_fuzzed_rank_machinery_at_gate_scale(spark, spec):
    import duckdb
    from pyspark.sql import functions as F

    from dumbo_spark.functions.numeric import dsum
    from dumbo_spark.operators.topk import global_ntile, global_rank
    from dumbo_spark.testing import compare_frames

    df = _gate_frame(spark, spec["mod"])
    base_pdf = df.toPandas()
    d = "DESC" if spec["desc"] else "ASC"
    score = F.col("score").desc() if spec["desc"] else F.col("score").asc()
    order = [score, F.col("id").asc()]

    if spec["fn"] == "ntile":
        # the calibration_bins hazard shape: ntile consumed by an
        # aggregate keeping EXTRA columns (exact-decimal score sum,
        # label sum) — the pruning divergence that defeated
        # ReuseExchange pre-fix
        got = (
            global_ntile(df, order, spec["k"])
            .groupBy("ntile")
            .agg(
                F.count("*").alias("c"),
                dsum("score", "score_sum"),
                F.sum("y").cast("bigint").alias("y_sum"),
            )
            .toPandas()
        )
        sql = f"""
        SELECT ntile, COUNT(*) AS c,
               CAST(SUM(CAST(score AS DECIMAL(18,2))) AS DOUBLE) AS score_sum,
               CAST(SUM(y) AS BIGINT) AS y_sum
        FROM (SELECT *, CAST(NTILE({spec['k']}) OVER
                 (ORDER BY score {d}, id ASC) AS INTEGER) AS ntile
              FROM base)
        GROUP BY ntile
        """
    else:
        # the auc_roc_exact hazard shape: the global rank kept next to
        # the full row — must be a permutation AND per-row identical
        got = (
            global_rank(df, order)
            .select("id", "score", "y", F.col("_rank").cast("bigint").alias("r"))
            .toPandas()
        )
        sql = f"""
        SELECT id, score, y,
               CAST(ROW_NUMBER() OVER (ORDER BY score {d}, id ASC)
                    AS BIGINT) AS r
        FROM base
        """
    con = duckdb.connect()
    try:
        con.register("base", base_pdf)
        duck_pdf = con.execute(sql).fetch_df()
    finally:
        con.close()
    res = compare_frames(f"rankfuzz:{spec}", got, duck_pdf)
    assert res.ok, res.report()
