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
