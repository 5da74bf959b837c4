"""Graph analytics over relational co-occurrence — triangle counting.

Dumbo's graph story was iterative MapReduce jobs the user hand-chained
(SURVEY §2.1 P6); this engine already carries iterative connected
components and PageRank (operators/dedup.py). Triangle counting is the
one-shot graph measurement that needs no iteration at all — it is three
self-joins — so it belongs to the declarative operator set: Catalyst
plans the join order, AQE handles the skew, and the whole thing is
oracle-checkable SQL.

Scale notes baked into the shape:

- The co-occurrence fan-out is quadratic in basket size, so baskets
  above ``max_basket`` are dropped BEFORE pairing (the standard
  market-basket guard: a 10k-line order would emit 50M pairs and
  contributes no signal).
- Edges are canonicalized ``src < dst`` and triangles enumerated
  ``a < b < c``, so each triangle is counted exactly once with no
  post-hoc division by 6 — and the join fan-out stays bounded by the
  thresholded edge list, which the ``min_cooccur`` support filter keeps
  sparse (raising support is how you scale this: edges fall off
  long-tail-first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def copurchase_triangles(
    lineitem: DataFrame, min_cooccur: int = 2, max_basket: int = 20
) -> DataFrame:
    """Triangle census of the part co-purchase graph: parts are nodes,
    an edge connects two parts appearing together in ≥ ``min_cooccur``
    distinct orders, and the result is one row with node, edge, and
    triangle counts — the clustering-structure summary of a
    co-occurrence graph.
    """
    po = lineitem.select("l_orderkey", "l_partkey").distinct()
    ok_orders = (
        po.groupBy("l_orderkey")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") <= max_basket)
        .select("l_orderkey")
    )
    po = po.join(ok_orders, "l_orderkey")
    a, b = po.alias("a"), po.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count("*").alias("_w"))
        .where(F.col("_w") >= min_cooccur)
        .select("src", "dst")
        .persist()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    triangles = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).join(
        e3,
        (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
    )
    nodes = edges.select(F.col("src").alias("n")).unionAll(
        edges.select(F.col("dst").alias("n"))
    )
    result = (
        nodes.agg(F.countDistinct("n").alias("n_nodes"))
        .crossJoin(F.broadcast(edges.agg(F.count("*").alias("n_edges"))))
        .crossJoin(F.broadcast(triangles.agg(F.count("*").alias("n_triangles"))))
    )
    # single-row result: materialize eagerly so the edge cache (used by
    # three join legs + two counts) can be released before returning
    result = result.persist()
    result.count()
    edges.unpersist()
    return result
