"""Graph analytics operators over edge-list DataFrames.

Engine additions beyond the reference's per-locus grouping
(SparkGA1.scala:837-839 has no graph analogue): triangle counting /
clustering coefficients and single-source BFS, both expressed as
DataFrame joins so Catalyst handles distribution. Iterative pieces
follow the connected_components recipe (operators/dedup.py):
localCheckpoint per round, driver work limited to tiny frontier
counts.

Edge-list contract: `edges` holds one row per UNDIRECTED edge with
columns (a, b), a < b, no duplicates, no self-loops (the
normalized form `undirected_edges` produces).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparkga1_spark.operators.cache import tracked_persist


def undirected_edges(df: DataFrame, u: Column, v: Column) -> DataFrame:
    """Normalize arbitrary (u, v) endpoint expressions into the
    canonical undirected edge list: least/greatest ordering, loops
    dropped, duplicates collapsed.

    r13 (guide §2.5 input skew): the keyed repartition ahead of
    distinct moves the dedup HashAggregate behind the exchange. The
    draw stream is nearly duplicate-free (600,288 → 600,187 at sf0.1,
    0.02%), so the map-side partial aggregate reduced nothing while
    running at the SCAN's parallelism — one task when the input is a
    single row group (profiled: the distinct exchange's max-per-writer
    = its total). Exchange count is unchanged (the repartition IS the
    distinct's exchange — same key, so the agg needs no second one)
    and the hash-partitioning requirement is key-derived, not a
    local[32] constant; at scale the shuffle carries the same rows it
    did before minus the pointless single-task pre-pass."""
    return (
        df.filter(u != v)
        .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .repartition(F.col("a"), F.col("b"))
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node triangle count, degree, and local clustering
    coefficient 2T/(d(d-1)).

    Degree-ordered orientation (each edge directed from its lower
    (degree, id) endpoint) bounds the wedge fan-out by out-degree —
    O(sqrt(m)) on any graph, the arboricity argument — so hub nodes
    never generate quadratic wedge sets the way the naive a<b<c triple
    join does. Wedges are per-source out-neighbor pairs, closed by one
    equi-join against the oriented edge set; each triangle is listed
    exactly once and credits all three corners."""
    edges = tracked_persist(edges)
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("nb")).union(
        edges.select(F.col("b"), F.col("a"))
    )
    deg = adj.groupBy("v").agg(F.count("*").alias("degree"))
    deg = tracked_persist(deg)
    # plain equi-joins on the degree table — AQE broadcasts it when it
    # is actually small; a forced broadcast of a |V|-row table would
    # cap the operator at driver broadcast limits on big graphs
    da = deg.select(F.col("v").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("degree").alias("degb"))
    keyed = edges.join(da, "a").join(db, "b")
    lo_first = F.struct(F.col("dega"), F.col("a")) < F.struct(
        F.col("degb"), F.col("b")
    )
    o = keyed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    o = tracked_persist(o)
    # r13 optimization (guide §2.4/§5): od feeds BOTH sides of the
    # wedge self-join; unpersisted, Spark evaluates the o⋈deg join
    # once per side (no CSE across self-join aliases)
    od = tracked_persist(
        o.join(deg.withColumnRenamed("v", "dst"), "dst").select(
            "src", "dst", F.col("degree").alias("degd")
        )
    )
    w1, w2 = od.alias("w1"), od.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (
            F.struct(F.col("w1.degd"), F.col("w1.dst"))
            < F.struct(F.col("w2.degd"), F.col("w2.dst"))
        ),
    ).select(
        F.col("w1.src").alias("x"),
        F.col("w1.dst").alias("y"),
        F.col("w2.dst").alias("z"),
    )
    tri = wedges.join(
        o.select(F.col("src").alias("y"), F.col("dst").alias("z")),
        ["y", "z"],
        "semi",
    )
    # r13 optimization (guide §1.2 — don't compute things three
    # times): the former union of three single-corner selects
    # re-evaluated the whole wedge-join + semi-join subtree once PER
    # BRANCH (profiled at sf0.1: three identical ~15 task-s stages,
    # stages 40/60/80). One explode over the corner triple lists the
    # same multiset in a single evaluation — map-side, no extra
    # shuffle. Measured 2.3 -> 2.05 s median (steal-checked A/B),
    # counts identical.
    tn = (
        tri.select(
            F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("v")
        )
        .groupBy("v")
        .agg(F.count("*").alias("n_tri"))
    )
    from sparkga1_spark.functions.numeric import hround

    return (
        deg.join(tn, "v", "left")
        .select(
            F.col("v").alias("node"),
            F.col("degree").cast("long").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_triangles"),
            hround(
                F.when(
                    F.col("degree") >= 2,
                    F.lit(2.0)
                    * F.coalesce(F.col("n_tri"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
    )


def bfs_hops(edges: DataFrame, source: int, *, max_hops: int = 8) -> DataFrame:
    """Unweighted single-source BFS levels: (node, hops) for every node
    reachable from `source` within `max_hops`. Iterative frontier
    expansion — frontier ⋈ edges, anti-join visited, union in at
    hops = round — the Pregel shape; per round the driver pays one
    emptiness check on a tiny frontier and each round's result is
    localCheckpoint()ed so the plan stays O(1)."""
    spark = edges.sparkSession
    both = edges.select(F.col("a").alias("s"), F.col("b").alias("d")).union(
        edges.select(F.col("b"), F.col("a"))
    )
    both = tracked_persist(both)
    # node is LONG throughout — review-caught: an int seed schema (and
    # an int cast on return) silently wraps node ids past 2^31, and the
    # sf-scaled host graph's id space grows with the data (m = rows/10
    # ≈ 6e10 at the 100 TB design point)
    visited = spark.createDataFrame([(source, 0)], "node long, hops long")
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(both, frontier["node"] == both["s"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("hops"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.select(F.col("node").cast("long"), F.col("hops").cast("long"))
