"""Similarity search over embedding columns (BASELINE.json north star).

Two tiers, same result contract (query id → top-k neighbors):

- brute-force cosine top-k: exact; cost |Q|×|C|. The engine keeps |Q|
  bounded (a probe subset or a broadcast query batch) so the candidate
  side streams through codegen'd vector math without materializing the
  cross product.
- sign-LSH bucketed: random-hyperplane sign bits bucket the space;
  neighbor search happens within buckets (equi-join on bucket id), the
  standard recall/cost trade. Hyperplanes are derived from index
  arithmetic so both engines (and every executor) regenerate them
  identically with no side channel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from sparkga1_spark.functions import vectors
from sparkga1_spark.functions.numeric import hround
from sparkga1_spark.operators.cache import tracked_persist


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    candidate table, rank per query on rounded cosine with id tiebreak.
    Returns (query_id, cand_id, cos_sim, rank).

    Plan note (kept BNL, r8): the `query_id != cand_id` pairing is
    definitionally non-equi — brute force IS the all-pairs baseline —
    so it compiles to one BroadcastNestedLoopJoin whose build side is
    the probe-bounded query FILTER (a pushdown scan, not an aggregate);
    nothing fact-sized is replicated. The scale path is ivf_topk /
    lsh_bucket_candidates, which replace this kernel entirely."""
    # Pre-join projections do the per-row work once: the float→double
    # cast (inlined per element_at otherwise — a full-array cast × dim
    # per pair) and the norm. The per-pair expression is then just the
    # dot product (same arithmetic as cosine() — dot/(na*nb)).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vectors.to_double(F.col(vec_col)).alias("_qv"),
        vectors.norm(F.col(vec_col), dim).alias("_qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        vectors.to_double(F.col(vec_col)).alias("_cv"),
        vectors.norm(F.col(vec_col), dim).alias("_cn"),
    )
    # r13 optimization (guide §2.5 input skew / §1.2 per-task work): the
    # testdata embeddings parquet is a single row group, so the BNL's
    # stream side is ONE scan partition and the whole dot-product kernel
    # serializes on one core (measured: 1.1 s single-task stages on
    # x_knn_label_vote at sf0.1). Hash-repartition the candidate side by
    # id before the pairing so the kernel runs at full parallelism.
    # Explicit N (conf-derived, scale-adaptive) because an AQE-coalescible
    # REPARTITION_BY_COL would be folded back to ~1 partition on byte
    # grounds — bytes are the wrong proxy for the per-pair compute. The
    # extra exchange ships one pass of the (already-projected) vectors;
    # this kernel is the sanctioned small/oracle baseline (see plan
    # note above), never the 100 TB path.
    n_parts = int(
        candidates.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    c = c.repartition(n_parts, "cand_id")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos_sim",
            hround(
                vectors.dot(F.col("_qv"), F.col("_cv"), dim)
                / (F.col("_qn") * F.col("_cn")),
                6,
            ),
        )
        .drop("_qv", "_cv", "_qn", "_cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j of plane i is
    ((i*dim+j)*2654435761 mod 1000)/1000 - 0.5 (Knuth multiplicative
    hash). Exact in both engines: integer ops then one short-decimal
    division."""
    return [
        ((plane_idx * dim + j) * 2654435761 % 1000) / 1000.0 - 0.5
        for j in range(dim)
    ]


def sign_lsh_bucket(vec: Column, dim: int, n_planes: int = 4) -> Column:
    """Bucket id = sign bits of the projections onto n_planes
    hyperplanes (bit i set iff dot(v, h_i) > 0)."""
    bucket = F.lit(0)
    for i in range(n_planes):
        h = F.array(*[F.lit(x) for x in hyperplane(dim, i)])
        proj = vectors.dot(vec, h, dim)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(0)
    return bucket.cast("int")


def lsh_bucketed_neighbors(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_planes: int = 4,
    threshold: float = 0.9,
) -> DataFrame:
    """ANN near-neighbor pairs within sign-LSH buckets: bucket each
    vector (one narrow pass), self-join per bucket (equi-join — the
    shuffle key is the bucket id), exact cosine as residual filter.
    Returns (id_a, id_b, cos_sim) with id_a < id_b."""
    bucketed = df.select(
        F.col(id_col),
        vectors.to_double(F.col(vec_col)).alias("_vd"),  # cast once
        vectors.norm(F.col(vec_col), dim).alias("_n"),
        sign_lsh_bucket(F.col(vec_col), dim, n_planes).alias("_bucket"),
    )
    bucketed = tracked_persist(bucketed)  # consumed twice by the self-join
    l, r = bucketed.alias("l"), bucketed.alias("r")
    pairs = l.join(
        r,
        (F.col("l._bucket") == F.col("r._bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        hround(
            vectors.dot(F.col("l._vd"), F.col("r._vd"), dim)
            / (F.col("l._n") * F.col("r._n")),
            6,
        ).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


def _ivf_assign_vectorized(
    base: DataFrame, cent_rows: list, id_col: str, nprobe: int
) -> DataFrame:
    """Arrow-batched numpy centroid assignment for `ivf_topk` — the
    same arithmetic as the expression path, replicated bit-for-bit:
    the dot product accumulates PER DIMENSION in the identical
    sequential IEEE order (`acc += v_j * c_j` is one multiply + one add
    per (row, centroid) element, exactly the zip_with/aggregate left
    fold), rounding is the same floor(x·1e6 + 0.5)/1e6 on doubles, and
    ties resolve to the lowest centroid id (cent_rows arrive cid-
    ascending; argmin/stable argsort take the first minimum). NaN
    cosines (zero-norm vectors; never in the fixtures) map to +inf so
    they lose every min, mirroring Spark's NaN-sorts-last. Emits
    (id, _vd, _vn, cluster_id, _probes[nprobe]) — the probe list is
    only consumed for query rows."""
    import numpy as np

    C = np.array([list(r["cv"]) for r in cent_rows], dtype=np.float64)
    cn = np.array([r["cn"] for r in cent_rows], dtype=np.float64)
    cids = np.array([r["cid"] for r in cent_rows])
    n_cent, d = C.shape
    id_sql = base.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_sql}, _vd array<double>, _vn double, "
        f"cluster_id {id_sql}, _probes array<{id_sql}>"
    )
    chunk = max(1, 32_000_000 // (8 * n_cent))  # ~32 MB of score matrix

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out_cluster = np.empty(len(pdf), dtype=cids.dtype)
            out_probes = []
            V = np.array(pdf["_vd"].tolist(), dtype=np.float64)
            vn = pdf["_vn"].to_numpy(dtype=np.float64)
            for lo in range(0, len(pdf), chunk):
                hi = min(lo + chunk, len(pdf))
                dot = np.zeros((hi - lo, n_cent), dtype=np.float64)
                for j in range(d):
                    # one multiply + one add per element, dim order —
                    # the exact left-fold sequence (no reassociation)
                    dot += V[lo:hi, j : j + 1] * C[:, j][None, :]
                cos = dot / (vn[lo:hi, None] * cn[None, :])
                negcos = -(np.floor(cos * 1e6 + 0.5) / 1e6)
                negcos = np.where(np.isnan(negcos), np.inf, negcos)
                out_cluster[lo:hi] = cids[np.argmin(negcos, axis=1)]
                order = np.argsort(negcos, axis=1, kind="stable")[:, :nprobe]
                out_probes.extend(cids[row].tolist() for row in order)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "_vd": pdf["_vd"],
                    "_vn": pdf["_vn"],
                    "cluster_id": out_cluster,
                    "_probes": out_probes,
                }
            )

    return base.mapInPandas(run, schema=schema)


_CENTROID_MEMO: dict[tuple, list] = {}
_CENTROID_MEMO_MAX = 32


def _file_identities(files: tuple) -> tuple:
    """file URI list → ((uri, size, mtime_ns), ...): content identity
    for local files so an in-place rewrite under the same names misses
    the memo. Non-file schemes (and stat failures) contribute
    (uri, None, None) — path-only, as before."""
    import os
    from urllib.parse import unquote, urlparse

    out = []
    for uri in files:
        size = mtime = None
        p = urlparse(uri)
        if p.scheme in ("", "file"):
            try:
                st = os.stat(unquote(p.path))
                size, mtime = st.st_size, st.st_mtime_ns
            except OSError:
                pass
        out.append((uri, size, mtime))
    return tuple(out)


def _collect_centroids(
    df: DataFrame, *, id_col: str, vec_col: str, dim: int, centroid_pred
) -> list:
    """The k-sized centroid model pull (the sanctioned build-time
    collect), cid-ascending.

    Session-memoized (r9 VERDICT #2): the pull depends only on the
    resolved input files and the selection arguments, but it re-ran on
    every query build — a fixed ~2s job per bench iteration at sf0.1
    with zero information gain. The memo key is (resolved input file
    list WITH per-file (size, mtime) for local files — r10 ADVICE: a
    dataset rewritten in place under identical filenames must miss;
    non-local URIs contribute path-only and rely on object-store
    immutability), id/vec column, dim, and the unresolved predicate
    expression string; frames not backed by files (inputFiles() empty —
    in-memory fixtures) skip the memo, so a rebuilt fixture can never
    read stale centroids. The cached value is the k-sized model (a few
    KB), kept for the session on purpose — `release_tracked()` frees
    executor caches between queries and must NOT drop a driver-side
    model. The memo is bounded (oldest-inserted evicted past
    _CENTROID_MEMO_MAX) so a long session cannot grow it without
    limit."""
    key = None
    try:
        files = tuple(sorted(df.inputFiles()))
        # semanticHash canonicalizes exprIds, so a REBUILT identical
        # plan hits while a derived (filtered/projected) frame over the
        # same files cannot collide with the raw scan's entry
        plan_hash = df._jdf.semanticHash()
    except Exception:  # non-py4j backends: no safe key — just collect
        files = ()
        plan_hash = None
    if files:
        key = (
            _file_identities(files),
            plan_hash,
            id_col,
            vec_col,
            dim,
            str(centroid_pred),
        )
        hit = _CENTROID_MEMO.get(key)
        if hit is not None:
            return hit
    rows = sorted(
        df.filter(centroid_pred)
        .select(
            F.col(id_col).alias("cid"),
            vectors.to_double(F.col(vec_col)).alias("cv"),
            vectors.norm(F.col(vec_col), dim).alias("cn"),
        )
        .collect(),
        key=lambda r: r["cid"],
    )
    if not rows:
        raise ValueError("ivf: centroid_pred selected no rows")
    if key is not None:
        while len(_CENTROID_MEMO) >= _CENTROID_MEMO_MAX:
            _CENTROID_MEMO.pop(next(iter(_CENTROID_MEMO)))
        _CENTROID_MEMO[key] = rows
    return rows


def _cent_vec_lookup(cent_rows: list, id_type, cluster_col: str = "cluster_id"):
    """Literal-array centroid-vector lookup by cluster id — the
    map-only expression `element_at(filter(cents, c.cid == cluster), 1)
    .cv` used by the residual paths."""
    cents_lit = F.array(
        *[
            F.struct(
                F.lit(r["cid"]).cast(id_type).alias("cid"),
                F.lit(r["cv"]).cast("array<double>").alias("cv"),
            )
            for r in cent_rows
        ]
    )
    return F.element_at(
        F.filter(cents_lit, lambda c: c["cid"] == F.col(cluster_col)), 1
    )["cv"]


def _ivf_scored(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    centroid_pred,
    nprobe: int,
    vectorized: bool | None,
    cent_rows: list | None = None,
) -> DataFrame:
    """Shared IVF coarse-quantizer pass for `ivf_topk` and
    `ivfpq_topk`: pull the k-sized centroid model once at build time
    (the sanctioned model pull) and emit a tracked-persisted frame
    (id, _vd, _vn, cluster_id, _probes[nprobe]) — map-only, no
    Exchange between the scan and the cluster-id column. Assignment
    auto-switches (k ≥ 64, `vectorized=None`) to the Arrow/numpy
    kernel, which is bit-identical to the expression fold (pinned by
    test_ivf_vectorized_matches_expression)."""
    id_type = df.schema[id_col].dataType
    if cent_rows is None:
        cent_rows = _collect_centroids(
            df, id_col=id_col, vec_col=vec_col, dim=dim,
            centroid_pred=centroid_pred,
        )
    base = df.select(
        F.col(id_col),
        vectors.to_double(F.col(vec_col)).alias("_vd"),
        vectors.norm(F.col(vec_col), dim).alias("_vn"),
    )
    # auto-switch threshold lowered 64→16 in r10: a same-session A/B at
    # sf0.1 (k=40, 2000 vectors) measured the Arrow/numpy kernel at
    # 1.4-1.5s steady-state vs 4.3-4.4s for the expression fold — the
    # k-term dot-product expression's codegen cost dominates well below
    # the old threshold, and the kernel is pinned bit-identical to the
    # expression path (test_ivf_vectorized_matches_expression)
    use_np = vectorized if vectorized is not None else len(cent_rows) >= 16
    if use_np:
        return tracked_persist(
            _ivf_assign_vectorized(base, cent_rows, id_col, nprobe)
        )
    cents_lit = F.array(
        *[
            F.struct(
                F.lit(r["cid"]).cast(id_type).alias("cid"),
                F.lit(r["cv"]).cast("array<double>").alias("cv"),
                F.lit(r["cn"]).cast("double").alias("cn"),
            )
            for r in cent_rows
        ]
    )
    sc = F.transform(
        cents_lit,
        lambda c: F.struct(
            (
                -hround(
                    vectors.dot(F.col("_vd"), c["cv"], dim)
                    / (F.col("_vn") * c["cn"]),
                    6,
                )
            ).alias("negcos"),
            c["cid"].alias("cid"),
        ),
    )
    # cluster_id = argmin; probes = the nprobe best cids — computed
    # BEFORE the persist so the cache holds nprobe ids per row instead
    # of k scored structs (narrower for every k > nprobe; the
    # vectorized kernel emits exactly this schema)
    return tracked_persist(
        base.withColumn("_sc", sc).select(
            id_col,
            "_vd",
            "_vn",
            F.array_min("_sc")["cid"].alias("cluster_id"),
            F.transform(
                F.slice(F.array_sort("_sc"), 1, nprobe), lambda p: p["cid"]
            ).alias("_probes"),
        )
    )


def ivf_topk(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    centroid_pred,
    query_pred,
    k: int = 3,
    nprobe: int = 1,
    vectorized: bool | None = None,
) -> DataFrame:
    """IVF-flat ANN: vectors are assigned to their nearest seed
    centroid (cosine, deterministic tiebreak); each query probes its
    `nprobe` nearest clusters (recall/cost dial — candidates stay
    uniquely assigned, so no dedup is needed across probes).

    Seed centroids come from a deterministic predicate instead of
    k-means iterations so the operator is oracle-checkable; swap the
    centroid source for a trained set in production — the assignment
    and search plan shape (broadcast centroids → one pass to assign,
    equi-join on cluster id to search) is identical and is what makes
    this the 100 TB path vs the brute-force cross product.

    The candidate-side assignment is MAP-ONLY (r2 VERDICT #5): the
    centroid set is pulled ONCE at build time (a k-sized model pull,
    the sanctioned pattern) and rides the scan as a LITERAL array of
    (cent_id, vec, norm) structs — identical to ivf_topk_trained's
    shape; each row picks array_min(struct(-cos, cent_id)) with no
    Exchange and no join node between the scan and the cluster-id
    column (plan-guarded in test_plans.py). The former 1-row
    collect_list aggregate attached via join(broadcast(...)) was a
    BroadcastNestedLoopJoin whose build side replicated the centroid
    scan into both persisted-subtree consumers (2 BNLs per query in
    the r7 plan audit — r7 VERDICT #2). The former Window.partitionBy
    (id) shuffled the whole n×n_cent scored stream just to take rn=1.
    The nprobe>1 probe list (query side only, a bounded set) is an
    array_sort + slice over the same scored array — still no window.

    SCALE PATH (r8, r7 VERDICT #8): the expression-tree assignment
    evaluates the centroid transform through Catalyst's higher-order-
    function interpreter at ~10⁷ pair-ops/s — fine at fixture scale
    (k≈40), quadratic death at 100× where the %50 seed rule makes
    k ∝ n (measured 72s at 10×). With `vectorized=None` (auto), k ≥ 64
    switches assignment to an Arrow-batched numpy kernel that computes
    THE SAME sequential left-fold dot product (per-dimension
    accumulation in the identical IEEE order), the same
    floor(x·1e6+0.5) rounding, and the same (negcos, cid) tiebreak —
    bit-identical outputs, pinned by
    test_ivf_vectorized_matches_expression — at numpy matmul-class
    throughput. The driver-gate fixtures (k=40 at sf0.01/0.1) stay on
    the oracle-pinned expression path."""
    scored = _ivf_scored(
        df,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        centroid_pred=centroid_pred,
        nprobe=nprobe,
        vectorized=vectorized,
    )
    assigned = scored.select(id_col, "cluster_id", "_vd", "_vn")
    q = scored.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.explode("_probes").alias("cluster_id"),
        F.col("_vd").alias("_qv"),
        F.col("_vn").alias("_qn"),
    )
    pairs = assigned.join(q, on="cluster_id").filter(
        F.col("query_id") != F.col(id_col)
    )
    topk = pairs.withColumn(
        "cos_sim",
        hround(
            vectors.dot(F.col("_qv"), F.col("_vd"), dim)
            / (F.col("_qn") * F.col("_vn")),
            6,
        ),
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), id_col)
    return (
        topk.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("cand_id"), "cos_sim", "rank")
    )


def kmeans_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 8,
    iters: int = 5,
) -> list[list[float]]:
    """Distributed Lloyd's k-means over an embedding column — the
    trained-centroid source for `ivf_topk` (upgrading its documented
    seed-centroid stand-in; plan shape downstream is unchanged).

    Per iteration ONE job with map-side combine: each row computes its
    nearest centroid (squared-L2 over broadcast literal centroids,
    deterministic lowest-index tiebreak via struct array_min), then a
    k-row aggregate of per-dimension sums — the shuffle carries
    k×(dim+1) partial values PER PARTITION, independent of row count,
    which is the 100 TB shape (MLlib's treeAggregate equivalently).
    Init is deterministic: the k lowest-id vectors. Empty clusters keep
    their previous centroid. Iterative and float-summation-order
    dependent → verified by pytest against a numpy reference, not a SQL
    oracle (the one algorithm class the oracle gate exempts)."""
    base = df.select(
        F.col(id_col).alias("_id"),
        vectors.to_double(F.col(vec_col)).alias("_v"),
    )
    init_rows = base.orderBy("_id").limit(k).collect()
    if not init_rows:
        raise ValueError("kmeans_fit: input has no rows")
    # fewer rows than requested clusters: shrink k (the empty-cluster
    # fallback below indexes cents[i], which must exist for every i)
    k = min(k, len(init_rows))
    cents: list[list[float]] = [list(r._v) for r in init_rows]

    for _ in range(iters):
        cent_arrs = [
            F.array(*[F.lit(float(x)) for x in c]) for c in cents
        ]
        dists = [
            F.aggregate(
                F.zip_with(F.col("_v"), ca, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            )
            for ca in cent_arrs
        ]
        choice = F.array_min(
            F.array(
                *[
                    F.struct(d.alias("d"), F.lit(i).alias("i"))
                    for i, d in enumerate(dists)
                ]
            )
        )["i"]
        rows = (
            base.withColumn("_c", choice)
            .groupBy("_c")
            .agg(
                F.count("*").alias("_n"),
                *[
                    F.sum(F.element_at("_v", j + 1)).alias(f"_s{j}")
                    for j in range(dim)
                ],
            )
            .collect()
        )
        by_cluster = {r["_c"]: r for r in rows}
        cents = [
            [by_cluster[i][f"_s{j}"] / by_cluster[i]["_n"] for j in range(dim)]
            if i in by_cluster
            else cents[i]
            for i in range(k)
        ]
    return cents


def ivf_topk_trained(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    query_pred,
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-flat search against TRAINED centroids (from kmeans_fit):
    assign every vector to its nearest centroid (squared-L2, lowest-index
    tiebreak, map-only literal argmin), then each query searches its
    `nprobe` nearest clusters (array_sort + slice over the same scored
    structs — windowless, like `ivf_topk`) — identical equi-join plan
    shape as `ivf_topk`, so everything PLANS.md says about its scale
    behavior carries over."""
    base = df.select(
        F.col(id_col),
        vectors.to_double(F.col(vec_col)).alias("_vd"),
        vectors.norm(F.col(vec_col), dim).alias("_vn"),
    )
    cent_arrs = [F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    dists = [
        F.aggregate(
            F.zip_with(F.col("_vd"), ca, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
        for ca in cent_arrs
    ]
    scored = F.array(
        *[F.struct(d.alias("d"), F.lit(i).alias("i")) for i, d in enumerate(dists)]
    )
    assigned = tracked_persist(  # query side + candidate side
        base.withColumn("_sc", scored).withColumn(
            "cluster_id", F.array_min("_sc")["i"]
        )
    )
    q = (
        assigned.filter(query_pred)
        .select(
            F.col(id_col).alias("query_id"),
            F.explode(F.slice(F.array_sort("_sc"), 1, nprobe)).alias("_p"),
            F.col("_vd").alias("_qv"),
            F.col("_vn").alias("_qn"),
        )
        .select("query_id", F.col("_p")["i"].alias("cluster_id"), "_qv", "_qn")
    )
    pairs = assigned.drop("_sc").join(q, on="cluster_id").filter(
        F.col("query_id") != F.col(id_col)
    )  # _sc (k structs/row) must not ride the candidate-side shuffle
    topk = pairs.withColumn(
        "cos_sim",
        hround(
            vectors.dot(F.col("_qv"), F.col("_vd"), dim)
            / (F.col("_qn") * F.col("_vn")),
            6,
        ),
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), id_col)
    return (
        topk.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("cand_id"), "cos_sim", "rank")
    )


def pq_adc_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column,
    codebook_pred: Column,
    n_subspaces: int = 4,
    sub_dim: int = 16,
    k: int = 3,
) -> DataFrame:
    """Product-quantization asymmetric-distance top-k (the query-time
    half of PQ; the encode audit is plans/queries.py x_pq_encode):
    every vector is encoded as `n_subspaces` one-byte codes against a
    codebook (rows matching `codebook_pred`, one code per codebook
    row), each query (rows matching `query_pred`) precomputes a
    per-(subspace, code) distance LUT, and candidates are scored by
    code lookups — no raw floats touched at scan time.

    Determinism: per-cell distances are rounded to 6dp then snapped to
    integer micro-units; (distance, code) packs into one BIGINT so the
    assignment argmin is a plain hash-aggregable min(); candidate
    scores are exact integer sums ranked with an id tiebreak.

    Scale shape: codebook and LUT broadcast (both tiny); encode and
    scoring are broadcast joins + partial/final aggregates keyed by
    (id, subspace) and (query, id); the top-k cut is a
    WindowGroupLimit. Recall depends on codebook quality — train one
    with kmeans_fit per subspace for real data; planted-twin recall is
    measured in tests/test_ann_recall.py."""
    from pyspark.sql import Window

    from sparkga1_spark.functions.numeric import hround

    s_ids = F.explode(
        F.array(*[F.lit(s) for s in range(n_subspaces)])
    ).alias("subspace")
    sub = (
        emb.select(id_col, vec_col, s_ids)
        .withColumn(
            "xvec",
            F.slice(
                F.col(vec_col), F.col("subspace") * sub_dim + 1, sub_dim
            ).cast("array<double>"),
        )
        .drop(vec_col)
    )
    cb = (
        emb.filter(codebook_pred)
        .select(F.col(id_col).alias("_cbid"), vec_col, s_ids)
        .withColumn(
            "cvec",
            F.slice(
                F.col(vec_col), F.col("subspace") * sub_dim + 1, sub_dim
            ).cast("array<double>"),
        )
        .drop(vec_col)
    )
    # dense 0..n-1 codes from the codebook rows (stable by id order)
    w_cb = Window.partitionBy("subspace").orderBy("_cbid")
    cb = cb.withColumn("code", F.row_number().over(w_cb) - 1).drop("_cbid")
    diff = F.zip_with("xvec", "cvec", lambda p, q: p - q)
    dist = F.aggregate(
        F.zip_with(diff, diff, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dmicro = F.floor(hround(dist, 6) * 1_000_000 + 0.5).cast("long")
    n_codes = 1 << 20  # id-packing base; codes are << this
    packed = dmicro * n_codes + F.col("code")
    codes = (
        sub.join(F.broadcast(cb), "subspace")
        .select(id_col, "subspace", packed.alias("_k"))
        .groupBy(id_col, "subspace")
        .agg((F.min("_k") % n_codes).alias("code"))
    )
    lut = (
        sub.filter(query_pred)
        .withColumnRenamed(id_col, "_qid")
        .join(F.broadcast(cb), "subspace")
        .select("_qid", "subspace", "code", dmicro.alias("_dm"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col(id_col) != F.col("_qid"))
        .groupBy(F.col("_qid").alias("query_id"), F.col(id_col).alias("cand_id"))
        .agg(F.sum("_dm").alias("d_micro"))
    )
    w = Window.partitionBy("query_id").orderBy("d_micro", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("d_micro").cast("long").alias("d_micro"),
        )
    )


def train_pq_codebooks(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_codes: int = 4,
    iters: int = 3,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks for product quantization —
    `kmeans_fit` on each sub_dim slice of the embedding (the trained
    upgrade over `pq_adc_topk`'s seeded data-row codebook; same
    training shape as `ivf_topk_trained`). Returns
    codebooks[subspace][code] = centroid (len sub_dim). Cost:
    n_subspaces × kmeans_fit, each a per-iteration k×(dim+1) partial
    aggregate — independent of row count, the 100 TB shape. The
    double-cast projection is persisted ONCE up front: every subspace
    slice and every Lloyd iteration reads the cache instead of
    re-scanning the source (~n_subspaces·(iters+1) scans otherwise —
    the module's tracked_persist convention for multiply-consumed
    inputs). Like kmeans_fit, float-iterative → pytest-pinned recall
    (tests/test_ann_recall.py), not SQL-oracle-gated."""
    from sparkga1_spark.operators.cache import tracked_persist

    base = tracked_persist(
        df.select(F.col(id_col), vectors.to_double(F.col(vec_col)).alias("_v"))
    )
    books: list[list[list[float]]] = []
    for s in range(n_subspaces):
        sub = base.select(
            F.col(id_col),
            F.slice(F.col("_v"), s * sub_dim + 1, sub_dim).alias("_sub"),
        )
        books.append(
            kmeans_fit(
                sub,
                id_col=id_col,
                vec_col="_sub",
                dim=sub_dim,
                k=n_codes,
                iters=iters,
            )
        )
    return books


def _pq_encode_vectorized(
    frame: DataFrame,
    codebooks: list[list[list[float]]],
    sub_dim: int,
    id_col: str,
    carry_cols: tuple = (),
    residual_cents: dict | None = None,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Arrow-batched numpy PQ encode (r9) — the r8 IVF-assignment
    lesson applied to the other Catalyst-HOF wall: the literal-
    expression encode evaluates n_subspaces × n_codes × sub_dim
    interpreted ops per row (~1024 for 4×16×16), measured as the
    dominant cost of the trained ADC path at 100× (encode ≈ 70s of
    the flat scan's 122s). The kernel replicates the expression fold
    BIT-FOR-BIT: per-dimension sequential accumulation `acc += d_j²`
    in dim order (one multiply + one add per element, the exact
    zip_with/aggregate left fold), the same floor(x·1e6+0.5)/1e6
    hround then floor(h·1e6+0.5) micro-unit snap on doubles, and
    argmin taking the FIRST minimum (= lowest code, the array_min
    struct tiebreak). Pinned by
    test_pq_encode_vectorized_matches_expression. Emits one
    (id [, carry...], subspace, code) row per (row, subspace)."""
    import numpy as np

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    fields = {f.name: f.dataType.simpleString() for f in frame.schema.fields}
    cols = [id_col, *carry_cols]
    schema = ", ".join(f"{c} {fields[c]}" for c in cols)
    schema += ", subspace int, code int"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["_vd"].tolist(), dtype=np.float64)
            if residual_cents is not None:
                # residual coding (r9): one subtraction per element —
                # bit-identical to the zip_with(p - q) expression
                C = np.array(
                    [residual_cents[c] for c in pdf[cluster_col]],
                    dtype=np.float64,
                )
                V = V - C
            n = len(pdf)
            parts = []
            for s, B in enumerate(books):
                X = V[:, s * sub_dim : (s + 1) * sub_dim]
                dm = np.empty((n, len(B)), dtype=np.int64)
                for c in range(len(B)):
                    acc = np.zeros(n, dtype=np.float64)
                    for j in range(sub_dim):
                        dj = X[:, j] - B[c, j]
                        acc += dj * dj
                    h = np.floor(acc * 1e6 + 0.5) / 1e6
                    dm[:, c] = np.floor(h * 1e6 + 0.5).astype(np.int64)
                out = {c_: pdf[c_] for c_ in cols}
                out["subspace"] = np.full(n, s, dtype=np.int32)
                out["code"] = np.argmin(dm, axis=1).astype(np.int32)
                parts.append(pd.DataFrame(out))
            yield pd.concat(parts, ignore_index=True)

    return frame.mapInPandas(run, schema=schema)


def pq_adc_topk_trained(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column,
    sub_dim: int = 16,
    k: int = 3,
    vectorized: bool | None = None,
) -> DataFrame:
    """PQ-ADC top-k against TRAINED literal codebooks (from
    `train_pq_codebooks`). Differences from `pq_adc_topk`'s seeded
    variant: encode is MAP-ONLY — each row computes its per-subspace
    argmin over broadcast literal centroids (array_min over (distance,
    code) structs, the `ivf_topk_trained` assignment shape) with no
    codebook join at all — and the per-query LUT is likewise built
    from literals. Scoring is the same (subspace, code) broadcast
    equi-join + exact integer micro-unit sums with an id tiebreak, so
    everything PLANS.md says about the ADC scan's scale behavior
    carries over; the only new cost is n_subspaces × n_codes literal
    arrays in the plan (tiny)."""

    def _dmicro(xvec: Column, cent: list[float]) -> Column:
        ca = F.array(*[F.lit(float(x)) for x in cent])
        diff = F.zip_with(xvec, ca, lambda p, q: p - q)
        dist = F.aggregate(
            F.zip_with(diff, diff, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.floor(hround(dist, 6) * 1_000_000 + 0.5).cast("long")

    base = emb.select(
        F.col(id_col), vectors.to_double(F.col(vec_col)).alias("_vd")
    )
    # corpus ENCODE: auto-switch to the Arrow/numpy kernel past the
    # HOF-interpreter wall (r9 — 4x16x16 literal expressions per row
    # dominated the 100x trained-ADC cost; bit-identity pinned by
    # test_pq_encode_vectorized_matches_expression)
    use_np = vectorized if vectorized is not None else (
        sum(len(b) for b in codebooks) * sub_dim >= 512
    )
    if use_np:
        codes = _pq_encode_vectorized(base, codebooks, sub_dim, id_col)
    else:
        code_structs = []
        for s, book in enumerate(codebooks):
            xvec = F.slice(F.col("_vd"), s * sub_dim + 1, sub_dim)
            best = F.array_min(
                F.array(
                    *[
                        F.struct(
                            _dmicro(xvec, cent).alias("d"),
                            F.lit(c).alias("c"),
                        )
                        for c, cent in enumerate(book)
                    ]
                )
            )
            code_structs.append(
                F.struct(F.lit(s).alias("subspace"), best["c"].alias("code"))
            )
        codes = base.select(
            id_col, F.explode(F.array(*code_structs)).alias("_sc")
        ).select(id_col, F.col("_sc.subspace"), F.col("_sc.code"))

    lut_structs = [
        F.struct(
            F.lit(s).alias("subspace"),
            F.lit(c).alias("code"),
            _dmicro(F.slice(F.col("_vd"), s * sub_dim + 1, sub_dim), cent).alias(
                "_dm"
            ),
        )
        for s, book in enumerate(codebooks)
        for c, cent in enumerate(book)
    ]
    lut = (
        base.filter(query_pred)
        .select(
            F.col(id_col).alias("_qid"),
            F.explode(F.array(*lut_structs)).alias("_l"),
        )
        .select("_qid", "_l.subspace", "_l.code", "_l._dm")
    )
    adc = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col(id_col) != F.col("_qid"))
        .groupBy(
            F.col("_qid").alias("query_id"), F.col(id_col).alias("cand_id")
        )
        .agg(F.sum("_dm").alias("d_micro"))
    )
    w = Window.partitionBy("query_id").orderBy("d_micro", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("d_micro").cast("long").alias("d_micro"),
        )
    )


def ivfpq_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    centroid_pred,
    codebook_pred,
    query_pred,
    n_subspaces: int = 4,
    sub_dim: int = 16,
    k: int = 3,
    nprobe: int = 1,
    vectorized: bool | None = None,
) -> DataFrame:
    """IVF+PQ composed — the production ANN shape (r8 VERDICT #6): the
    IVF coarse quantizer routes the PQ asymmetric-distance scan through
    the query's `nprobe` probed clusters, so ADC cost is
    Σ probed-cluster sizes × n_subspaces instead of corpus-wide (flat
    PQ's candidate-linear scan measured 98s at 100× in SCALE_SMOKE_r8;
    the composition is the textbook IVFADC layout of Jégou et al.'s
    public PQ paper).

    Mechanics: `_ivf_scored` assigns every vector to its nearest seed
    centroid map-only (shared with `ivf_topk`, bit-identical kernel
    auto-switch at k ≥ 64); vectors PQ-encode against the seeded
    codebook exactly as `pq_adc_topk` (packed-BIGINT argmin — dense
    codes, hash-aggregable); each query precomputes its LUT and probes
    its `nprobe` best clusters; scoring joins candidate codes to the
    broadcast probe list on cluster_id, then to the broadcast LUT on
    (query, subspace, code), and sums exact integer micro-units. This
    seeded variant (data-row centroids + data-row codebook) is fully
    SQL-expressible, so the driver oracle checks the whole composition
    value-for-value; swap `centroid_pred` rows for kmeans_fit output
    and the codebook for train_pq_codebooks in production — plan shape
    unchanged. NOTE the honest simplification vs. the paper: codes
    quantize the RAW vector, not the residual (v − centroid); residual
    encoding is a map-only subtraction away but would put float
    subtraction ahead of the oracle's integer pipeline — recall floors
    for this variant are pinned in tests/test_ann_recall.py alongside
    the flat-PQ rows."""
    from pyspark.sql import Window

    scored = _ivf_scored(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        centroid_pred=centroid_pred,
        nprobe=nprobe,
        vectorized=vectorized,
    )
    s_ids = F.explode(
        F.array(*[F.lit(s) for s in range(n_subspaces)])
    ).alias("subspace")
    sub = scored.select(
        id_col,
        "cluster_id",
        s_ids,
        F.col("_vd").alias("_v"),
    ).withColumn(
        "xvec", F.slice(F.col("_v"), F.col("subspace") * sub_dim + 1, sub_dim)
    ).drop("_v")
    cb = (
        emb.filter(codebook_pred)
        .select(F.col(id_col).alias("_cbid"), vec_col, s_ids)
        .withColumn(
            "cvec",
            F.slice(
                F.col(vec_col), F.col("subspace") * sub_dim + 1, sub_dim
            ).cast("array<double>"),
        )
        .drop(vec_col)
    )
    w_cb = Window.partitionBy("subspace").orderBy("_cbid")
    cb = cb.withColumn("code", F.row_number().over(w_cb) - 1).drop("_cbid")
    diff = F.zip_with("xvec", "cvec", lambda p, q: p - q)
    dist = F.aggregate(
        F.zip_with(diff, diff, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dmicro = F.floor(hround(dist, 6) * 1_000_000 + 0.5).cast("long")
    pack_base = 1 << 20
    codes = (
        sub.join(F.broadcast(cb), "subspace")
        .select(
            id_col,
            "cluster_id",
            "subspace",
            (dmicro * pack_base + F.col("code")).alias("_k"),
        )
        .groupBy(id_col, "cluster_id", "subspace")
        .agg((F.min("_k") % pack_base).alias("code"))
    )
    lut = (
        sub.join(
            F.broadcast(
                scored.filter(query_pred).select(F.col(id_col).alias("_qid"))
            ),
            F.col(id_col) == F.col("_qid"),
        )
        .join(F.broadcast(cb), "subspace")
        .select("_qid", "subspace", "code", dmicro.alias("_dm"))
    )
    probes = scored.filter(query_pred).select(
        F.col(id_col).alias("_qid"), F.explode("_probes").alias("cluster_id")
    )
    adc = (
        codes.join(F.broadcast(probes), "cluster_id")
        .filter(F.col(id_col) != F.col("_qid"))
        .join(F.broadcast(lut), ["_qid", "subspace", "code"])
        .groupBy(
            F.col("_qid").alias("query_id"), F.col(id_col).alias("cand_id")
        )
        .agg(F.sum("_dm").alias("d_micro"))
    )
    w = Window.partitionBy("query_id").orderBy("d_micro", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("d_micro").cast("long").alias("d_micro"),
        )
    )


def ivfpq_topk_trained(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    centroid_pred,
    query_pred,
    sub_dim: int = 16,
    k: int = 3,
    nprobe: int = 1,
    vectorized: bool | None = None,
    residual: bool = False,
) -> DataFrame:
    """`ivfpq_topk` with TRAINED literal codebooks (from
    `train_pq_codebooks`) — the full production IVFADC shape: IVF
    routing bounds the candidate pool at Σ probed-cluster sizes, the
    trained quantizer keeps ranking quality (flat trained-PQ recall
    0.975 on the planted fixture), and encode/LUT are MAP-ONLY literal
    argmins exactly as `pq_adc_topk_trained` (no codebook join).

    `residual=True` is the paper's actual IVFADC: codes quantize
    v − centroid(v) instead of v (train the books on `ivf_residuals`
    output), and each query builds one LUT PER PROBED CLUSTER from
    q − centroid_c — keyed (query, cluster, subspace, code), so the
    ADC join routes on cluster implicitly. Residual coding resolves
    WITHIN-cluster structure the raw quantizer wastes its budget on
    (measured on the clustered pytest fixture:
    test_ivfpq_residual_beats_raw_on_clustered_data); on
    structureless uniform data the two are comparable. Plan shape is
    unchanged — the residual is one extra map-only zip_with (or a
    vectorized subtraction inside the encode kernel, bit-identical).

    Float-iterative k-means upstream → pytest-pinned recall floors
    (tests/test_ann_recall.py), not SQL-oracle-gated; the seeded
    `ivfpq_topk` gate row certifies the routing/ADC arithmetic
    value-for-value."""

    def _dmicro(xvec: Column, cent: list[float]) -> Column:
        ca = F.array(*[F.lit(float(x)) for x in cent])
        diff = F.zip_with(xvec, ca, lambda p, q: p - q)
        dist = F.aggregate(
            F.zip_with(diff, diff, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.floor(hround(dist, 6) * 1_000_000 + 0.5).cast("long")

    id_type = emb.schema[id_col].dataType
    cent_rows = _collect_centroids(
        emb, id_col=id_col, vec_col=vec_col, dim=dim,
        centroid_pred=centroid_pred,
    )
    scored = _ivf_scored(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        centroid_pred=centroid_pred,
        nprobe=nprobe,
        vectorized=vectorized,
        cent_rows=cent_rows,
    )
    # the vector the codes quantize: raw, or the residual against the
    # row's ASSIGNED centroid (map-only literal lookup)
    enc_vec = (
        F.zip_with(
            F.col("_vd"),
            _cent_vec_lookup(cent_rows, id_type),
            lambda p, q: p - q,
        )
        if residual
        else F.col("_vd")
    )
    # corpus ENCODE: same kernel auto-switch as pq_adc_topk_trained
    # (the assignment already switched inside _ivf_scored)
    use_np = vectorized if vectorized is not None else (
        sum(len(b) for b in codebooks) * sub_dim >= 512
    )
    if use_np:
        codes = _pq_encode_vectorized(
            scored.select(id_col, "cluster_id", "_vd"),
            codebooks, sub_dim, id_col, carry_cols=("cluster_id",),
            residual_cents=(
                {r["cid"]: list(r["cv"]) for r in cent_rows}
                if residual else None
            ),
        )
    else:
        enc = scored.select(id_col, "cluster_id", enc_vec.alias("_ev"))
        code_structs = []
        for s, book in enumerate(codebooks):
            xvec = F.slice(F.col("_ev"), s * sub_dim + 1, sub_dim)
            best = F.array_min(
                F.array(
                    *[
                        F.struct(
                            _dmicro(xvec, cent).alias("d"), F.lit(c).alias("c")
                        )
                        for c, cent in enumerate(book)
                    ]
                )
            )
            code_structs.append(
                F.struct(F.lit(s).alias("subspace"), best["c"].alias("code"))
            )
        codes = enc.select(
            id_col, "cluster_id", F.explode(F.array(*code_structs)).alias("_sc")
        ).select(id_col, "cluster_id", F.col("_sc.subspace"), F.col("_sc.code"))

    q_rows = scored.filter(query_pred)
    if residual:
        # one LUT per (query, PROBED cluster): q − centroid_c, keyed so
        # the ADC join routes on cluster implicitly
        qp = q_rows.select(
            F.col(id_col).alias("_qid"),
            F.col("_vd"),
            F.explode("_probes").alias("cluster_id"),
        ).withColumn(
            "_ev",
            F.zip_with(
                F.col("_vd"),
                _cent_vec_lookup(cent_rows, id_type),
                lambda p, q: p - q,
            ),
        )
        lut_structs = [
            F.struct(
                F.lit(s).alias("subspace"),
                F.lit(c).alias("code"),
                _dmicro(
                    F.slice(F.col("_ev"), s * sub_dim + 1, sub_dim), cent
                ).alias("_dm"),
            )
            for s, book in enumerate(codebooks)
            for c, cent in enumerate(book)
        ]
        lut = qp.select(
            "_qid", "cluster_id", F.explode(F.array(*lut_structs)).alias("_l")
        ).select("_qid", "cluster_id", "_l.subspace", "_l.code", "_l._dm")
        adc = (
            codes.join(F.broadcast(lut), ["cluster_id", "subspace", "code"])
            .filter(F.col(id_col) != F.col("_qid"))
            .groupBy(
                F.col("_qid").alias("query_id"), F.col(id_col).alias("cand_id")
            )
            .agg(F.sum("_dm").alias("d_micro"))
        )
    else:
        lut_structs = [
            F.struct(
                F.lit(s).alias("subspace"),
                F.lit(c).alias("code"),
                _dmicro(
                    F.slice(F.col("_vd"), s * sub_dim + 1, sub_dim), cent
                ).alias("_dm"),
            )
            for s, book in enumerate(codebooks)
            for c, cent in enumerate(book)
        ]
        lut = q_rows.select(
            F.col(id_col).alias("_qid"),
            F.explode(F.array(*lut_structs)).alias("_l"),
        ).select("_qid", "_l.subspace", "_l.code", "_l._dm")
        probes = q_rows.select(
            F.col(id_col).alias("_qid"), F.explode("_probes").alias("cluster_id")
        )
        adc = (
            codes.join(F.broadcast(probes), "cluster_id")
            .filter(F.col(id_col) != F.col("_qid"))
            .join(F.broadcast(lut), ["_qid", "subspace", "code"])
            .groupBy(
                F.col("_qid").alias("query_id"), F.col(id_col).alias("cand_id")
            )
            .agg(F.sum("_dm").alias("d_micro"))
        )
    w = Window.partitionBy("query_id").orderBy("d_micro", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("d_micro").cast("long").alias("d_micro"),
        )
    )


def ivf_residuals(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    centroid_pred,
    vectorized: bool | None = None,
) -> DataFrame:
    """(id, cluster_id, _res) — each vector minus its ASSIGNED IVF
    centroid, map-only (the literal-array lookup over the k-sized
    model). Feed this to `train_pq_codebooks(..., vec_col="_res")` to
    train residual codebooks for `ivfpq_topk_trained(residual=True)`
    — the paper's IVFADC training shape: the quantizer spends its
    budget on within-cluster structure instead of re-describing the
    coarse geometry the centroids already capture."""
    id_type = df.schema[id_col].dataType
    cent_rows = _collect_centroids(
        df, id_col=id_col, vec_col=vec_col, dim=dim,
        centroid_pred=centroid_pred,
    )
    scored = _ivf_scored(
        df, id_col=id_col, vec_col=vec_col, dim=dim,
        centroid_pred=centroid_pred, nprobe=1, vectorized=vectorized,
        cent_rows=cent_rows,
    )
    return scored.select(
        id_col,
        "cluster_id",
        F.zip_with(
            F.col("_vd"),
            _cent_vec_lookup(cent_rows, id_type),
            lambda p, q: p - q,
        ).alias("_res"),
    )


def pca_components(
    df: DataFrame, *, vec_col: str = "embedding", k: int = 8
):
    """Distributed PCA over an embedding column in ONE scan: each
    Arrow batch emits a (count, mean, centered second-moment) partial
    (vectorized numpy — a few thousand FLOPs per row instead of a d²
    exploded-row aggregate; measured 4-5× cheaper end-to-end at d=64),
    the partials — one model-sized row per batch — merge on the driver
    with Chan's parallel covariance update (numerically stable where
    the naive single-scan E[xxᵀ]−μμᵀ form cancels catastrophically on
    near-constant dimensions), and the d×d matrix is eigendecomposed
    there (the documented kmeans_fit model-pull pattern). Returns
    (mean: list[d], eigenvalues desc: list[d], components: list[k] of
    list[d]).

    Scale: the driver receives one (d + d²)-double row per Arrow
    batch — ~33 KB at d=64, independent of row count; at 1000
    executors that is still only megabytes. On a cluster the merge
    could tree-reduce, but the partial count is batch-count-bounded,
    so a flat fold is fine far past 100 TB."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            vals = [v for v in pdf[vec_col] if v is not None]
            if not vals:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in vals])
            mean = x.mean(0)
            d = x - mean
            yield pd.DataFrame(
                [(len(x), mean.tolist(), (d.T @ d).reshape(-1).tolist())],
                columns=["n", "mean", "m2"],
            )

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(partials, schema="n long, mean array<double>, m2 array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_components needs a non-empty vector column")
    dim = len(rows[0]["mean"])
    n_tot, mu_acc = 0, np.zeros(dim)
    m2_acc = np.zeros((dim, dim))
    for r in rows:  # Chan's parallel covariance merge — stable, one scan
        nb = int(r["n"])
        mb = np.array(r["mean"])
        m2b = np.array(r["m2"]).reshape(dim, dim)
        if n_tot == 0:
            n_tot, mu_acc, m2_acc = nb, mb, m2b
            continue
        delta = mb - mu_acc
        tot = n_tot + nb
        m2_acc = m2_acc + m2b + np.outer(delta, delta) * (n_tot * nb / tot)
        mu_acc = mu_acc + delta * (nb / tot)
        n_tot = tot
    mu = [float(v) for v in mu_acc]
    cov = m2_acc / n_tot
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = evals[order]
    evecs = evecs[:, order]
    comps = [[float(v) for v in evecs[:, j]] for j in range(min(k, dim))]
    return mu, [float(v) for v in evals], comps


def pca_project(
    df: DataFrame, mean: list[float], components: list[list[float]],
    *, vec_col: str = "embedding", out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto the given components (JVM-side
    zip_with/aggregate dot products — no Python in the row path):
    out[j] = (x − μ) · c_j."""
    mu_lit = F.array(*[F.lit(v) for v in mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mu_lit, lambda x, m: x - m
    )
    projs = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(v) for v in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for comp in components
    ]
    return df.withColumn(out_col, F.array(*projs))


def mahalanobis_scores(
    df: DataFrame, *, vec_col: str = "embedding", out_col: str = "m2",
    rel_eps: float = 1e-9,
):
    """Mahalanobis distance² per vector under the data's own covariance
    — the whitened outlier score an embedding-curation pipeline prunes
    on (isotropic-safe, unlike raw L2): m² = Σ_j ((x−μ)·v_j)² / λ_j
    over the eigenbasis from pca_components. Components with
    λ ≤ rel_eps·λ_max are dropped (pseudo-inverse convention) so a
    rank-deficient batch cannot divide by ~0. Returns (scored_df,
    n_retained): scoring is one whitened-matrix multiply per Arrow
    batch; the only driver state is the d×d model. The audit identity: the MEAN of m² over
    the fitted data equals the number of retained components exactly
    (E[proj_j²] = λ_j), so a wrong eigenvalue, transposed basis, or
    broken centering shifts the mean off its closed-form target."""
    import numpy as np
    import pandas as pd

    mu, evals, comps = pca_components(df, vec_col=vec_col, k=10**9)
    lmax = max(evals) if evals else 0.0
    keep = [(v, c) for v, c in zip(evals, comps) if v > rel_eps * max(lmax, 1e-300)]
    if not keep:
        # a constant/rank-0 embedding column retains no components;
        # np.array([]).T would otherwise yield shape-(0,) and the
        # matmul dies with a raw numpy shape error instead of a refusal
        raise ValueError("mahalanobis: covariance has no retained components")
    # whitening matrix W[:, j] = v_j / sqrt(lambda_j): m2 = ||(x-mu)W||².
    # One Arrow-batch matmul per partition beats r nested JVM HOF dot
    # products (r=64 inflates the codegen'd expression tree ~r·d wide;
    # measured 6.8s -> scan-bound after this rewrite at sf0.1) — the
    # sanctioned vectorized surface, like the codec chains.
    from pyspark.sql.types import DoubleType, StructField, StructType

    w = np.array([c for _, c in keep]).T / np.sqrt([v for v, _ in keep])
    mu_arr = np.array(mu)
    # fresh StructType — df.schema is a CACHED object and .add() would
    # mutate it in place, corrupting df.columns for later operations
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def score(batches):
        for pdf in batches:
            if any(v is None for v in pdf[vec_col]):
                # pca_components' partials filter None when fitting;
                # scoring has no row to skip to — refuse cleanly
                raise ValueError("mahalanobis: null embedding in score input")
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            m2 = (((x - mu_arr) @ w) ** 2).sum(axis=1) if len(x) else []
            yield pdf.assign(**{out_col: m2})

    return df.mapInPandas(score, schema=out_schema), len(keep)
