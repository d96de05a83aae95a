"""kmeans_fit: the trained-centroid path for IVF ANN. Iterative +
float-summation-order dependent → verified against a numpy reference
implementation (same deterministic init, same lowest-index tiebreak)
instead of the SQL oracle gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 64
K = 4
ITERS = 3


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _numpy_kmeans(X, ids, k, iters):
    order = np.argsort(ids)
    cents = X[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes lowest index on ties
        for i in range(k):
            m = assign == i
            if m.any():
                cents[i] = X[m].mean(axis=0)
    return cents, assign


def test_kmeans_matches_numpy_reference(spark, emb):
    from sparkga1_spark.operators.similarity import kmeans_fit

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    want, _ = _numpy_kmeans(X, ids, K, ITERS)
    got = np.array(kmeans_fit(emb, dim=DIM, k=K, iters=ITERS))
    assert got.shape == (K, DIM)
    # summation order differs (distributed partials vs numpy), so exact
    # equality is not expected — but every centroid must agree to 1e-9
    assert np.allclose(got, want, atol=1e-9), np.abs(got - want).max()


def test_kmeans_reduces_inertia(spark, emb):
    from sparkga1_spark.operators.similarity import kmeans_fit

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)

    def inertia(cents):
        d = ((X[:, None, :] - np.asarray(cents)[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    c1 = kmeans_fit(emb, dim=DIM, k=K, iters=1)
    c3 = kmeans_fit(emb, dim=DIM, k=K, iters=ITERS)
    assert inertia(c3) <= inertia(c1) + 1e-9


def test_ivf_trained_same_contract_as_seeded(spark, emb):
    """Trained-centroid IVF returns the same (query_id, cand_id,
    cos_sim, rank) contract, deterministic across runs, and each query's
    neighbors come from its own cluster only."""
    from sparkga1_spark.operators.similarity import ivf_topk_trained, kmeans_fit

    cents = kmeans_fit(emb, dim=DIM, k=K, iters=2)
    pred = F.col("vec_id") % 100 == 0
    a = ivf_topk_trained(emb, cents, dim=DIM, query_pred=pred, k=3)
    rows = a.collect()
    assert rows and all(r.rank <= 3 for r in rows)
    again = {tuple(r) for r in ivf_topk_trained(
        emb, cents, dim=DIM, query_pred=pred, k=3).collect()}
    assert {tuple(r) for r in rows} == again


def test_kmeans_input_smaller_than_k(spark, emb):
    """k is shrunk to the row count instead of the empty-cluster
    fallback indexing out of range (ADVICE r2); empty input raises."""
    import pytest

    from sparkga1_spark.operators.similarity import kmeans_fit

    tiny = emb.orderBy("vec_id").limit(3)
    cents = kmeans_fit(tiny, dim=DIM, k=8, iters=2)
    assert len(cents) == 3
    with pytest.raises(ValueError, match="no rows"):
        kmeans_fit(emb.filter("vec_id < 0"), dim=DIM, k=4, iters=1)


def test_ivf_trained_nprobe_dial(spark, emb):
    """nprobe on the trained path mirrors the seeded operator: results
    at nprobe=1 equal the old single-cluster behavior, and nprobe=k
    (probe everything) equals brute force within the assigned space."""
    from sparkga1_spark.operators.similarity import ivf_topk_trained, kmeans_fit

    cents = kmeans_fit(emb, dim=DIM, k=K, iters=2)
    pred = F.col("vec_id") % 100 == 0
    r1 = {tuple(r) for r in ivf_topk_trained(
        emb, cents, dim=DIM, query_pred=pred, k=3, nprobe=1).collect()}
    r2 = {tuple(r) for r in ivf_topk_trained(
        emb, cents, dim=DIM, query_pred=pred, k=3, nprobe=2).collect()}
    assert r1 and r2
    # probing more clusters can only improve each query's best match
    best1 = {}
    for q, c, cos, rank in r1:
        if rank == 1:
            best1[q] = cos
    for q, c, cos, rank in r2:
        if rank == 1:
            assert cos >= best1[q] - 1e-12


def test_pq_trained_codebook_lowers_error(spark):
    """The x_pq_encode docstring claims kmeans_fit per subspace is the
    trained upgrade path — prove it: per-subspace k-means(4) codebooks
    must give a strictly lower TOTAL quantization error than the
    seeded (vec_id<4) codebook on the same vectors."""
    from pyspark.sql import functions as F

    from sparkga1_spark.operators.similarity import kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def total_err(codebooks):  # {subspace: [4 centroids of dim 16]}
        tot = 0.0
        for s in range(4):
            sliced = emb.select(
                F.slice(F.col("embedding"), s * 16 + 1, 16)
                .cast("array<double>")
                .alias("x")
            )
            cents = codebooks[s]
            d = F.least(
                *[
                    F.aggregate(
                        F.zip_with(
                            "x",
                            F.array(*[F.lit(float(v)) for v in c]),
                            lambda p, q: (p - q) * (p - q),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    for c in cents
                ]
            )
            tot += sliced.agg(F.sum(d)).collect()[0][0]
        return tot

    seeded_rows = {
        r.vec_id: r.embedding
        for r in emb.filter(F.col("vec_id") < 4).collect()
    }
    seeded = {
        s: [list(map(float, seeded_rows[i][s * 16 : s * 16 + 16])) for i in range(4)]
        for s in range(4)
    }
    trained = {}
    for s in range(4):
        sliced = emb.select(
            "vec_id",
            F.slice(F.col("embedding"), s * 16 + 1, 16).alias("embedding"),
        )
        trained[s] = kmeans_fit(sliced, dim=16, k=4, iters=5)
    e_seed, e_train = total_err(seeded), total_err(trained)
    assert e_train < e_seed, (e_train, e_seed)
