"""Measured ANN recall vs the exact brute-force baseline (r2 VERDICT #3).

Two metrics, because the synthetic embeddings are uniform random:

- PLANTED recall@1 — the fixture plants one near-duplicate twin per
  25th vector (cos ≈ 0.9937, the only real neighbor structure in the
  data). An ANN index that loses these is broken; this is the metric
  with a hard floor.
- RAW recall@3 vs brute force on the unplanted table — uniform random
  vectors have near-uniform pairwise cosines, so absolute raw recall
  is intrinsically low for ANY partitioned index at this k/n; what
  must hold is the dial: more probes → monotonically more recall.

The measured table lives in PLANS.md (§ANN recall/cost).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkga1_spark.operators import similarity as S

DIM = 64


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    from sparkga1_spark.operators.cache import tracked_persist
    from sparkga1_spark.sources import fixtures

    emb = fixtures.embeddings_with_neardups(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )
    return tracked_persist(emb)


# twin of original k·25 is planted at vec_id 1000000 + k·25
PAIRS = {1000000 + k: k for k in range(0, 500, 25)}


def _qpred():
    return F.col("vec_id") >= 1000000


def _top1(df) -> float:
    got = {r.query_id: r.cand_id for r in df.collect() if r.rank == 1}
    return sum(1 for q, want in PAIRS.items() if got.get(q) == want) / len(PAIRS)


def test_brute_force_finds_every_planted_twin(planted):
    assert _top1(S.brute_force_topk(planted.filter(_qpred()), planted, k=3, dim=DIM)) == 1.0


def test_ivf_planted_recall_floor_and_nprobe_dial(planted):
    """Floors from the measured table (PLANS.md): seed-centroid IVF
    recovers ≥90% of real near-duplicates at nprobe=1 and all of them
    at nprobe=2 — the recall/cost dial has numbers now."""
    cent = (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 1000000)
    r1 = _top1(S.ivf_topk(planted, dim=DIM, centroid_pred=cent, query_pred=_qpred(), k=3, nprobe=1))
    r2 = _top1(S.ivf_topk(planted, dim=DIM, centroid_pred=cent, query_pred=_qpred(), k=3, nprobe=2))
    assert r1 >= 0.9
    assert r2 >= 0.95
    assert r2 >= r1


def test_ivf_trained_planted_recall(planted):
    cents = S.kmeans_fit(
        planted.filter(F.col("vec_id") < 1000000), dim=DIM, k=10, iters=3
    )
    r = _top1(S.ivf_topk_trained(planted, cents, dim=DIM, query_pred=_qpred(), k=3))
    assert r >= 0.95


def test_lsh_planted_bucket_recall(planted):
    """Sign-LSH: a planted twin must land in its original's bucket for
    ≥80% of pairs at the default 4 planes (measured 0.85; fewer planes
    trade recall up / cost up per PLANS.md)."""
    from sparkga1_spark.operators.similarity import sign_lsh_bucket

    b = {
        r.vec_id: r.b
        for r in planted.select(
            "vec_id", sign_lsh_bucket(F.col("embedding"), DIM, 4).alias("b")
        ).collect()
    }
    recall = sum(1 for q, w in PAIRS.items() if b[q] == b[w]) / len(PAIRS)
    assert recall >= 0.8


def test_raw_recall_dial_is_monotone(spark, sf_dir):
    """On the structureless uniform table, absolute recall is low by
    nature — but nprobe=2 must dominate nprobe=1 against the exact
    baseline (the dial works in the regime users actually tune)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.col("vec_id") % 20 == 0
    truth: dict[int, set] = {}
    for r in S.brute_force_topk(emb.filter(q), emb, k=3, dim=DIM).collect():
        truth.setdefault(r.query_id, set()).add(r.cand_id)
    total = sum(len(v) for v in truth.values())

    def recall(nprobe: int) -> float:
        got: dict[int, set] = {}
        ivf = S.ivf_topk(
            emb, dim=DIM, centroid_pred=F.col("vec_id") % 50 == 0,
            query_pred=q, k=3, nprobe=nprobe,
        )
        for r in ivf.collect():
            got.setdefault(r.query_id, set()).add(r.cand_id)
        return sum(len(truth[k] & got.get(k, set())) for k in truth) / total

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1 > 0


def test_pq_adc_planted_twin_near_min_distance(spark):
    """PQ-ADC planted-twin bounds: a near-twin usually lands in the
    query's code cell, but a slice sitting near a code boundary can
    flip one argmin under the perturbation — so the honest invariant
    is PROXIMITY, not equality: every twin's ADC distance is within 5%
    of the per-query minimum (measured max gap 1.1% at sf0.01 / 2.6%
    at sf0.001), every twin ranks in the top 15, and recall@3 ≥ 0.6
    (0.75 observed; untrained seeded codebook —
    kmeans_fit-per-subspace is the trained upgrade path). A wrong
    encode argmin, LUT cell, or candidate sum blows these bounds."""
    from pyspark.sql import functions as F

    from sparkga1_spark.operators.similarity import pq_adc_topk
    from sparkga1_spark.sources import fixtures

    emb = fixtures.embeddings_with_neardups(
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    )
    top = pq_adc_topk(
        emb,
        query_pred=F.col("vec_id") >= 1_000_000,
        codebook_pred=F.col("vec_id") < 4,
        k=1000,  # full ranking so the twin's distance is always present
    ).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 20
    hits3 = 0
    for qid, rows in by_q.items():
        twin = qid - 1_000_000
        dmin = min(r.d_micro for r in rows)
        twin_rows = [r for r in rows if r.cand_id == twin]
        assert twin_rows, f"twin {twin} missing from ranking of {qid}"
        assert twin_rows[0].d_micro <= 1.05 * dmin, (
            f"twin {twin} ADC distance {twin_rows[0].d_micro} vs min {dmin}"
        )
        assert twin_rows[0].rank <= 15, (qid, twin_rows[0].rank)
        if twin_rows[0].rank <= 3:
            hits3 += 1
    assert hits3 / len(by_q) >= 0.6, f"recall@3 regressed: {hits3}/20"


def test_pq_trained_codebook_recall_floors(planted):
    """Trained-codebook PQ (train_pq_codebooks → pq_adc_topk_trained):
    with 16 codes/subspace the quantizer recovers EVERY planted twin
    at rank 1 (measured 1.0 at sf0.01; floor 0.95), and at the seeded
    variant's own 4-code budget the trained codebook DOMINATES the
    seeded one on planted top-1 (0.45 vs 0.35 measured) — training
    pays for itself at equal cost. Raw recall@3 on the structureless
    uniform table: 0.383 measured with 16 codes (floor 0.30; low by
    nature, see module docstring)."""
    base = planted.filter(F.col("vec_id") < 1000000)
    b16 = S.train_pq_codebooks(base, n_codes=16, iters=3)
    t16 = S.pq_adc_topk_trained(planted, b16, query_pred=_qpred(), k=3)
    rows16 = t16.collect()
    got = {r.query_id: r.cand_id for r in rows16 if r.rank == 1}
    top1_16 = sum(1 for q, w in PAIRS.items() if got.get(q) == w) / len(PAIRS)
    assert top1_16 >= 0.95, top1_16

    b4 = S.train_pq_codebooks(base, n_codes=4, iters=3)
    t4 = S.pq_adc_topk_trained(planted, b4, query_pred=_qpred(), k=3)
    seeded = S.pq_adc_topk(
        planted, query_pred=_qpred(), codebook_pred=F.col("vec_id") < 4, k=3
    )
    assert _top1(t4) >= _top1(seeded), (_top1(t4), _top1(seeded))

    truth: dict[int, set] = {}
    for r in S.brute_force_topk(
        planted.filter(_qpred()), planted, k=3, dim=DIM
    ).collect():
        truth.setdefault(r.query_id, set()).add(r.cand_id)
    total = sum(len(v) for v in truth.values())
    got3: dict[int, set] = {}
    for r in rows16:
        got3.setdefault(r.query_id, set()).add(r.cand_id)
    recall3 = (
        sum(len(truth[k] & got3.get(k, set())) for k in truth) / total
    )
    assert recall3 >= 0.30, recall3


def test_pca_matches_numpy_and_finds_planted_axes(spark):
    """similarity.pca_components must equal a full numpy PCA on the
    collected matrix (eigenvalues to 1e-8 rel; projections correlate
    |r| > 0.999 per component — sign is the only legal ambiguity), and
    on data planted with a dominant axis the top component must align
    with it. Also pins the trace and Pythagoras identities the audit
    query asserts."""
    import numpy as np

    from sparkga1_spark.operators.similarity import pca_components, pca_project

    rng = np.random.default_rng(3)
    base = rng.normal(size=(400, 6)) @ np.diag([5, 3, 1, 0.5, 0.2, 0.1])
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    X = (base @ rot + rng.normal(0, 0.01, size=(400, 6))).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    mu, evals, comps = pca_components(df, k=3)
    Xc = X.astype(np.float64) - X.astype(np.float64).mean(0)
    cov = Xc.T @ Xc / 400
    ref_evals, ref_vecs = np.linalg.eigh(cov)
    ref_evals = ref_evals[::-1]
    assert np.allclose(evals, ref_evals, rtol=1e-8)
    assert abs(sum(evals) - np.trace(cov)) <= 1e-9 * np.trace(cov)

    got = pca_project(df, mu, comps).select("vec_id", "pca").collect()
    P = np.array([r.pca for r in sorted(got, key=lambda r: r.vec_id)])
    Pref = Xc @ ref_vecs[:, ::-1][:, :3]
    for j in range(3):
        assert abs(np.corrcoef(P[:, j], Pref[:, j])[0, 1]) > 0.999, j
    # top component carries the dominant planted variance share
    assert evals[0] / sum(evals) > 0.5
    # Pythagoras: mean residual energy == trailing eigenvalue mass
    resid = (Xc**2).sum(1).mean() - (P**2).sum(1).mean()
    assert abs(resid - sum(evals[3:])) <= 1e-6 * sum(evals)


def test_mahalanobis_matches_numpy_and_ranks_planted_outlier(spark):
    """similarity.mahalanobis_scores must equal numpy's whitened
    distance² per vector (1e-6 rel) and must rank a planted
    anisotropic outlier FIRST where raw L2 does not — the reason
    whitening is the scale-correct curation prune."""
    import numpy as np

    from sparkga1_spark.operators.similarity import mahalanobis_scores

    rng = np.random.default_rng(11)
    # wildly unequal variances: dim0 huge, dim3 tiny
    X = rng.normal(size=(300, 4)) * np.array([100.0, 5.0, 1.0, 0.01])
    # planted outlier: modest in the huge dimension (L2-invisible),
    # enormous in the tiny one (Mahalanobis-visible)
    X[0] = [50.0, 0.0, 0.0, 0.5]
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    scored, retained = mahalanobis_scores(df)
    assert retained == 4
    rows = {r.vec_id: r.m2 for r in scored.collect()}

    Xf = X.astype(np.float32).astype(np.float64)  # match the column's float32
    mu = Xf.mean(0)
    cov = (Xf - mu).T @ (Xf - mu) / len(Xf)
    ref = np.einsum("ij,jk,ik->i", Xf - mu, np.linalg.inv(cov), Xf - mu)
    got = np.array([rows[i] for i in range(300)])
    assert np.allclose(got, ref, rtol=1e-6)

    # mean identity: E[m^2] == dim, exactly by construction
    assert abs(got.mean() - 4) <= 1e-9 * 4
    # the planted outlier tops the whitened ranking but not the L2 one
    assert np.argmax(got) == 0
    l2 = ((Xf - mu) ** 2).sum(1)
    assert np.argmax(l2) != 0


def test_mahalanobis_refusals(spark):
    """r6 ADVICE (low): a constant (rank-0) embedding column retains no
    components — must refuse with ValueError, not a numpy shape error;
    a null embedding in the score input must also refuse cleanly (the
    fit path filters None, scoring has no row to skip to)."""
    import pytest as _pytest

    from sparkga1_spark.operators.similarity import mahalanobis_scores

    const = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="no retained components"):
        mahalanobis_scores(const)

    withnull = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0]),
         (3, [2.0, -1.0]), (4, None)],
        "vec_id long, embedding array<float>",
    )
    scored, _ = mahalanobis_scores(withnull)
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception) as ei:
        scored.collect()
    assert "null embedding" in str(ei.value)


def test_ivf_vectorized_matches_expression(planted):
    """r8 (r7 VERDICT #8): the Arrow/numpy assignment kernel must be
    BIT-IDENTICAL to the Catalyst expression path — same sequential
    left-fold dot order, same floor-rounding, same (negcos, cid)
    tiebreak — across nprobe settings. Exact tuple equality including
    the cos_sim doubles; any reassociation of the fold would show up
    here as a last-ulp diff."""
    cent = (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 1000000)
    for nprobe in (1, 2):
        expr = sorted(
            tuple(r)
            for r in S.ivf_topk(
                planted, dim=DIM, centroid_pred=cent, query_pred=_qpred(),
                k=3, nprobe=nprobe, vectorized=False,
            ).collect()
        )
        vec = sorted(
            tuple(r)
            for r in S.ivf_topk(
                planted, dim=DIM, centroid_pred=cent, query_pred=_qpred(),
                k=3, nprobe=nprobe, vectorized=True,
            ).collect()
        )
        assert expr == vec, f"nprobe={nprobe}: vectorized path diverged"


def test_ivfpq_nprobe_all_equals_flat_pq(spark, sf_dir):
    """IVF routing only ever REMOVES candidates: with nprobe = every
    cluster, ivfpq_topk must reproduce the flat PQ-ADC scan's output
    EXACTLY (same seeded codebook, same integer micro-unit arithmetic,
    same tiebreak) — pinning that the composition adds no scoring
    drift, only candidate pruning."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_cent = emb.filter("vec_id % 50 = 0").count()
    flat = S.pq_adc_topk(
        emb, query_pred=F.col("vec_id").between(4, 8),
        codebook_pred=F.col("vec_id") < 4, k=3,
    )
    comp = S.ivfpq_topk(
        emb, dim=DIM,
        centroid_pred=F.col("vec_id") % 50 == 0,
        codebook_pred=F.col("vec_id") < 4,
        query_pred=F.col("vec_id").between(4, 8),
        k=3, nprobe=n_cent,
    )
    assert sorted(map(tuple, flat.collect())) == sorted(
        map(tuple, comp.collect())
    )


def test_ivfpq_planted_twin_recall_floors(planted):
    """IVF+PQ planted-twin recall with the SEEDED 4-code codebook
    (deterministic per fixture SF; centroids exclude the twin block,
    matching test_ivf_planted_recall_floor_and_nprobe_dial's
    geometry): measured top-1 at nprobe 1/2 = 0.65/0.45 at sf0.001 and
    0.75/0.50 at sf0.01, vs flat seeded PQ's 0.10/0.35 — routing HELPS
    a coarse quantizer because pruning the candidate pool removes
    quantization-noise competitors that flat ADC lets outrank the
    twin, and recall is NON-monotone in nprobe (more probes re-admit
    competitors faster than they add missed twins). The trained
    composition below is the production fix for the quantizer
    coarseness."""
    cent = (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 1000000)

    def ivfpq(npb):
        return _top1(
            S.ivfpq_topk(
                planted, dim=DIM, centroid_pred=cent,
                codebook_pred=F.col("vec_id") < 4,
                query_pred=_qpred(), k=3, nprobe=npb,
            )
        )

    flat = _top1(
        S.pq_adc_topk(
            planted, query_pred=_qpred(),
            codebook_pred=F.col("vec_id") < 4, k=3,
        )
    )
    r1, r2 = ivfpq(1), ivfpq(2)
    assert r1 >= flat, (r1, flat)
    assert r1 >= 0.6, r1
    assert r2 >= 0.4, r2


def test_ivfpq_trained_recall_floors(planted):
    """The full production IVFADC shape — trained 16-code codebooks
    routed through IVF probes (ivfpq_topk_trained): measured planted
    top-1 = 0.95 at nprobe=1 and 1.00 at nprobe=2 at BOTH sf0.001 and
    sf0.01 — equal to IVF-flat's exact rescoring (0.95/1.00) and
    above flat trained-PQ's 0.975, while the ADC scan only ever
    touches probed-cluster candidates (the 100x cost story is in
    tools/ann_scale_audit.py). Floors: 0.90 / 0.95."""
    cent = (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 1000000)
    books = S.train_pq_codebooks(
        planted.filter(F.col("vec_id") < 1000000), n_codes=16, iters=3
    )

    def run(npb):
        return _top1(
            S.ivfpq_topk_trained(
                planted, books, dim=DIM, centroid_pred=cent,
                query_pred=_qpred(), k=3, nprobe=npb,
            )
        )

    assert run(1) >= 0.90
    assert run(2) >= 0.95


def test_pq_encode_vectorized_matches_expression(spark, sf_dir):
    """The Arrow/numpy PQ encode must be BIT-IDENTICAL to the
    literal-expression argmin (same per-dimension left-fold, same
    hround + micro-unit snap, same first-minimum tiebreak) — the r8
    IVF-assignment discipline applied to the trained-ADC encode, whose
    4x16x16 interpreted expressions per row dominated the 100x cost."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = S.train_pq_codebooks(emb, n_codes=16, iters=2)
    qp = F.col("vec_id") % 20 == 0
    a = S.pq_adc_topk_trained(emb, books, query_pred=qp, k=3, vectorized=False)
    b = S.pq_adc_topk_trained(emb, books, query_pred=qp, k=3, vectorized=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    cent = F.col("vec_id") % 50 == 0
    c = S.ivfpq_topk_trained(emb, books, dim=DIM, centroid_pred=cent,
                             query_pred=qp, k=3, nprobe=2, vectorized=False)
    d = S.ivfpq_topk_trained(emb, books, dim=DIM, centroid_pred=cent,
                             query_pred=qp, k=3, nprobe=2, vectorized=True)
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, d.collect()))


def test_ivfpq_residual_beats_raw_on_clustered_data(spark):
    """residual=True is the paper's actual IVFADC — codes quantize
    v − centroid(v), trained on ivf_residuals output. On CLUSTERED
    data (8 well-separated centers, 60 members each at σ=0.03, twins
    planted at σ=0.005) a 4-code RAW quantizer is measured at 0.000
    planted top-1: every cluster member lands on the same code per
    subspace, all ADC distances tie, and the id tiebreak never picks
    the twin — the coarse geometry eats the whole code budget. The
    RESIDUAL quantizer spends the same 4 codes on within-cluster
    structure: measured 0.583 at both nprobe settings. Floors pin the
    separation (residual ≥ 0.5, raw ≤ 0.1) and the vectorized encode's
    bit-identity on the residual path."""
    import numpy as np

    rng = np.random.RandomState(42)
    K, PER = 8, 60
    centers = rng.uniform(0, 1, (K, DIM))
    rows = []
    for k in range(K):
        rows.append((1000 * k, centers[k].tolist()))  # exact center row
        for i in range(1, PER + 1):
            v = centers[k] + 0.03 * rng.standard_normal(DIM)
            rows.append((1000 * k + i, v.tolist()))
    base = dict(rows)
    twins = []
    for k in range(K):
        for i in range(10, PER + 1, 10):
            bid = 1000 * k + i
            twins.append((
                1_000_000 + bid,
                (np.array(base[bid]) + 0.005 * rng.standard_normal(DIM)).tolist(),
            ))
    emb = spark.createDataFrame(
        rows + twins, "vec_id long, embedding array<double>"
    ).persist()
    pairs = {q: q - 1_000_000 for q, _ in twins}
    qpred = F.col("vec_id") >= 1_000_000
    cent = (F.col("vec_id") % 1000 == 0) & (F.col("vec_id") < 1_000_000)

    def top1(df):
        got = {r.query_id: r.cand_id for r in df.collect() if r.rank == 1}
        return sum(1 for q, w in pairs.items() if got.get(q) == w) / len(pairs)

    data = emb.filter(F.col("vec_id") < 1_000_000)
    books_raw = S.train_pq_codebooks(data, n_codes=4, iters=3)
    books_res = S.train_pq_codebooks(
        S.ivf_residuals(data, dim=DIM, centroid_pred=cent),
        vec_col="_res", n_codes=4, iters=3,
    )
    raw = top1(S.ivfpq_topk_trained(
        emb, books_raw, dim=DIM, centroid_pred=cent, query_pred=qpred,
        k=3, nprobe=2,
    ))
    res = top1(S.ivfpq_topk_trained(
        emb, books_res, dim=DIM, centroid_pred=cent, query_pred=qpred,
        k=3, nprobe=2, residual=True,
    ))
    assert raw <= 0.1, raw
    assert res >= 0.5, res
    assert res > raw

    # residual-path bit-identity: vectorized encode == expression encode
    a = S.ivfpq_topk_trained(
        emb, books_res, dim=DIM, centroid_pred=cent, query_pred=qpred,
        k=3, nprobe=2, residual=True, vectorized=False,
    )
    b = S.ivfpq_topk_trained(
        emb, books_res, dim=DIM, centroid_pred=cent, query_pred=qpred,
        k=3, nprobe=2, residual=True, vectorized=True,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    emb.unpersist()
