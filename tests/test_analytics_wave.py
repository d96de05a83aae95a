"""Mathematical-invariant tests for the round-6 session-5 analytics
wave — properties the oracle hash cannot express (the x_minhash_accuracy
lesson: pin internal invariants, not just output equality)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkga1_spark.plans.registry import all_queries
from sparkga1_spark.sources.catalog import load_table


def test_gini_lorenz_invariants(spark, sf_dir):
    rows = (
        all_queries()["x_revenue_gini_lorenz"](spark, sf_dir)
        .orderBy("decile")
        .collect()
    )
    assert [r.decile for r in rows] == list(range(10))
    gini = rows[0].gini
    assert all(r.gini == gini for r in rows), "gini must be a single scalar"
    assert 0.0 <= gini < 1.0
    # Lorenz curve: cumulative share is monotone, ends at 1, and lies
    # BELOW the diagonal (deciles are sorted ascending by revenue)
    shares = [r.cum_share for r in rows]
    assert all(a < b for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-9
    assert all(s <= (i + 1) / 10 + 1e-9 for i, s in enumerate(shares))
    # ascending rank order makes per-decile mass non-decreasing
    # (equal-width deciles up to the ±1 rank rounding at boundaries)
    per_cust = [r.decile_cents / r.n_cust for r in rows]
    assert all(a <= b for a, b in zip(per_cust, per_cust[1:]))
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_cust for r in rows) == n_cust


def test_survival_km_invariants(spark, sf_dir):
    rows = (
        all_queries()["x_survival_km"](spark, sf_dir).orderBy("t_day").collect()
    )
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # first risk set is everyone; risk sets strictly shrink
    assert rows[0].n_risk == n_users
    risks = [r.n_risk for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    # risk-set bookkeeping: n_risk[i+1] = n_risk[i] - d[i] - c[i]
    for a, b in zip(rows, rows[1:]):
        assert b.n_risk == a.n_risk - a.n_churn - a.n_censored
    # the product-limit estimator is a probability and non-increasing
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))


def test_kmeans_assign_matches_bruteforce_python(spark, sf_dir):
    """The oracle pins cross-engine equality; this pins the MATH — the
    per-cluster counts must equal a pure-Python argmin over the same
    vectors (expanded-form distance, same tiebreak)."""
    emb = load_table(spark, sf_dir, "embeddings").collect()
    cents = {r.vec_id: list(map(float, r.embedding)) for r in emb if r.vec_id < 4}
    counts: dict[int, int] = {}
    for r in emb:
        v = list(map(float, r.embedding))
        best = min(
            (
                (
                    sum(x * x for x in v)
                    - 2.0 * sum(x * y for x, y in zip(v, c))
                    + sum(y * y for y in c),
                    cid,
                )
                for cid, c in cents.items()
            )
        )
        counts[best[1]] = counts.get(best[1], 0) + 1
    got = {
        r.centroid_id: r.n_assigned
        for r in all_queries()["x_kmeans_assign_audit"](spark, sf_dir).collect()
    }
    assert got == counts


def test_knn_vote_totals(spark, sf_dir):
    rows = all_queries()["x_knn_label_vote"](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_probe = emb.filter(
        (F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 10000)
    ).count()
    assert sum(r.n_queries for r in rows) == n_probe
    assert all(0 <= r.n_correct <= r.n_queries for r in rows)


def test_ab_ztest_identities(spark, sf_dir):
    row = all_queries()["x_ab_conversion_ztest"](spark, sf_dir).collect()[0]
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert row.n0 + row.n1 == n_users
    assert 0 <= row.c0 <= row.n0 and 0 <= row.c1 <= row.n1
    assert math.isfinite(row.z_score)
    # the z sign must agree with the rate difference
    if row.rate1 != row.rate0:
        assert (row.z_score > 0) == (row.rate1 > row.rate0)


def test_seasonality_index_weighted_mean_is_one(spark, sf_dir):
    """Σ n·index over a type's weekdays equals Σ n exactly (the index
    is mean_dow/mean_overall, so the n-weighted mean is 1 by algebra)."""
    rows = all_queries()["x_seasonality_dow"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        n = sum(r.n_events for r in rs)
        weighted = sum(r.n_events * r.dow_index for r in rs)
        assert abs(weighted / n - 1.0) < 1e-4, t
        assert all(1 <= r.dow <= 7 for r in rs)


def test_heaps_growth_totals(spark, sf_dir):
    from sparkga1_spark.functions import text as T

    rows = (
        all_queries()["x_heaps_vocab_growth"](spark, sf_dir)
        .orderBy("decile")
        .collect()
    )
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(T.words(F.col("text"))).alias("w"))
        .select("w")
        .distinct()
        .count()
    )
    assert rows[-1].cum_vocab == vocab
    assert sum(r.n_new_tokens for r in rows) == vocab
    assert sum(r.n_docs for r in rows) == docs.count()
    cums = [r.cum_vocab for r in rows]
    assert all(a <= b for a, b in zip(cums, cums[1:]))
    # growth must decelerate in aggregate: the first half of the corpus
    # introduces at least as many new tokens as the second half
    first = sum(r.n_new_tokens for r in rows[:5])
    second = sum(r.n_new_tokens for r in rows[5:])
    assert first >= second


def test_cusum_peak_bounds(spark, sf_dir):
    rows = all_queries()["x_cusum_changepoint"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    ).collect()[0]
    for r in rows:
        assert ev.lo <= r.peak_day <= ev.hi
        assert r.cusum_peak >= 0.0
        assert r.n_days >= 1


def test_readability_counts(spark, sf_dir):
    rows = all_queries()["x_readability_flesch"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_scored = docs.filter(
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+")) > 0
    ).count()
    assert sum(r.n_docs for r in rows) == n_scored
    for r in rows:
        # the decade bucket must actually contain its min/max
        assert r.decade * 10 <= r.min_score <= r.max_score < (r.decade + 1) * 10


def test_survival_km_empty_events_returns_empty(spark, tmp_path):
    """Zero event rows must yield an empty result, not a TypeError from
    int(None) on the scalar pulls (review-caught after the r7
    de-replication moved the corpus-max cut to a build-time .first())."""
    import shutil

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "sf_empty_events")
    import os

    os.makedirs(d)
    for t in ("events",):
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).write.parquet(
            f"{d}/{t}.parquet"
        )
    from sparkga1_spark.plans.registry import all_queries

    out = all_queries()["x_survival_km"](spark, d)
    assert out.count() == 0
    assert out.columns == ["t_day", "n_churn", "n_censored", "n_risk",
                           "survival"]
