"""ANN scale audit (r7 VERDICT #8): IVF + trained-PQ at a replicated
scale point, WITH the planted-twin recall audit attached — a wall-time
number without a recall number would let a fast-but-blind index pass.

Twins are planted on the BASE id block only (ids < 10000 — the replica
blocks start at 10,000,019), exactly the fixture rule from
tests/test_ann_recall.py: one perturbed copy of every 25th base vector
at id+1,000,000. Replica copies of a base vector are value-identical,
so a twin's true top-1 is still its base original (the (cos DESC,
cand_id ASC) tiebreak picks the lowest id among the identical copies).

IVF runs in two configurations: the fixture centroid rule (floor check
— floors derived from the measured sf0.1 1x baseline, see the inline
comment) and the production budget k ≈ sqrt(n) (timing envelope; the
fixture's %50 seed rule makes k ∝ n, which is the quadratic n·k
envelope SCALE_SMOKE measures separately). PQ trains 16-code codebooks
on the scaled corpus and reports trained-ADC recall@1 vs its 0.95
floor.

Usage: python tools/ann_scale_audit.py <sf_dir> [centroid_stride]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from sparkga1_spark.operators import similarity as S
    from sparkga1_spark.operators.cache import release_tracked, tracked_persist
    from sparkga1_spark.session import get_spark

    sf_dir = sys.argv[1]
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    spark = get_spark("ann-scale-audit")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    if not stride:
        stride = max(1, int(round(n**0.5)))  # k ~= sqrt(n)

    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # plant twins of the base block only (fixture rule, base ids < 10000)
    pert = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 10000)).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, j: x
            + F.lit(0.01) * ((F.col("vec_id") + j) % 5 - 2).cast("double"),
        ).alias("embedding"),
    )
    planted = tracked_persist(base.unionAll(pert))
    pairs = {r["vec_id"] + 1_000_000: r["vec_id"]
             for r in emb.filter(
                 (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 10000)
             ).select("vec_id").collect()}
    qpred = F.col("vec_id").between(1_000_000, 1_009_999)

    def top1_recall(df) -> float:
        got = {r.query_id: r.cand_id for r in df.collect() if r.rank == 1}
        return sum(1 for q, w in pairs.items() if got.get(q) == w) / len(pairs)

    out = {"sf_dir": sf_dir, "n_vectors": n, "n_twins": len(pairs),
           "centroid_stride": stride}
    # Config 1 — FIXTURE RULE at scale: the same centroid set the
    # pytest floors use (base-block %50 seeds, planted range excluded);
    # only the corpus grows. The pytest floors (0.9 / 1.0) are pinned
    # at the sf0.001 test fixture (20 twins); THIS audit's floors are
    # pinned from the measured sf0.1 1x baseline minus a small margin
    # (0.925 / 0.9875 measured -> 0.85 / 0.95) — the question a scale
    # audit answers is whether recall COLLAPSES as the corpus grows
    # 10-100x around the same planted geometry, not whether a
    # small-fixture exact number reproduces. k stays 40, so assignment
    # is forced onto the vectorized kernel (bit-identical to the
    # expression path per test_ivf_vectorized_matches_expression).
    cent_fix = (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 1_000_000)
    for nprobe, floor in ((1, 0.85), (2, 0.95)):
        t0 = time.time()
        r = top1_recall(
            S.ivf_topk(planted, dim=64, centroid_pred=cent_fix,
                       query_pred=qpred, k=3, nprobe=nprobe, vectorized=True)
        )
        out[f"ivf_fixture_nprobe{nprobe}"] = {
            "sec": round(time.time() - t0, 2),
            "recall_at_1": round(r, 4),
            "floor": floor,
            "pass": r >= floor,
        }
        release_tracked()
        planted = tracked_persist(planted)
        print(f"# ivf fixture nprobe={nprobe}: "
              f"{out[f'ivf_fixture_nprobe{nprobe}']}", file=sys.stderr)
    # Config 2 — PRODUCTION BUDGET k ~= sqrt(n): the timing envelope the
    # operator would actually run at this corpus size (the fixture's
    # %50 rule makes k grow with n — the quadratic n·k envelope
    # SCALE_SMOKE measures separately). Recall reported, no pinned
    # floor: the dial position differs from the fixture geometry.
    cent_sqrt = (F.col("vec_id") % stride == 0) & ~F.col("vec_id").between(
        1_000_000, 1_009_999
    )
    for nprobe in (1, 2):
        t0 = time.time()
        r = top1_recall(
            S.ivf_topk(planted, dim=64, centroid_pred=cent_sqrt,
                       query_pred=qpred, k=3, nprobe=nprobe)
        )
        out[f"ivf_sqrtk_nprobe{nprobe}"] = {
            "sec": round(time.time() - t0, 2),
            "recall_at_1": round(r, 4),
        }
        release_tracked()
        planted = tracked_persist(planted)
        print(f"# ivf sqrt-k nprobe={nprobe}: "
              f"{out[f'ivf_sqrtk_nprobe{nprobe}']}", file=sys.stderr)

    # Config 3 — IVF+PQ composed (r8 VERDICT #6): the coarse quantizer
    # routes the ADC scan through the query's probed clusters, so
    # search cost is probed-cluster-bounded instead of candidate-linear
    # (flat trained-PQ measured 98s at 100× in SCALE_SMOKE_r8 — the
    # pq_trained16 row below is that comparator, same session). Seeded
    # 4-code codebook = the pytest fixture's (floors pinned there on
    # the fixture geometry; here recall must stay FLAT as the corpus
    # grows — replica copies of a base vector are value-identical, so
    # the (d_micro, cand_id) tiebreak still names the base original).
    cb4 = (F.col("vec_id") < 4) & (F.col("vec_id") < 1_000_000)
    for nprobe in (1, 2):
        t0 = time.time()
        r = top1_recall(
            S.ivfpq_topk(planted, dim=64, centroid_pred=cent_fix,
                         codebook_pred=cb4, query_pred=qpred, k=3,
                         nprobe=nprobe, vectorized=True)
        )
        out[f"ivfpq_seeded4_nprobe{nprobe}"] = {
            "sec": round(time.time() - t0, 2),
            "recall_at_1": round(r, 4),
        }
        release_tracked()
        planted = tracked_persist(planted)
        print(f"# ivfpq seeded4 nprobe={nprobe}: "
              f"{out[f'ivfpq_seeded4_nprobe{nprobe}']}", file=sys.stderr)

    t0 = time.time()
    books = S.train_pq_codebooks(
        planted.filter(F.col("vec_id") < 1_000_000), n_codes=16, iters=3
    )
    train_sec = round(time.time() - t0, 2)
    t0 = time.time()
    r = top1_recall(
        S.pq_adc_topk_trained(planted, books, query_pred=qpred, k=3)
    )
    out["pq_trained16"] = {
        "train_sec": train_sec,
        "search_sec": round(time.time() - t0, 2),
        "recall_at_1": round(r, 4),
        "floor": 0.95,
        "pass": r >= 0.95,
    }
    print(f"# pq: {out['pq_trained16']}", file=sys.stderr)

    # Config 4 — TRAINED IVF+PQ (r9, the full production IVFADC): the
    # same trained 16-code books routed through the fixture-rule IVF
    # probes. The comparison that closes r8 VERDICT #6: search_sec vs
    # pq_trained16's flat candidate-linear scan at the same quantizer
    # quality — cost must be probed-cluster-bounded while recall holds
    # the same floors as the exact-rescoring IVF arms.
    release_tracked()
    planted = tracked_persist(planted)
    for nprobe, floor in ((1, 0.85), (2, 0.95)):
        t0 = time.time()
        r = top1_recall(
            S.ivfpq_topk_trained(planted, books, dim=64,
                                 centroid_pred=cent_fix, query_pred=qpred,
                                 k=3, nprobe=nprobe, vectorized=True)
        )
        out[f"ivfpq_trained16_nprobe{nprobe}"] = {
            "sec": round(time.time() - t0, 2),
            "recall_at_1": round(r, 4),
            "floor": floor,
            "pass": r >= floor,
        }
        release_tracked()
        planted = tracked_persist(planted)
        print(f"# ivfpq trained16 nprobe={nprobe}: "
              f"{out[f'ivfpq_trained16_nprobe{nprobe}']}", file=sys.stderr)

    # Config 5 — RESIDUAL IVFADC (r9 VERDICT #7): the paper's actual
    # form — books trained on v − centroid(v), per-(query, cluster)
    # LUTs from q − centroid_c. Floors follow this tool's convention
    # (measured sf0.1 1x baseline minus margin): residual measured
    # 0.8875 / 0.90 at nprobe 1/2 on THIS fixture → floors 0.80/0.85.
    # They sit slightly below the raw trained arms' because the twin
    # fixture is UNIFORM random data, where residual coding buys
    # nothing (the r9 docstring's documented expectation) — the
    # residual ADVANTAGE is pinned on the clustered fixture by
    # test_ivfpq_residual_beats_raw_on_clustered_data (raw 0.000 vs
    # residual 0.583 planted top-1 at equal budget). This audit's
    # question is that the residual path neither collapses nor drifts
    # as the corpus grows 10-100x around the same geometry.
    t0 = time.time()
    res = S.ivf_residuals(
        planted.filter(F.col("vec_id") < 1_000_000), dim=64,
        centroid_pred=cent_fix,
    )
    res_books = S.train_pq_codebooks(res, vec_col="_res", n_codes=16, iters=3)
    res_train_sec = round(time.time() - t0, 2)
    release_tracked()
    planted = tracked_persist(planted)
    for nprobe, floor in ((1, 0.80), (2, 0.85)):
        t0 = time.time()
        r = top1_recall(
            S.ivfpq_topk_trained(planted, res_books, dim=64,
                                 centroid_pred=cent_fix, query_pred=qpred,
                                 k=3, nprobe=nprobe, vectorized=True,
                                 residual=True)
        )
        out[f"ivfpq_residual16_nprobe{nprobe}"] = {
            "train_sec": res_train_sec,
            "sec": round(time.time() - t0, 2),
            "recall_at_1": round(r, 4),
            "floor": floor,
            "pass": r >= floor,
        }
        release_tracked()
        planted = tracked_persist(planted)
        print(f"# ivfpq residual16 nprobe={nprobe}: "
              f"{out[f'ivfpq_residual16_nprobe{nprobe}']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
