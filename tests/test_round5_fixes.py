"""Round-5 ADVICE regression tests.

1. _IU_SHINGLE_CACHE must be keyed by (shingle_k, text): with reused
   Python workers, a second minhash_estimator_audit call at a
   DIFFERENT shingle_k used to silently reuse shingle sets computed at
   the old k, corrupting n_inter/n_union (ADVICE r4 item 1).
2. pca_fit must pin eigenvector signs (largest-|coeff| entry positive)
   so refits of the same data are reproducible (ADVICE r4 item 3).
"""

import numpy as np
import pytest

from docs2kg_spark.config import PipelineConfig
from docs2kg_spark.operators.dedup import minhash_estimator_audit
from docs2kg_spark.operators.similarity import pca_fit


def _truth(texts, k):
    """Exact shingle intersection/union, same tokenization as iu()."""
    def sh(s):
        t = (s or "").lower()
        return {t} if len(t) <= k else {t[i:i + k] for i in range(len(t) - k + 1)}
    sets = {i: sh(s) for i, s in texts}
    return sets


def test_shingle_cache_keyed_by_k(spark):
    # Texts crafted so the k=5 and k=2 shingle sets differ materially.
    texts = [
        (0, "the cat sat on the mat tonight"),
        (1, "the cat sat on the mat tonight!"),
        (2, "the dog sat on the mat tonight"),
        (3, "the dog sat on the mat tonight!"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    for k in (5, 2, 7, 5):  # revisit k=5 AFTER other ks to catch stale reuse
        cfg = PipelineConfig(shingle_k=k, jaccard_threshold=0.1, lsh_bands=8)
        rows = minhash_estimator_audit(df, cfg=cfg).collect()
        assert rows, f"no candidate pairs at k={k}"
        sets = _truth(texts, k)
        for r in rows:
            a, b = sets[r["a"]], sets[r["b"]]
            ni = len(a & b)
            assert r["n_inter"] == ni, (k, r["a"], r["b"])
            assert r["n_union"] == len(a) + len(b) - ni, (k, r["a"], r["b"])


def test_pca_sign_convention(spark):
    rng = np.random.RandomState(3)
    M = rng.randn(200, 16) * 0.05
    M[:, 4] = rng.randn(200) * 5.0
    M[:, 9] = rng.randn(200) * 2.0
    M = np.asarray(M, dtype=np.float32)
    rows = [(i, [float(x) for x in M[i]]) for i in range(len(M))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fit1 = pca_fit(df, dim=16)
    fit2 = pca_fit(df.repartition(7), dim=16)  # different partition order
    for fit in (fit1, fit2):
        for r in range(fit["components"].shape[0]):
            j = int(np.argmax(np.abs(fit["components"][r])))
            assert fit["components"][r, j] > 0, f"component {r} not sign-pinned"
    # top components (well-separated eigvals) must now agree exactly in
    # sign and to float tolerance in value across refits
    np.testing.assert_allclose(
        fit1["components"][:2], fit2["components"][:2], atol=1e-6
    )


def test_global_row_number_exact_and_shaped(spark):
    """skew.global_row_number == row_number() OVER (ORDER BY …) exactly,
    with no partition-less ordered window over the data relation."""
    from pyspark.sql import functions as F

    from docs2kg_spark.functions.skew import global_row_number
    from docs2kg_spark.plans.audit import global_ordered_windows, physical_plan

    df = spark.range(5000).select((F.col("id") * 37 % 5000).alias("v"))
    out = global_row_number(df, [F.col("v").desc()], "rk")
    assert not global_ordered_windows(physical_plan(out))
    rows = sorted((r["v"], r["rk"]) for r in out.collect())
    assert rows == [(v, 5000 - v) for v in range(5000)]


def test_audit_sample_mod_thresholds():
    from docs2kg_spark.operators.dedup import audit_sample_mod

    assert audit_sample_mod(500) == 1       # driver oracle scale
    assert audit_sample_mod(5_000) == 1     # bench scale
    assert audit_sample_mod(50_000) == 4    # sf1 stress scale
    assert audit_sample_mod(10_000_000) == 800


def test_audit_pair_sampling_is_subset_and_deterministic(spark):
    from docs2kg_spark.operators.dedup import minhash_estimator_audit

    texts = [(i, f"the quick brown fox {i % 7} jumps over the lazy dog") for i in range(60)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    full = {(r["a"], r["b"]): (r["n_inter"], r["n_union"])
            for r in minhash_estimator_audit(df).collect()}
    samp = {(r["a"], r["b"]): (r["n_inter"], r["n_union"])
            for r in minhash_estimator_audit(df, sample_mod=3).collect()}
    assert samp, "sample must be non-empty on a dup-heavy fixture"
    assert len(samp) < len(full)
    for k, v in samp.items():
        assert full[k] == v  # sampled rows are exact rows of the full audit
    # deterministic: same predicate, same rows
    samp2 = {(r["a"], r["b"]) for r in minhash_estimator_audit(df, sample_mod=3).collect()}
    assert samp2 == set(samp)
