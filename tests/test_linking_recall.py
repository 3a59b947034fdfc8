"""Entity-linking candidate recall vs the documented banding S-curve
(VERDICT r3 item 7).

The LSH banding in linking.candidate_pairs is the only lossy step on
the linking path; its docstring documents P(candidate | J) =
1 - (1 - J^2)^16 at the default 16 bands x 2 rows, i.e. >= 0.97 at the
J=0.45 decision threshold.  This test crafts surface pairs whose EXACT
character-3-shingle Jaccard sits in the borderline [0.45, 0.70] band —
the hardest region — and pins the measured candidate recall on the
seeded fixture (deterministic: minhash permutations are seed-derived,
shingle hashing is content-addressed; the measured number is a
constant, not a flaky sample)."""

import random

import pytest

from docs2kg_spark.config import PipelineConfig
from docs2kg_spark.operators.linking import candidate_pairs, verified_edges


def _shingles(s: str, k: int = 3) -> set:
    # exactly make_jaccard_udf's shingle definition (linking.py)
    s = s.lower()
    if len(s) <= k:
        return {s}
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def _jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def _borderline_pairs(n_pairs: int = 30):
    """Deterministic borderline-J pairs: each pair shares a unique stem
    (so cross-pair Jaccard is negligible) and differs in a generated
    suffix sized to land the exact Jaccard in [0.45, 0.70]."""
    rng = random.Random(20260819)
    letters = "abcdefghijklmnopqrstuvwxyz"
    pairs = []
    attempts = 0
    while len(pairs) < n_pairs and attempts < 4000:
        attempts += 1
        stem = "".join(rng.choice(letters) for _ in range(rng.randint(10, 16)))
        sfx_a = "".join(rng.choice(letters) for _ in range(rng.randint(3, 8)))
        sfx_b = "".join(rng.choice(letters) for _ in range(rng.randint(3, 8)))
        a, b = f"{stem} {sfx_a}", f"{stem} {sfx_b}"
        if 0.45 <= _jaccard(a, b) <= 0.70:
            pairs.append((a, b))
    assert len(pairs) == n_pairs, "fixture generation failed"
    return pairs


@pytest.fixture(scope="module")
def fixture_pairs():
    return _borderline_pairs()


def test_borderline_candidate_recall(spark, fixture_pairs):
    cfg = PipelineConfig()
    rows = []
    for i, (a, b) in enumerate(fixture_pairs):
        rows.append((f"p{i:03d}_a", a, "Organization"))
        rows.append((f"p{i:03d}_b", b, "Organization"))
    nodes = spark.createDataFrame(rows, "node_id string, text string, label string")
    pairs, block_stats = candidate_pairs(nodes, cfg)
    got = {
        tuple(sorted((r["a"], r["b"]))) for r in pairs.select("a", "b").collect()
    }
    want = {
        tuple(sorted((f"p{i:03d}_a", f"p{i:03d}_b")))
        for i in range(len(fixture_pairs))
    }
    hit = len(want & got)
    recall = hit / len(want)
    # documented curve: P(candidate) >= 0.973 per pair at J=0.45, higher
    # above; allow binomial slack of ~2 misses on 30 pairs.  The measured
    # value is deterministic — if this drops, the banding changed.
    assert recall >= 0.9, f"candidate recall {recall} below documented S-curve bound"
    # no degenerate blocks in this fixture: nothing was capped
    st = block_stats.collect()[0]
    assert st["n_capped_blocks"] == 0

    # precision-after-verification is 1.0 by construction: every
    # verified edge must have exact Jaccard >= the threshold
    edges = verified_edges(pairs, cfg)
    texts = {r["node_id"]: r["text"] for r in nodes.collect()}
    for r in edges.collect():
        assert _jaccard(texts[r["a"]], texts[r["b"]]) >= cfg.jaccard_threshold


def test_scurve_math_matches_docstring():
    """The docstring's numbers are derivable, not hand-waved."""
    b, r = 16, 2
    for j, expect in ((0.45, 0.973), (0.55, 0.993)):
        p = 1 - (1 - j**r) ** b
        assert abs(p - expect) < 0.005, (j, p)
