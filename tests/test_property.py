"""Property-style tests: randomized (seeded) transcripts → Spark and the
oracle must agree exactly; dedup idempotence."""

import random

from docs2kg_spark.config import DEFAULT_GAZETTEER
from docs2kg_spark.operators.mentions import extract_mentions
from docs2kg_spark.operators.segments import segment_transcripts
from docs2kg_spark.oracle.reference import extract_segment_mentions, unique_mentions


def _random_texts(n, seed):
    rng = random.Random(seed)
    surfaces = [e for e, _ in DEFAULT_GAZETTEER]
    fillers = ["met", "with", "per", "from", "asap", "xx1", "--", "9", ""]
    puncts = [".", ",", ":", ";", "!", "?", " ", "  ", " . "]
    texts = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(1, 12)):
            r = rng.random()
            if r < 0.4:
                s = rng.choice(surfaces)
                s = rng.choice([s, s.upper(), s.lower(), s.capitalize()])
                parts.append(s)
            elif r < 0.7:
                parts.append(rng.choice(fillers))
            else:
                parts.append(rng.choice(puncts))
        texts.append(rng.choice(["", " ", ""]).join(parts) if rng.random() < 0.1 else " ".join(parts))
    return [t for t in texts if t.strip()]


def test_random_texts_spark_equals_oracle(spark):
    texts = _random_texts(120, seed=99)
    rows = [("c", i, "user", t, None) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string")
    segs = segment_transcripts(df)
    text_by_seg = {r.seg_id: r.text for r in segs.collect()}
    got = {}
    for r in extract_mentions(segs, spark).collect():
        got.setdefault(r.seg_id, set()).add((r.start, r.end, r.text, r.label, r.confidence, r.method))
    for seg_id, text in text_by_seg.items():
        want = {
            (m.start, m.end, m.text, m.label, m.confidence, m.method)
            for m in extract_segment_mentions(text)
        }
        assert got.get(seg_id, set()) == want, f"text: {text!r}"


def test_unique_mentions_idempotent():
    for seed in range(5):
        for t in _random_texts(10, seed):
            ms = extract_segment_mentions(t)
            assert unique_mentions(ms) == ms  # already deduped → fixpoint
