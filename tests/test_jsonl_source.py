"""JSONL transcript source (sources/jsonl.py): schema, corrupt-line
quarantine, and end-to-end flow into the pipeline."""

import json
import os

from docs2kg_spark.sources.jsonl import read_transcripts_jsonl


def _write(tmp_path, lines):
    p = os.path.join(str(tmp_path), "t.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(lines))
    return p


GOOD = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "Alice: hi.", "tool": None, "ts": "2025-01-01T00:00:00Z"},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "ok", "tool": None, "ts": "2025-01-01T00:00:01Z"},
    {"conv_id": "c2", "turn_idx": 0, "role": "tool", "text": "ran", "tool": "python", "ts": "2025-01-01T01:00:00Z"},
]


def test_good_lines_parse_with_contract_schema(spark, tmp_path):
    p = _write(tmp_path, [json.dumps(r) for r in GOOD])
    good, corrupt = read_transcripts_jsonl(spark, p)
    assert good.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert dict(good.dtypes)["turn_idx"] == "int"
    assert dict(good.dtypes)["ts"] == "timestamp"
    rows = {(r.conv_id, r.turn_idx): r for r in good.collect()}
    assert len(rows) == 3 and corrupt.count() == 0
    assert rows[("c2", 0)].tool == "python"


def test_corrupt_lines_are_quarantined_not_dropped(spark, tmp_path):
    lines = [
        json.dumps(GOOD[0]),
        "{not json at all",
        "",  # blank separator: dropped, not quarantined
        '{"conv_id": "c9", "turn_idx": "NOT_AN_INT", "role": "user", "text": "x"}',
        json.dumps(GOOD[2]),
    ]
    p = _write(tmp_path, lines)
    good, corrupt = read_transcripts_jsonl(spark, p)
    assert good.count() == 2
    bad = corrupt.collect()
    assert len(bad) == 2
    assert {r.quarantine_reason for r in bad} == {"malformed json line"}
    raws = {r.raw_line for r in bad}
    assert "{not json at all" in raws
    assert any("NOT_AN_INT" in r for r in raws)


def test_flows_into_pipeline_stages(spark, tmp_path):
    from docs2kg_spark.operators.mentions import extract_mentions
    from docs2kg_spark.operators.segments import segment_transcripts
    from docs2kg_spark.plans.pipeline import normalize_input

    p = _write(tmp_path, [json.dumps(r) for r in GOOD] + ["oops"])
    good, corrupt = read_transcripts_jsonl(spark, p)
    segs = segment_transcripts(normalize_input(good))
    ms = extract_mentions(segs, spark).collect()
    assert any(m.text == "alice" for m in ms)
    assert corrupt.count() == 1
