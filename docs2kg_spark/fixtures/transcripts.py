"""Deterministic synthetic transcript generator (FIXTURES.md §F1).

Schema per BASELINE.json::input_hint:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Design constraints honored:
- fully deterministic for a given (n_convs, mean_turns, seed) — no
  wall-clock, no unseeded randomness;
- Zipf-ish conversation lengths (a few very long conversations) to
  exercise skew handling;
- rows are emitted in shuffled order so stable-ordering windows are
  actually exercised (the per-turn text-equality invariant);
- texts embed gazetteer entities at positions that exercise the
  reference matcher's edge cases (SURVEY.md §1.4): entity at position 0,
  entity at end, entity adjacent to punctuation (survives the boundary
  rule of ner_spacy_match.py:159-178), entity preceded/followed by an
  alphabetic token (must be dropped by the boundary rule but still found
  by the substring-find LLM path, ner_prompt_based.py:201-206), entity
  as a substring of a longer word (must never match), repeated entity in
  one turn (first-occurrence rule), multi-sentence text with irregular
  whitespace after periods (reproduces the chunk-offset drift of
  ner_prompt_based.py:60-62,128), and whitespace-only turns (skip rule,
  layout_kg.py:34-36).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd

from docs2kg_spark.config import DEFAULT_GAZETTEER

_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

_ROLES = ("user", "assistant", "system", "tool")
_TOOLS = ("search", "python", "browser", "calculator")

# Templates: "{E}" slots are filled with gazetteer surfaces.  Punctuation
# placement is deliberate — entities adjacent to punctuation/start/end
# survive the reference's word-boundary rule; entities flanked by
# alphabetic tokens do not (but the LLM-standin substring path finds
# them), giving the two extraction methods distinguishable outputs.
_TEMPLATES = (
    "{E0}: please review the deployment for {E1}.",
    "{E0}, {E1}, and others joined the call.",
    "status update - {E0}; owner is {E1}.",
    "we think {E0} should talk to {E1} about the rollout.",
    "ticket filed by {E0}. assigned to: {E1}.",
    "{E0} works at {E1} since last spring.",
    "notes: {E0}.  follow-up with {E1}.  done.",
    "deployed via {E0}: config checked by {E1}, twice by {E1}.",
    "meeting in {E0}; remote dial-in from {E1}.",
    "error in pipeline {E0}. escalate to {E1}!",
)

# plain filler turns with no entities (still multi-sentence sometimes)
_FILLERS = (
    "ok sounds good. will do.",
    "let me check the logs first.",
    "no blockers today",
    "the quarterly numbers look fine.  revenue up.",
    "rebooting the staging box now",
    "???",
    "ack",
)

# substring traps: contain a gazetteer surface only as part of a longer
# word — must NOT be matched by either path as a standalone token, and
# even substring-find will locate them (llm path has no boundary rule,
# which is itself reference-faithful).
_TRAPS = (
    "sparkling water was served at the offsite.",
    "the limang fruit is not from Lima.",
    "bobsled season starts soon.",
)


def _conv_lengths(n_convs: int, mean_turns: int, rng: random.Random, zipf_s: float = 1.3):
    """Zipf-ish lengths: rank-based power law, so a few conversations are
    very long (hot-key skew for the linking/relation stages)."""
    lengths = []
    for rank in range(1, n_convs + 1):
        base = mean_turns * (n_convs / rank) ** (1.0 / zipf_s) / 2.0
        jitter = 0.5 + rng.random()
        lengths.append(max(1, int(base * jitter)))
    # cap so unit-scale fixtures stay small, but keep the top rank hot
    cap = mean_turns * 12
    return [min(length, cap) for length in lengths]


def gen_transcripts(
    n_convs: int = 50,
    mean_turns: int = 10,
    seed: int = 7,
) -> list[dict]:
    """Generate transcript rows (shuffled order). Returns list of dicts."""
    rng = random.Random(seed)
    surfaces = [e for e, _ in DEFAULT_GAZETTEER]
    rows: list[dict] = []
    lengths = _conv_lengths(n_convs, mean_turns, rng)

    for ci in range(n_convs):
        conv_id = f"conv-{ci:06d}"
        n_turns = lengths[ci]
        for ti in range(n_turns):
            role = _ROLES[(ci + ti) % len(_ROLES)]
            tool = _TOOLS[ti % len(_TOOLS)] if role == "tool" else None
            kind = rng.random()
            if kind < 0.08:
                text = rng.choice(_TRAPS)
            elif kind < 0.12:
                # whitespace-only / empty turns (skip rule)
                text = rng.choice(["", "   ", "\t \n"])
            elif kind < 0.35:
                text = rng.choice(_FILLERS)
            else:
                tmpl = rng.choice(_TEMPLATES)
                e0 = rng.choice(surfaces)
                e1 = rng.choice(surfaces)
                # mangle case sometimes — matching is case-insensitive
                if rng.random() < 0.3:
                    e0 = e0.upper()
                if rng.random() < 0.3:
                    e1 = e1.lower()
                text = tmpl.format(E0=e0, E1=e1)
                # occasionally append a drift-inducing tail: double space
                # after the period is NOT counted by the reference's
                # chunk-offset arithmetic (ner_prompt_based.py:128)
                if rng.random() < 0.25:
                    text += "  extra context: " + rng.choice(surfaces) + "."
            ts = _BASE_TS + timedelta(hours=ci, seconds=ti)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                }
            )

    rng.shuffle(rows)
    return rows


def _conv_rows(ci: int, n_convs: int, mean_turns: int, seed: int) -> list[dict]:
    """Rows of ONE conversation from a per-conversation RNG.

    Content depends only on (ci, n_convs, mean_turns, seed) — never on
    which executor/partition generates it — so the distributed generator
    below is deterministic under any partitioning.  Same template/trap/
    filler mix as gen_transcripts, but an independent RNG stream per
    conversation instead of one sequential driver-side stream."""
    rng = random.Random((seed << 24) ^ ci)
    surfaces = [e for e, _ in DEFAULT_GAZETTEER]
    conv_id = f"conv-{ci:06d}"
    base = mean_turns * (n_convs / (ci + 1)) ** (1.0 / 1.3) / 2.0
    n_turns = min(max(1, int(base * (0.5 + rng.random()))), mean_turns * 12)
    rows: list[dict] = []
    for ti in range(n_turns):
        role = _ROLES[(ci + ti) % len(_ROLES)]
        tool = _TOOLS[ti % len(_TOOLS)] if role == "tool" else None
        kind = rng.random()
        if kind < 0.08:
            text = rng.choice(_TRAPS)
        elif kind < 0.12:
            text = rng.choice(["", "   ", "\t \n"])
        elif kind < 0.35:
            text = rng.choice(_FILLERS)
        else:
            tmpl = rng.choice(_TEMPLATES)
            e0 = rng.choice(surfaces)
            e1 = rng.choice(surfaces)
            if rng.random() < 0.3:
                e0 = e0.upper()
            if rng.random() < 0.3:
                e1 = e1.lower()
            text = tmpl.format(E0=e0, E1=e1)
            if rng.random() < 0.25:
                text += "  extra context: " + rng.choice(surfaces) + "."
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": ti,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": _BASE_TS + timedelta(hours=ci, seconds=ti),
            }
        )
    rng.shuffle(rows)  # within-conv arrival order is scrambled (stable-ordering windows are exercised)
    return rows


_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def transcripts_spark(
    spark,
    n_convs: int,
    mean_turns: int = 10,
    seed: int = 7,
    partitions: int | None = None,
):
    """Distributed deterministic transcript synthesis (executor-side).

    The driver-side generator above tops out around a few million turns
    (single-threaded Python loop + one pandas frame in driver memory);
    this one generates each conversation inside mapInPandas from a
    spark.range of conversation indices, so fixture size is bounded by
    cluster capacity, not driver memory — the sandbox stand-in for
    pointing the pipeline at a 10^12-turn Iceberg table.  Deterministic
    for (n_convs, mean_turns, seed) under ANY partitioning because each
    conversation's RNG is keyed on its index alone."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for ci in pdf["id"]:
                rows.extend(_conv_rows(int(ci), n_convs, mean_turns, seed))
            out = pd.DataFrame(rows, columns=_COLUMNS)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    # round-robin repartition spreads the Zipf head (low ci = long convs)
    # across partitions instead of landing ranks 1..k in one range chunk
    return spark.range(n_convs).repartition(parts).mapInPandas(gen, schema)


def transcripts_pandas(n_convs: int = 50, mean_turns: int = 10, seed: int = 7) -> pd.DataFrame:
    rows = gen_transcripts(n_convs, mean_turns, seed)
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def write_transcripts_parquet(
    path: str, n_convs: int = 50, mean_turns: int = 10, seed: int = 7
) -> int:
    """Materialize the fixture as parquet (for bench / spark.read)."""
    df = transcripts_pandas(n_convs, mean_turns, seed)
    df.to_parquet(path, index=False)
    return len(df)
