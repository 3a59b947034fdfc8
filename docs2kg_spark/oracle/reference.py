"""Reference-faithful single-node Python oracle (no Spark).

Reimplements, row-at-a-time and in reading order, exactly what the
reference pipeline computes (SURVEY.md §1.4 invariants), so the Spark
engine can be P/R-scored against it:

- segmentation with the empty-text skip rule (layout_kg.py:34-36) and
  sequence numbering (neo4j_loader.py:315-321);
- gazetteer matching: lowercase the whole text (ner_spacy_match.py:105),
  token-sequence match of lowercased entity tokens
  (ner_spacy_match.py:51-82,107-114), word-boundary validation — drop a
  match if the token before `start` or the token at `end` is alphabetic
  (ner_spacy_match.py:159-178), confidence 0.95/0.9
  (ner_spacy_match.py:144-148), judge filter (stand-in for the
  per-mention LLM call at ner_spacy_match.py:132-136);
- LLM-prompt extraction stand-in: "."-chunking with strip+"." re-suffix
  (ner_prompt_based.py:60-62), offset accumulation that counts only
  len(chunk) — the whitespace-drift bug reproduced, not fixed
  (ner_prompt_based.py:128), first-occurrence location via find
  (ner_prompt_based.py:201-206), label-allowlist filter
  (ner_prompt_based.py:150-155);
- mention dedup on key (start, end, text, label) keeping first
  (semantic_kg/base.py:107-121);
- co-occurrence triple emission with ontology predicate assignment and
  RELATES_TO fallback (relation shape consumed at neo4j_loader.py:390-409);
- entity canonicalization: exact key (text, label) groups
  (neo4j_loader.py:156-166) extended with near-duplicate linking
  (character-shingle Jaccard >= threshold, same label) resolved by
  union-find with min-id survivor — the deterministic replacement for
  Cypher's arbitrary-first survivor (neo4j_loader.py:171-174).

The oracle is deliberately written in the reference's per-document,
per-element style so it is an *independent* implementation from the
vectorized Spark operators it validates.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict
from dataclasses import dataclass

from docs2kg_spark.config import DEFAULT_GAZETTEER, DEFAULT_ONTOLOGY, MIN_JUDGE_LEN, Ontology

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")

# role → segment label (the transcript analog of the tag→label map at
# layout_kg.py:42-66: system turns act as section headers, tool turns as
# code blocks)
ROLE_LABEL = {"system": "H1", "user": "P", "assistant": "P", "tool": "CODE"}


def det_id(*parts) -> str:
    """Deterministic content-addressed id — replaces the reference's
    uuid4/salted-hash ids (layout_kg.py:39, ner_spacy_match.py:139,
    ner_prompt_based.py:162-164), which break resume and comparison.
    128-bit (32 hex chars), matching functions/ids.py::det_id_col."""
    return hashlib.sha256(
        "|".join("" if p is None else str(p) for p in parts).encode("utf-8")
    ).hexdigest()[:32]


def tokenize(text: str) -> list[tuple[str, int, int]]:
    """Word/punct tokens with char offsets (spaCy-tokenizer stand-in;
    both the oracle and the Spark UDF must use this same definition)."""
    return [(m.group(), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def judge_ok(surface: str, min_len: int = MIN_JUDGE_LEN) -> bool:
    """Deterministic LLM-judge stand-in (replaces the HTTP round-trip at
    ner_spacy_match.py:132-136): reject surfaces shorter than min_len."""
    return len(surface) >= min_len


@dataclass
class Mention:
    start: int
    end: int
    text: str
    label: str
    confidence: float
    method: str


def match_gazetteer(text: str, gazetteer=DEFAULT_GAZETTEER, min_judge_len: int = MIN_JUDGE_LEN) -> list[Mention]:
    """Token-sequence gazetteer matching (reference extract_entities,
    ner_spacy_match.py:84-157)."""
    if not text or not gazetteer:
        return []
    lowered = text.lower()
    toks = tokenize(lowered)
    tok_texts = [t[0] for t in toks]
    results: list[Mention] = []
    for entity, etype in gazetteer:
        pattern = entity.lower().split()
        n = len(pattern)
        if n == 0:
            continue
        for i in range(len(toks) - n + 1):
            if tok_texts[i : i + n] != pattern:
                continue
            # word-boundary validation (ner_spacy_match.py:159-178)
            if i > 0 and tok_texts[i - 1].isalpha():
                continue
            j = i + n
            if j < len(toks) and tok_texts[j].isalpha():
                continue
            start, end = toks[i][1], toks[i + n - 1][2]
            matched_text = lowered[start:end]
            # judge stand-in sits where the LLM judge sat
            if not judge_ok(matched_text, min_judge_len):
                continue
            conf = 0.95 if matched_text == entity.lower() else 0.9
            results.append(Mention(start, end, matched_text, etype, conf, "gazetteer"))
    results.sort(key=lambda m: m.start)
    return results


def llm_standin_extract(
    text: str,
    gazetteer=DEFAULT_GAZETTEER,
    entity_types: tuple[str, ...] | None = None,
) -> list[Mention]:
    """Deterministic stand-in for the LLM prompt extractor
    (ner_prompt_based.py:38-133).  The "LLM" proposes every gazetteer
    surface present as a lowercase substring of the chunk; verification
    then reproduces the reference's allowlist filter and
    first-occurrence offset arithmetic, including the whitespace drift."""
    if not text:
        return []
    if entity_types is None:
        entity_types = DEFAULT_ONTOLOGY.entity_types
    chunks = [c.strip() + "." for c in text.split(".") if c.strip()]
    all_entities: list[Mention] = []
    current_position = 0
    for chunk in chunks:
        chunk_lower = chunk.lower()
        for entity, etype in gazetteer:
            surface = entity.lower()
            if surface not in chunk_lower:
                continue
            if etype not in entity_types:  # allowlist (ner_prompt_based.py:150-155)
                continue
            start = chunk_lower.find(surface)  # first occurrence only
            end = start + len(surface)
            all_entities.append(
                Mention(start + current_position, end + current_position, surface, etype, 1.0, "llm_standin")
            )
        current_position += len(chunk)  # drift reproduced (ner_prompt_based.py:128)
    return all_entities


def unique_mentions(mentions: list[Mention]) -> list[Mention]:
    """First-wins dedup on (start, end, text, label)
    (semantic_kg/base.py:107-121)."""
    seen = set()
    out = []
    for m in mentions:
        key = (m.start, m.end, m.text, m.label)
        if key not in seen:
            seen.add(key)
            out.append(m)
    return out


def extract_segment_mentions(text: str, gazetteer=DEFAULT_GAZETTEER, ontology: Ontology = DEFAULT_ONTOLOGY):
    """Full per-segment mention set: gazetteer pass then LLM-standin pass
    then dedup — the stage order of cli.py:103-110."""
    mentions = match_gazetteer(text, gazetteer)
    mentions.extend(llm_standin_extract(text, gazetteer, ontology.entity_types))
    return unique_mentions(mentions)


def cooccurrence_triples(mentions: list[Mention], ontology: Ontology = DEFAULT_ONTOLOGY):
    """All ordered mention pairs (by start, end, text, label) within one
    segment → (subj, pred, obj) with ontology predicate, RELATES_TO
    fallback (default at neo4j_loader.py:394); distinct per segment."""
    ms = sorted(mentions, key=lambda m: (m.start, m.end, m.text, m.label))
    seen = set()
    triples = []
    for i in range(len(ms)):
        for j in range(i + 1, len(ms)):
            a, b = ms[i], ms[j]
            if a.text == b.text and a.label == b.label:
                continue
            pred = ontology.predicate_for(a.label, b.label)
            key = (a.text, pred, b.text)
            if key in seen:
                continue
            seen.add(key)
            triples.append(
                {
                    "subj": a.text,
                    "pred": pred,
                    "obj": b.text,
                    "confidence": min(a.confidence, b.confidence),
                }
            )
    return triples


def shingles(text: str, k: int = 3) -> set:
    s = text.lower()
    if len(s) <= k:
        return {s}
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


class ReferenceOracle:
    """Runs the whole reference pipeline over transcript rows."""

    def __init__(self, gazetteer=DEFAULT_GAZETTEER, ontology: Ontology = DEFAULT_ONTOLOGY,
                 shingle_k: int = 3, jaccard_threshold: float = 0.45):
        self.gazetteer = gazetteer
        self.ontology = ontology
        self.shingle_k = shingle_k
        self.jaccard_threshold = jaccard_threshold

    # --- segmentation -------------------------------------------------
    def segments(self, rows: list[dict]) -> list[dict]:
        """rows: transcript dicts (any order) → segments, stable-ordered
        per conv by turn_idx, empty turns skipped."""
        by_conv = defaultdict(list)
        for r in rows:
            by_conv[r["conv_id"]].append(r)
        segs = []
        for conv_id in sorted(by_conv):
            turns = sorted(by_conv[conv_id], key=lambda r: r["turn_idx"])
            seg_idx = 0
            for t in turns:
                text = t["text"] or ""
                if not text.strip():  # skip rule (layout_kg.py:34-36)
                    continue
                segs.append(
                    {
                        "conv_id": conv_id,
                        "seg_id": det_id(conv_id, t["turn_idx"], text),
                        "seg_idx": seg_idx,
                        "turn_idx": t["turn_idx"],
                        "label": ROLE_LABEL.get(t["role"], "P"),
                        "role": t["role"],
                        "tool": t.get("tool"),
                        "text": text,
                    }
                )
                seg_idx += 1
        return segs

    # --- mentions ------------------------------------------------------
    def mentions(self, segments: list[dict]) -> list[dict]:
        out = []
        for seg in segments:
            for m in extract_segment_mentions(seg["text"], self.gazetteer, self.ontology):
                out.append(
                    {
                        "conv_id": seg["conv_id"],
                        "seg_id": seg["seg_id"],
                        "start": m.start,
                        "end": m.end,
                        "text": m.text,
                        "label": m.label,
                        "confidence": m.confidence,
                        "method": m.method,
                    }
                )
        return out

    # --- triples --------------------------------------------------------
    def triples(self, segments: list[dict]) -> list[dict]:
        out = []
        for seg in segments:
            ms = extract_segment_mentions(seg["text"], self.gazetteer, self.ontology)
            for t in cooccurrence_triples(ms, self.ontology):
                out.append({"conv_id": seg["conv_id"], "seg_id": seg["seg_id"], **t})
        return out

    # --- canonicalization -------------------------------------------------
    def canonical_groups(self, mention_rows: list[dict]) -> dict[str, str]:
        """(text,label) entity nodes → canonical_id via exact key + near-dup
        Jaccard linking + union-find with min-id survivor.  Returns
        node_id → canonical_id."""
        nodes = sorted({(m["text"], m["label"]) for m in mention_rows})
        ids = [det_id("entity", t, lbl) for t, lbl in nodes]
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

        sh = [shingles(t, self.shingle_k) for t, _ in nodes]
        for i in range(len(nodes)):
            for j in range(i + 1, len(nodes)):
                if nodes[i][1] != nodes[j][1]:
                    continue  # same-label linking only
                if jaccard(sh[i], sh[j]) >= self.jaccard_threshold:
                    union(ids[i], ids[j])
        return {i: find(i) for i in ids}

    # --- end-to-end ----------------------------------------------------
    def run(self, rows: list[dict]):
        segs = self.segments(rows)
        mentions = self.mentions(segs)
        triples = self.triples(segs)
        canon = self.canonical_groups(mentions)
        return {"segments": segs, "mentions": mentions, "triples": triples, "canonical": canon}
