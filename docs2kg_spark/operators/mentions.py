"""Mention extraction: segments → mentions, one Arrow-batched pass.

Replaces the reference's two per-element extraction loops — the spaCy
gazetteer matcher (ner_spacy_match.py:84-157, plus one synchronous LLM
judge HTTP call *per candidate mention*, :132-136) and the LLM prompt
extractor (ner_prompt_based.py:38-133, one HTTP call *per sentence
chunk*) — with a single vectorized pandas UDF that runs both methods and
the (start,end,text,label) first-wins dedup (semantic_kg/base.py:107-121)
inside the batch.

Scale design:
- ONE narrow pass over segments: no shuffle at all for this stage (the
  dedup key is intra-segment, so dedup happens inside the UDF);
- gazetteer is shipped once per executor via a Spark broadcast and the
  token-indexed matcher is compiled once per Python worker (module-level
  cache) — not per batch, not per row;
- Arrow batch transfer (spark.sql.execution.arrow.maxRecordsPerBatch)
  amortizes the Python boundary; inside the batch the matcher is a
  first-token hash index, O(tokens · patterns-per-first-token), not the
  reference's accidental O(matches · |patterns|) linear probe
  (ner_spacy_match.py:122-125).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from docs2kg_spark.config import PipelineConfig

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")

MENTION_STRUCT = T.StructType(
    [
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("method", T.StringType()),
    ]
)
MENTION_ARRAY = T.ArrayType(MENTION_STRUCT)

TRIPLE_STRUCT = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("subj_label", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("obj_label", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)
EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("mentions", MENTION_ARRAY),
        T.StructField("triples", T.ArrayType(TRIPLE_STRUCT)),
    ]
)

# compiled matcher index, one per (gazetteer hash) per Python worker
_INDEX_CACHE: dict = {}
# pre-lowered + type-filtered LLM-path entries, per (gazetteer, types)
_LLM_CACHE: dict = {}

# Above this many gazetteer entries the vocab-size-DEPENDENT structures
# flip to vocab-size-INDEPENDENT ones (VERDICT r3 item 8 — throughput
# must not collapse at a realistic 100k-surface gazetteer):
# - the candidate alternation regex (O(|vocab|) compile, and Python re
#   tries alternatives sequentially per position) is skipped;
# - the tokenization-free fast matcher (first-token alternation regex,
#   same problem) yields to the legacy token-scan path, whose dict
#   probe is O(tokens) regardless of vocabulary size;
# - the LLM-path per-surface substring presence scan (O(|vocab|·|text|)
#   per segment — the real killer) becomes ONE Aho-Corasick pass over
#   the text (O(|text|) amortized), built once per worker and cached.
# Output is bit-identical across the routes (parity fuzz-tested); the
# threshold only moves work between algorithms with the same semantics.
_LARGE_VOCAB = 2048


class _ACAutomaton:
    """Aho-Corasick multi-pattern substring search (classic goto/fail
    construction — Aho & Corasick, CACM 1975).  Used only to compute,
    per text, WHICH surfaces occur as substrings (the LLM-path presence
    prefilter); offsets stay with the per-chunk find, which is bounded
    by actual occurrences once the prefilter is exact."""

    __slots__ = ("goto", "fail", "out")

    def __init__(self, patterns):
        from collections import deque

        goto: list[dict] = [{}]
        out: list[tuple] = [()]
        for pat in patterns:
            node = 0
            for ch in pat:
                nxt = goto[node].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append(())
                    nxt = len(goto) - 1
                    goto[node][ch] = nxt
                node = nxt
            out[node] = out[node] + (pat,)
        fail = [0] * len(goto)
        q = deque(goto[0].values())
        while q:
            u = q.popleft()
            for ch, v in goto[u].items():
                q.append(v)
                f = fail[u]
                while f and ch not in goto[f]:
                    f = fail[f]
                w = goto[f].get(ch, 0)
                fail[v] = w if w != v else 0
                if out[fail[v]]:
                    out[v] = out[v] + out[fail[v]]
        self.goto, self.fail, self.out = goto, fail, out

    def found(self, text: str) -> set:
        """set of patterns occurring in text (each reported once)."""
        goto, fail, out = self.goto, self.fail, self.out
        node = 0
        res: set = set()
        for ch in text:
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                res.update(out[node])
        return res


def _build_index(gazetteer):
    """first token → [(pattern token tuple, entity_lower, entity_type)]"""
    index: dict[str, list] = {}
    for entity, etype in gazetteer:
        entity_lower = entity.lower()
        pattern = tuple(entity_lower.split())
        if not pattern:
            continue
        index.setdefault(pattern[0], []).append((pattern, entity_lower, etype))
    return index


_WORD_RE = re.compile(r"\w+\Z")


def _build_fast_matcher(gazetteer):
    """Tokenization-free gazetteer matcher (the hot path of the
    extraction UDF — full \\w+ tokenization of every candidate text was
    ~70%% of kernel time; matches are sparse, so locating them directly
    is O(matches), not O(text)).

    Exact-equivalence argument vs the token-scan matcher (_extract_one's
    legacy path), per the reference tokenizer \\w+|[^\\w\\s]:
    - a pattern token that is pure \\w+ equals a text token iff it
      appears in the text delimited by non-\\w chars → locate first
      tokens with one guarded alternation `(?<!\\w)(?:t1|..)(?!\\w)`
      (whole-token occurrences are non-overlapping, so finditer finds
      every one), then probe every pattern sharing that first token;
    - consecutive \\w+ tokens in the token stream are separated by
      whitespace ONLY (any punctuation in between would itself be a
      token), so the continuation regex is `\\s+tok2...\\s+tokN(?!\\w)`;
    - a pattern token mixing \\w and punctuation (e.g. "px-7",
      "acme,") can never equal any single text token, so the token path
      can never match that entity — it is dropped here, identical to
      the legacy path where its index bucket key never equals a token;
    - a single-punctuation pattern token CAN match (any lone
      non-word-non-space char is a token) — that shape isn't encoded
      here, so its presence disables the fast path entirely
      (fast_ok=False → legacy tokenizing path, same output).

    Returns (fast_ok, first_rx|None,
             {first_tok: [(cont_rx|None, entity_lower, etype, gaz_idx)]}).
    """
    probe: dict[str, list] = {}
    firsts: set[str] = set()
    for gaz_idx, (entity, etype) in enumerate(gazetteer):
        entity_lower = entity.lower()
        pattern = tuple(entity_lower.split())
        if not pattern:
            continue
        kinds = [("w" if _WORD_RE.match(t) else ("p" if len(t) == 1 else "x")) for t in pattern]
        if "p" in kinds:
            return False, None, {}  # lone-punct token → legacy path
        if "x" in kinds:
            continue  # mixed token → unmatchable via token path, skip
        cont_rx = (
            re.compile(r"\s+" + r"\s+".join(re.escape(t) for t in pattern[1:]) + r"(?!\w)")
            if len(pattern) > 1
            else None
        )
        probe.setdefault(pattern[0], []).append((cont_rx, entity_lower, etype, gaz_idx))
        firsts.add(pattern[0])
    if not firsts:
        return True, None, probe
    alts = "|".join(re.escape(t) for t in sorted(firsts, key=len, reverse=True))
    return True, re.compile(r"(?<!\w)(?:" + alts + r")(?!\w)"), probe


# per-char classes matching the tokenizer's \w / \s exactly (str.isalnum
# and str.isspace disagree with the re classes on edge codepoints)
_W1 = re.compile(r"\w")
_S1 = re.compile(r"\s")


def _prev_token_isalpha(lowered, pos):
    """isalpha() of the token immediately before char offset pos (the
    reference boundary rule, ner_spacy_match.py:159-178) without
    tokenizing: skip whitespace back; a punct char is its own token
    (never alpha); a \\w char belongs to a maximal \\w+ run — scan it."""
    i = pos - 1
    while i >= 0 and _S1.match(lowered[i]):
        i -= 1
    if i < 0:
        return False
    if not _W1.match(lowered[i]):
        return False  # single-punct token
    j = i
    while j >= 0 and _W1.match(lowered[j]):
        j -= 1
    return lowered[j + 1 : i + 1].isalpha()


def _next_token_isalpha(lowered, pos):
    n = len(lowered)
    i = pos
    while i < n and _S1.match(lowered[i]):
        i += 1
    if i >= n:
        return False
    if not _W1.match(lowered[i]):
        return False
    j = i
    while j < n and _W1.match(lowered[j]):
        j += 1
    return lowered[i:j].isalpha()


def _build_candidate_rx(gazetteer):
    """One alternation regex that any matchable segment MUST satisfy —
    a cheap short-circuit before tokenization.  Superset argument: the
    LLM path needs the exact lowercase surface as a substring; the token
    path needs the pattern's word tokens consecutive, which (with a
    maximal-munch tokenizer) means separated by whitespace only — both
    are matched by the surface with spaces relaxed to \\s+."""
    parts = [re.escape(e.lower()).replace(r"\ ", r"\s+") for e, _ in gazetteer]
    return re.compile("|".join(sorted(parts, key=len, reverse=True)))


def _get_index(gazetteer):
    key = hash(gazetteer)
    cached = _INDEX_CACHE.get(key)
    if cached is None:
        if len(gazetteer) >= _LARGE_VOCAB:
            # large-vocab route: no candidate alternation regex (None →
            # the short-circuit is skipped), no first-token alternation
            # (fast_ok False → legacy token-scan path, O(tokens) dict
            # probes) — both structures are O(|vocab|) per *position*
            # under Python re and collapse at 100k surfaces.
            cached = (_build_index(gazetteer), None, (False, None, {}))
        else:
            cached = (
                _build_index(gazetteer),
                _build_candidate_rx(gazetteer),
                _build_fast_matcher(gazetteer),
            )
        _INDEX_CACHE[key] = cached
    return cached


def _get_llm_entries(gazetteer, entity_types):
    """LLM-path scan list, precomputed once per worker: gazetteer order
    preserved (first-wins dedup depends on emission order), surfaces
    pre-lowered, rows whose type the ontology rejects dropped up front
    (ner_prompt_based.py:150-155 drops them after extraction; dropping
    before is output-identical and skips the scan), plus a has-dot flag
    for the chunk-boundary caveat in _extract_one."""
    key = (hash(gazetteer), entity_types)
    cached = _LLM_CACHE.get(key)
    if cached is None:
        etypes = set(entity_types)
        entries = tuple(
            (e.lower(), t, "." in e) for e, t in gazetteer if t in etypes
        )
        # large-vocab route: ONE Aho-Corasick pass over the text replaces
        # the per-surface C substring scans (identical result set — AC
        # reports exactly the surfaces that are substrings); dotted
        # surfaces keep bypassing the prefilter either way (they can
        # span the appended chunk ".").  Built once per worker, cached.
        ac = (
            _ACAutomaton(sorted({e for e, _, dot in entries if not dot}))
            if len(entries) >= _LARGE_VOCAB
            else None
        )
        cached = (entries, ac)
        _LLM_CACHE[key] = cached
    return cached


def _extract_one(text, llm_pack, index_and_rx, min_judge_len):
    """Both extraction methods + dedup for one segment text.  Semantics
    mirror oracle/reference.py (which mirrors the reference, SURVEY §1.4)."""
    if not text:
        return []
    llm_entries, llm_ac = llm_pack
    index, candidate_rx, (fast_ok, first_rx, probe) = index_and_rx
    lowered = text.lower()
    # short-circuit: no surface can match at all → skip tokenization
    # (small-vocab route only; the large-vocab route has no alternation
    # regex — its presence test is the Aho-Corasick pass below)
    if candidate_rx is not None and candidate_rx.search(lowered) is None:
        return []
    results = []

    # --- gazetteer token-sequence match (ner_spacy_match.py:84-157) ---
    if fast_ok:
        # tokenization-free path (see _build_fast_matcher): locate
        # whole-token occurrences of any pattern's first token, probe
        # continuations, verify the boundary rule by local char scans.
        hits = []
        if first_rx is not None:
            for m in first_rx.finditer(lowered):
                ts, te = m.start(), m.end()
                for cont_rx, entity_lower, etype, gaz_idx in probe[m.group()]:
                    if cont_rx is None:
                        end = te
                    else:
                        cm = cont_rx.match(lowered, te)
                        if cm is None:
                            continue
                        end = cm.end()
                    # boundary rule (ner_spacy_match.py:159-178)
                    if _prev_token_isalpha(lowered, ts) or _next_token_isalpha(lowered, end):
                        continue
                    matched = lowered[ts:end]
                    if len(matched) < min_judge_len:  # judge stand-in
                        continue
                    conf = 0.95 if matched == entity_lower else 0.9
                    hits.append((ts, gaz_idx, end, matched, etype, conf))
        # (start, gazetteer order) reproduces the legacy emission order:
        # ties at one start are one first token, probed in gazetteer order
        hits.sort()
        results.extend((h[0], h[2], h[3], h[4], h[5], "gazetteer") for h in hits)
    else:
        toks = [(m.group(), m.start(), m.end()) for m in _TOKEN_RE.finditer(lowered)]
        tok_texts = [t[0] for t in toks]
        n_toks = len(toks)
        for i, tok in enumerate(tok_texts):
            for pattern, entity_lower, etype in index.get(tok, ()):
                n = len(pattern)
                if i + n > n_toks or tuple(tok_texts[i : i + n]) != pattern:
                    continue
                # boundary rule (ner_spacy_match.py:159-178)
                if i > 0 and tok_texts[i - 1].isalpha():
                    continue
                if i + n < n_toks and tok_texts[i + n].isalpha():
                    continue
                start, end = toks[i][1], toks[i + n - 1][2]
                matched = lowered[start:end]
                if len(matched) < min_judge_len:  # judge stand-in
                    continue
                conf = 0.95 if matched == entity_lower else 0.9
                results.append((start, end, matched, etype, conf, "gazetteer"))
        results.sort(key=lambda r: r[0])

    # --- LLM-standin chunked substring extraction -----------------------
    # (ner_prompt_based.py:60-62,128,150-155,201-206 — offset drift kept)
    # Per-TEXT presence prefilter before the per-chunk scans: a chunk is
    # a stripped substring of the text plus an appended "." — a surface
    # without "." can occur in a chunk only if it occurs in the lowered
    # text, so the presence prefilter bounds the chunk loop to surfaces
    # actually present (dotted surfaces could span the appended "." and
    # bypass the filter).  Small vocab: one C-level substring scan per
    # surface.  Large vocab (llm_ac set): ONE Aho-Corasick pass over the
    # text — O(|text|), vocabulary-size-independent — yielding the exact
    # same present-set; entry order is preserved either way because
    # first-wins dedup depends on emission order.
    if llm_ac is not None:
        in_text = llm_ac.found(lowered)
        present = [st for st in llm_entries if st[2] or st[0] in in_text]
    else:
        present = [st for st in llm_entries if st[2] or st[0] in lowered]
    if present:
        pos = 0
        for c in text.split("."):
            c = c.strip()
            if not c:
                continue
            chunk = c + "."
            chunk_lower = chunk.lower()
            for surface, etype, _ in present:
                start = chunk_lower.find(surface)
                if start == -1:
                    continue
                results.append((start + pos, start + pos + len(surface), surface, etype, 1.0, "llm_standin"))
            pos += len(chunk)

    # --- first-wins dedup on (start,end,text,label) ----------------------
    seen = set()
    out = []
    for r in results:
        key = (r[0], r[1], r[2], r[3])
        if key not in seen:
            seen.add(key)
            out.append(r)
    return out


def _triples_of(mentions, pred_map):
    """Per-segment co-occurrence triples from the deduped mention list —
    identical semantics to operators/relations.py::cooccurrence_triples
    (ordered pairs, RELATES_TO fallback, first-pair-wins per
    (subj,pred,obj)), fused into the extraction pass so the pipeline
    needs NO shuffle for relation emission.  mentions rows are
    (start, end, text, label, confidence, method)."""
    ms = sorted(mentions, key=lambda m: (m[0], m[1], m[2], m[3]))
    seen = set()
    out = []
    for i in range(len(ms)):
        a = ms[i]
        for j in range(i + 1, len(ms)):
            b = ms[j]
            if a[2] == b[2] and a[3] == b[3]:
                continue
            pred = pred_map.get((a[3], b[3]), "RELATES_TO")
            key = (a[2], pred, b[2])
            if key in seen:
                continue
            seen.add(key)
            out.append((a[2], a[3], pred, b[2], b[3], min(a[4], b[4])))
    return out


def make_extract_udf(spark: SparkSession, cfg: PipelineConfig):
    """Fused extraction: one Arrow pass per segment emitting BOTH the
    deduped mentions and the co-occurrence triples (see _triples_of)."""
    pred_map = {(s, d): rel for rel, s, d in cfg.ontology.connections}
    payload = (tuple(cfg.gazetteer), tuple(cfg.ontology.entity_types), cfg.min_judge_len, tuple(sorted(pred_map.items())))
    bc = spark.sparkContext.broadcast(payload)

    @pandas_udf(EXTRACT_SCHEMA)
    def extract(texts: pd.Series) -> pd.DataFrame:
        gazetteer, entity_types, min_judge_len, pred_items = bc.value
        pmap = dict(pred_items)
        index = _get_index(gazetteer)
        llm_entries = _get_llm_entries(gazetteer, entity_types)
        mentions_col, triples_col = [], []
        for t in texts:
            ms = _extract_one(t, llm_entries, index, min_judge_len)
            mentions_col.append(ms)
            triples_col.append(_triples_of(ms, pmap))
        return pd.DataFrame({"mentions": mentions_col, "triples": triples_col})

    return extract


def make_extract_mentions_udf(spark: SparkSession, cfg: PipelineConfig):
    payload = (tuple(cfg.gazetteer), tuple(cfg.ontology.entity_types), cfg.min_judge_len)
    bc = spark.sparkContext.broadcast(payload)

    @pandas_udf(MENTION_ARRAY)
    def extract_mentions(texts: pd.Series) -> pd.Series:
        gazetteer, entity_types, min_judge_len = bc.value
        index = _get_index(gazetteer)
        llm_entries = _get_llm_entries(gazetteer, entity_types)
        return pd.Series(
            [_extract_one(t, llm_entries, index, min_judge_len) for t in texts]
        )

    return extract_mentions


def extract_fused(
    segments: DataFrame, spark: SparkSession, cfg: PipelineConfig | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One fused pass → (enriched, mentions, triples).  Persist the
    enriched parent before consuming mentions AND triples so the UDF
    runs once (the pipeline caches it across the two writes)."""
    cfg = cfg or PipelineConfig()
    udf = make_extract_udf(spark, cfg)
    enriched = segments.select("conv_id", "seg_id", udf(F.col("text")).alias("ext"))
    # explode_outer + null-filter instead of explode: plain explode makes
    # Catalyst insert a size()>0 pre-filter on the generator input, which
    # re-evaluates the UDF — 2x the extraction cost (verified with
    # .explain("formatted"): 2 ArrowEvalPython nodes vs 1)
    mentions = enriched.select(
        "conv_id", "seg_id", F.explode_outer("ext.mentions").alias("m")
    ).filter(F.col("m").isNotNull()).select(
        "conv_id",
        "seg_id",
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
        F.col("m.text").alias("text"),
        F.col("m.label").alias("label"),
        F.col("m.confidence").alias("confidence"),
        F.col("m.method").alias("method"),
    )
    triples = enriched.select(
        "conv_id", "seg_id", F.explode_outer("ext.triples").alias("t")
    ).filter(F.col("t").isNotNull()).select(
        "conv_id",
        "seg_id",
        F.col("t.subj").alias("subj"),
        F.col("t.subj_label").alias("subj_label"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
        F.col("t.obj_label").alias("obj_label"),
        F.col("t.confidence").alias("confidence"),
    )
    return enriched, mentions, triples


def extract_mentions(segments: DataFrame, spark: SparkSession, cfg: PipelineConfig | None = None) -> DataFrame:
    """segments → mentions(conv_id, seg_id, start, end, text, label,
    confidence, method).  Narrow (shuffle-free) transformation."""
    cfg = cfg or PipelineConfig()
    udf = make_extract_mentions_udf(spark, cfg)
    return (
        segments.select("conv_id", "seg_id", F.explode_outer(udf(F.col("text"))).alias("m"))
        .filter(F.col("m").isNotNull())
        .select(
            "conv_id",
            "seg_id",
            F.col("m.start").alias("start"),
            F.col("m.end").alias("end"),
            F.col("m.text").alias("text"),
            F.col("m.label").alias("label"),
            F.col("m.confidence").alias("confidence"),
            F.col("m.method").alias("method"),
        )
    )
