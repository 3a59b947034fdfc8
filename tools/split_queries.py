"""One-shot splitter: docs2kg_spark/queries.py (14.8k lines) →
docs2kg_spark/queries/ package of per-family modules behind the same
SPARK_QUERIES/ORACLE_SQL registry and import surface (round-4 verdict
item 6).

Mechanics: segment the monolith at top-level AST nodes (each segment's
source includes the comment/blank lines that precede it), classify each
named segment into a family, verify the inter-family reference graph is
acyclic under the fixed module order, then emit one module per family
with machine-generated explicit cross-imports (explicit, not star, so
underscore helpers resolve).  SQL twins stick with the query that
precedes them in the original file.
"""
import ast
import json
import os
import sys
from collections import defaultdict

SRC = "docs2kg_spark/queries.py"
PKG = "docs2kg_spark/queries"

MODULE_ORDER = [
    "_shared", "tpch", "text", "kg", "graph", "dedup",
    "embed", "events", "docs", "conv", "registry",
]

SHARED = {
    "_t", "_SURFACES", "_N_INJECT", "_INJECT", "_INJECT_VALUES",
    "_ROLE_CASE_SQL", "TRANSCRIPTS_CTE", "derive_transcripts",
    "_KG_MEMO", "_kg_memo", "_kg_stack", "_entity_graph_prefix",
    "_POLARITY_LEXICON", "_SWEEP_T", "_MARKOV_ITERS",
    "_doc_dedup_map_memo", "_minhash_pairs_memo", "_logprob_memo",
    "_probe_docs", "_retrieval_legs", "_jaccard_leg_sql",
}

OVERRIDES = {
    "q_dup_quality_gap": "dedup", "_dup_quality_gap_sql": "dedup",
    "q_dup_lang_matrix": "dedup", "q_dup_cluster_purity": "dedup",
    "q_linking_method_venn": "kg", "q_label_position_profile": "kg",
    "_label_position_profile_sql": "kg",
    "q_session_stats": "events", "SQL_SESSION_STATS": "events",
    "_lineitem_graph": "graph", "_LINEITEM_GRAPH_CTE": "graph",
    "_METAPATH_MID_CAP": "kg",
}

MODULE_DOC = {
    "_shared": "Shared infrastructure: table loader, transcript derivation, the KG/dedup memo chain, and cross-family SQL/constant helpers.",
    "tpch": "Relational queries over the TPC-H-ish star schema (scans, joins, aggregates, windows, set ops, string/date functions).",
    "text": "Text-analysis queries: language ID, quality, tokens, vocabulary, LM scoring, collocations, BPE, corpus statistics.",
    "kg": "The KG construction chain (segments → mentions → triples → canonical map → nodes/edges) and KG read queries.",
    "graph": "Graph analytics over the entity graph: degrees, traversals, centralities, communities, structure audits.",
    "dedup": "Deduplication family: exact/MinHash/SimHash/n-gram/winnowing/PPJoin, span profiles, scrubbing, dedup audits.",
    "embed": "Embedding-space queries: ANN (brute/LSH/IVF), k-means, SemDeDup, quantization, JL, kNN purity, norms.",
    "events": "Event-stream analytics: sessions, funnels, Markov chains, anomaly audits, sketches (CMS/HLL/Bloom), retention.",
    "docs": "Document-corpus operations: splits, sampling, packing, contamination, PII, retrieval fusion, source mixes.",
    "conv": "Conversation/turn-level reads and multimodal asset decoding queries.",
    "registry": "The driver-contract registry: SPARK_QUERIES and ORACLE_SQL, assembled from every family module.",
}


def fam(name: str) -> str:
    if name in SHARED:
        return "_shared"
    if name in OVERRIDES:
        return OVERRIDES[name]
    if name in ("SPARK_QUERIES", "ORACLE_SQL"):
        return "registry"
    s = name.lower()

    def has(*pats):
        return any(p in s for p in pats)

    if has("kg_", "canonical", "mention", "triple", "ontolog", "metapath",
           "salience", "alias", "ego", "linking"):
        return "kg"
    if has("graph_", "pagerank", "centrality", "assortat", "kcore", "khop",
           "lpa", "sssp", "hits", "triangle", "jdd", "adamic", "reciproc",
           "wcc", "clustering", "degree", "linkpred", "tie_strength",
           "eccentr", "harmonic", "lineitem_graph", "blocking_suppliers"):
        return "graph"
    if has("dedup", "minhash", "simhash", "jaccard", "winnow", "ppjoin",
           "scrub", "dup_", "fingerprint", "lsh_band", "boilerplate",
           "exact_substr", "shingle", "turn_dedup"):
        return "dedup"
    if has("ann_", "embedding", "semdedup", "kmeans", "centroid", "pca",
           "jl_", "quantiz", "knn", "vec", "cosine", "int8", "_emb"):
        return "embed"
    if has("event", "sessionize", "session", "funnel", "markov", "benford",
           "burst", "winsor", "anomal", "autocorr", "attribution",
           "retention", "churn", "rfm", "gini", "asof", "hour", "rolling",
           "cms", "hll", "bloom", "sketch", "user_", "transition"):
        return "events"
    if has("lang", "token", "vocab", "zipf", "tfidf", "logprob", "perplex",
           "dsir", "bpe", "colloc", "rake", "kwic", "quality", "flesch",
           "hapax", "oov", "ttr", "entropy", "fertility", "stopword",
           "casing", "encoding", "markup", "numeric", "sentence", "readab",
           "polarity", "novelty", "repetition", "corpus", "lexicon",
           "line_stats", "word", "char"):
        return "text"
    if has("doc_", "document", "contamin", "pii", "split", "sampl", "pack",
           "chunk", "retriev", "rrf", "bm25", "mixture", "source", "length",
           "text"):
        return "docs"
    if has("conv_", "turn_", "role", "multimodal", "media", "jpeg", "gif",
           "wav", "png", "asset"):
        return "conv"
    return "tpch"


def main():
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    segs = []
    for n in tree.body:
        if isinstance(n, (ast.FunctionDef, ast.ClassDef)):
            segs.append({"names": [n.name], "kind": "def",
                         "a": n.lineno, "b": n.end_lineno, "node": n})
        elif isinstance(n, ast.Assign):
            names = []
            for t in n.targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
                elif isinstance(t, (ast.Tuple, ast.List)):
                    names += [e.id for e in t.elts if isinstance(e, ast.Name)]
            segs.append({"names": names, "kind": "assign",
                         "a": n.lineno, "b": n.end_lineno, "node": n})
        elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
            segs.append({"names": [n.target.id], "kind": "assign",
                         "a": n.lineno, "b": n.end_lineno, "node": n})
        elif isinstance(n, (ast.Import, ast.ImportFrom)):
            segs.append({"names": [], "kind": "import",
                         "a": n.lineno, "b": n.end_lineno, "node": n})
        else:
            segs.append({"names": [], "kind": "other",
                         "a": n.lineno, "b": n.end_lineno, "node": n})

    defined = {}
    for s in segs:
        for nm in s["names"]:
            defined[nm] = s

    # classify (SQL twins + private helpers follow the preceding query)
    assign = {}
    prev_fam = None
    for s in segs:
        if not s["names"]:
            continue
        nm = s["names"][0]
        f = fam(nm)
        if nm in SHARED or nm in OVERRIDES or nm in ("SPARK_QUERIES", "ORACLE_SQL"):
            pass  # explicit
        elif (nm.startswith("SQL_") or nm.startswith("_")) and prev_fam:
            f = prev_fam
        if not (nm.startswith("SQL_") or nm.startswith("_")) or nm in OVERRIDES:
            prev_fam = f
        for x in s["names"]:
            assign[x] = f
        s["fam"] = f

    # references per segment
    refs = defaultdict(set)
    for s in segs:
        if not s["names"]:
            continue
        own = set(s["names"])
        for sub in ast.walk(s["node"]):
            if isinstance(sub, ast.Name) and sub.id in defined and sub.id not in own:
                refs[s["names"][0]].add(sub.id)

    # cross-module edges + cycle check under MODULE_ORDER
    order_ix = {m: i for i, m in enumerate(MODULE_ORDER)}
    bad = []
    needs = defaultdict(lambda: defaultdict(set))  # module -> src module -> names
    for s in segs:
        if not s["names"]:
            continue
        f = s["fam"]
        for r in refs[s["names"][0]]:
            rf = assign[r]
            if rf != f:
                needs[f][rf].add(r)
                if order_ix[rf] > order_ix[f]:
                    bad.append((f, s["names"][0], rf, r))
    if bad:
        print("BACKWARD EDGES (module order violation):")
        for b in bad:
            print("  ", b)
        sys.exit(1)

    # header import block: contiguous leading imports of the original
    hdr_lines = []
    for s in segs:
        if s["kind"] == "import":
            hdr_lines.append("".join(lines[s["a"] - 1:s["b"]]))
    header = "".join(hdr_lines)

    # emit modules
    os.makedirs(PKG + "_new", exist_ok=True)
    per_mod_segs = defaultdict(list)
    prev_end = 0
    for s in segs:
        body = "".join(lines[prev_end:s["b"]])
        prev_end = s["b"]
        if s["kind"] in ("import", "other") or not s["names"]:
            continue  # header handled separately; module docstring too
        # strip leading newlines of the chunk but keep comments
        per_mod_segs[s["fam"]].append(body)

    counts = {}
    for mod in MODULE_ORDER:
        if mod not in per_mod_segs and mod not in needs:
            continue
        parts = [f'"""{MODULE_DOC[mod]}\n\nSplit from the original queries.py monolith (round-4 verdict item 6);\nsegment order preserved.  Registry: docs2kg_spark.queries (package\n__init__ re-exports every name, driver contract unchanged).\n"""\n']
        parts.append(header)
        for src_mod in MODULE_ORDER:
            names = sorted(needs[mod].get(src_mod, ()))
            if names:
                parts.append(
                    f"\nfrom docs2kg_spark.queries.{src_mod} import (\n    "
                    + ",\n    ".join(names) + ",\n)\n"
                )
        parts.append("\n")
        parts.extend(per_mod_segs[mod])
        out = "".join(parts)
        with open(f"{PKG}_new/{mod}.py", "w") as f:
            f.write(out)
        counts[mod] = out.count("\n")

    # __init__: docstring of original + full re-export
    mdoc = ast.get_docstring(tree)
    init = [f'"""{mdoc}\n"""\n']
    for mod in MODULE_ORDER:
        names = sorted({nm for s in segs for nm in s["names"] if s.get("fam") == mod})
        if names:
            init.append(
                f"from docs2kg_spark.queries.{mod} import (\n    "
                + ",\n    ".join(names) + ",\n)\n"
            )
    init.append(
        "\n__all__ = [n for n in dict(globals()) if not n.startswith('__')]\n"
    )
    with open(f"{PKG}_new/__init__.py", "w") as f:
        f.write("".join(init))

    print(json.dumps(counts, indent=1))
    print("total lines:", sum(counts.values()))


if __name__ == "__main__":
    main()
