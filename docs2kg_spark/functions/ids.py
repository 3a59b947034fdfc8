"""Deterministic content-addressed ids (JVM-side, codegen-friendly).

Replaces the reference's nondeterministic ids — uuid4 at layout_kg.py:39
and ner_spacy_match.py:139, salted Python hash() at
ner_prompt_based.py:162-164 — which break resumability and cross-run
comparison (SURVEY.md §1.4.9).  Must stay byte-identical to the Python
side: oracle/reference.py::det_id computes
sha256("|".join(str(p) for p in parts)).
"""

from __future__ import annotations

# Whitespace-run tokenizer class shared by every engine we compare
# against.  `\s` is NOT dialect-portable: Java includes U+000B
# (vertical tab) where DuckDB/RE2 does not, and Python's `\s` on str
# patterns additionally matches Unicode spaces (U+001C-1F, U+0085,
# U+00A0, ...).  Spelling the class out pins all three engines to the
# identical set [space, \t, \n, \r, \f, \x0B] (ADVICE r2, contamination
# dialect-parity item).  The raw string keeps the escapes symbolic, so
# the very same characters splice into Java regex args, Python
# re.compile, and DuckDB SQL literals (RE2 interprets the escapes).
WS_RE = r"[ \t\n\r\f\x0B]+"

from pyspark.sql import Column
from pyspark.sql import functions as F


ID_HEX_LEN = 32  # 128-bit content ids: collision-safe at 10^12 entities
# (birthday bound ~10^24 pairs x 2^-128 ~ 3e-15) at half the byte cost of
# full sha256 hex in every shuffle, join key, and parquet file


def det_id_col(*cols: Column | str) -> Column:
    """first 128 bits of sha2-256 over '|'-joined parts. Cast everything
    to string first so the bytes match Python's f-string rendering
    (ints render bare).  Python twin: oracle/reference.py::det_id."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.substring(F.sha2(F.concat_ws("|", *parts), 256), 1, ID_HEX_LEN)


def entity_node_id(text_col: Column | str = "text", label_col: Column | str = "label") -> Column:
    """Entity node identity = (surface text, label) — the reference's
    exact merge key (neo4j_loader.py:156-166) made content-addressed."""
    return det_id_col(F.lit("entity"), text_col, label_col)
