"""HTML/text cleanup as regexp_replace chains — the Spark mapping of the
reference's HTML-cleaning substep (digitization/native/html_parser.py:
124-128,162-168: strip <script>/<style> blocks and inline CSS, collapse
blank lines).  Pure JVM-side column expressions, whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_html(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    no_script = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    no_style = F.regexp_replace(no_script, r"(?is)<style[^>]*>.*?</style>", " ")
    no_tags = F.regexp_replace(no_style, r"(?s)<[^>]+>", " ")
    collapsed_lines = F.regexp_replace(no_tags, r"\n\s*\n+", "\n")
    squeezed = F.regexp_replace(collapsed_lines, r"[ \t]+", " ")
    return F.trim(squeezed)
