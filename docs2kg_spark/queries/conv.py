"""Conversation/turn-level reads and multimodal asset decoding queries.

Split from the original queries.py monolith (round-4 verdict item 6);
segment order preserved.  Registry: docs2kg_spark.queries (package
__init__ re-exports every name, driver contract unchanged).
"""
from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from docs2kg_spark.config import DEFAULT_GAZETTEER
from docs2kg_spark.functions.ids import WS_RE
from docs2kg_spark.oracle.sql_twins import (
    kg_canonical_map_sql,
    kg_edges_sql,
    kg_mentions_sql,
    kg_nodes_sql,
    kg_triples_sql,
    minhash_estimator_audit_sql,
    minhash_near_dup_sql,
)

from docs2kg_spark.queries._shared import (
    TRANSCRIPTS_CTE,
    _POLARITY_LEXICON,
    _kg_stack,
    _t,
    derive_transcripts,
)



def q_multimodal_assets(spark, sf_dir):
    from docs2kg_spark.operators.multimodal import assets_from_documents

    d = _t(spark, sf_dir, "documents")
    a = assets_from_documents(d)
    return a.select("asset_id", "kind", F.length("payload").cast("bigint").alias("n_bytes"))


SQL_MM_ASSETS = """
SELECT sha256('image|' || CAST(doc_id AS VARCHAR)) AS asset_id, 'image' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


def q_multimodal_features(spark, sf_dir):
    from docs2kg_spark.operators.multimodal import assets_from_documents, extract_features

    d = _t(spark, sf_dir, "documents")
    return extract_features(assets_from_documents(d)).select("asset_id", "kind", "n_bytes")


def q_multimodal_real_decode(spark, sf_dir):
    """REAL media decode end-to-end (§2.10 multimodal; reference asset
    side-outputs digitization/native/ebook.py:222-238): each doc
    synthesizes a deterministic gradient image, encodes it to REAL
    BMP / PNG / PPM bytes (doc_id % 3 picks the codec), decodes the
    byte stream back through the pure-stdlib decoders dispatched on
    magic bytes (operators/media.py), and emits per-channel pixel sums
    computed FROM THE DECODED ARRAY.  The DuckDB twin computes the
    same sums analytically, so any encode/decode defect — row order,
    BMP padding, PNG filtering, BGR/RGB channel swap — breaks the
    value hash.  100 TB shape: one narrow Arrow pass, zero shuffle;
    pixel work is per-row and bounded (≤ 8×6×3)."""
    import numpy as np

    from docs2kg_spark.operators import media

    schema = (
        "doc_id bigint, fmt string, w bigint, h bigint, "
        "sum_r bigint, sum_g bigint, sum_b bigint"
    )
    encoders = {"bmp": media.encode_bmp, "png": media.encode_png, "pnm": media.encode_ppm}

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "fmt", "w", "h", "sum_r", "sum_g", "sum_b")}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                b0, b1, b2 = did % 64, (did * 7) % 64, (did * 13) % 64
                ys, xs = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [b0 + xs + 2 * ys, b1 + 3 * xs + ys, b2 + xs + ys], axis=2
                ).astype(np.uint8)
                fmt = ("bmp", "png", "pnm")[did % 3]
                dec = media.media_decode(encoders[fmt](px))
                rows["doc_id"].append(did)
                rows["fmt"].append(fmt)
                rows["w"].append(int(dec.shape[1]))
                rows["h"].append(int(dec.shape[0]))
                s = dec.astype(np.int64).sum(axis=(0, 1))
                rows["sum_r"].append(int(s[0]))
                rows["sum_g"].append(int(s[1]))
                rows["sum_b"].append(int(s[2]))
            yield pd.DataFrame(rows)

    return _t(spark, sf_dir, "documents").select("doc_id").mapInPandas(gen, schema=schema)


# analytic twin: sum over the h×w grid of (b + α·x + β·y) =
# h·w·b + α·h·Σx + β·w·Σy with Σx = w(w-1)/2, Σy = h(h-1)/2.
SQL_MM_REAL_DECODE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png' ELSE 'pnm' END AS fmt,
       CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
       CAST(h*w*(doc_id % 64)        + h*(w*(w-1)//2)     + 2*(w*(h*(h-1)//2)) AS BIGINT) AS sum_r,
       CAST(h*w*((doc_id*7) % 64)    + 3*(h*(w*(w-1)//2)) + w*(h*(h-1)//2)     AS BIGINT) AS sum_g,
       CAST(h*w*((doc_id*13) % 64)   + h*(w*(w-1)//2)     + w*(h*(h-1)//2)     AS BIGINT) AS sum_b
FROM (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents)
"""


def q_conv_profile(spark, sf_dir):
    """Per-conversation integrity/shape profile over the derived
    transcript table — the data-quality gate a dialogue corpus passes
    before training (role balance, alternation violations, turn-index
    density)."""
    from docs2kg_spark.operators.segments import conversation_profile

    return conversation_profile(derive_transcripts(spark, sf_dir))


SQL_CONV_PROFILE = f"""
WITH {TRANSCRIPTS_CTE},
lagged AS (
  SELECT conv_id, turn_idx, role,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
         LAG(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_idx
  FROM transcripts
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(*) FILTER (WHERE role = 'system') AS BIGINT) AS n_system,
       CAST(COUNT(*) FILTER (WHERE role = 'user') AS BIGINT) AS n_user,
       CAST(COUNT(*) FILTER (WHERE role = 'assistant') AS BIGINT) AS n_assistant,
       CAST(COUNT(*) FILTER (WHERE role = 'tool') AS BIGINT) AS n_tool,
       CAST(COUNT(*) FILTER (WHERE role = prev_role) AS BIGINT) AS n_role_repeats,
       CAST(COUNT(*) FILTER (WHERE prev_idx IS NOT NULL AND turn_idx != prev_idx + 1) AS BIGINT) AS n_idx_gaps,
       ARG_MIN(role, turn_idx) AS first_role,
       ARG_MAX(role, turn_idx) AS last_role
FROM lagged
GROUP BY conv_id
"""


def q_multimodal_audio_decode(spark, sf_dir):
    """REAL audio decode end-to-end (the WAV leg of the media family;
    multimodal_real_decode is the image leg): each doc synthesizes a
    deterministic integer waveform s_i = ((doc_id·31 + 7i) mod 201) −
    100 of length 64 + doc_id%64, encodes it to REAL RIFF/PCM WAV
    bytes, decodes the byte stream back through the pure-stdlib parser
    (operators/media.py::decode_wav), and emits sample-rate/channel/
    sum/peak FROM THE DECODED ARRAY — all exact integers, so any
    header, chunk-walk, or sample-width defect breaks the value hash.
    The DuckDB twin regenerates the same waveform arithmetically.

    100 TB shape: one narrow Arrow pass, zero shuffle; per-row work
    bounded by 128 samples."""
    import numpy as np

    from docs2kg_spark.operators import media

    schema = "doc_id bigint, sr bigint, nch bigint, n_samples bigint, sum_s bigint, peak bigint"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sr", "nch", "n_samples", "sum_s", "peak")}
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 64
                s = (((did * 31 + np.arange(n) * 7) % 201) - 100).astype(np.int16)
                payload = media.encode_wav(s, sample_rate=8000 + (did % 4) * 4000)
                sr, nch, dec = media.decode_wav(payload)
                rows["doc_id"].append(did)
                rows["sr"].append(int(sr))
                rows["nch"].append(int(nch))
                rows["n_samples"].append(int(len(dec)))
                rows["sum_s"].append(int(dec.sum()))
                rows["peak"].append(int(np.abs(dec).max()))
            yield pd.DataFrame(rows)

    return _t(spark, sf_dir, "documents").select("doc_id").mapInPandas(gen, schema=schema)


SQL_MM_AUDIO_DECODE = """
WITH ad_n AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
ad_i AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM ad_n),
ad_s AS (SELECT doc_id, n, ((doc_id * 31 + i * 7) % 201) - 100 AS s FROM ad_i)
SELECT doc_id,
       CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sr,
       CAST(1 AS BIGINT) AS nch,
       CAST(n AS BIGINT) AS n_samples,
       CAST(sum(s) AS BIGINT) AS sum_s,
       CAST(max(abs(s)) AS BIGINT) AS peak
FROM ad_s GROUP BY doc_id, n
"""


def q_multimodal_video_decode(spark, sf_dir):
    """REAL video decode + frame sampling end-to-end (the VIDEO leg of
    the media family; images and WAV audio have their own oracled
    legs): each doc synthesizes 2 + doc_id%3 deterministic gradient
    frames, encodes them to a REAL APNG byte stream (acTL/fcTL/fdAT
    per the public spec), decodes it back through the pure-stdlib
    parser (operators/media.py::decode_apng_frames), samples every 2nd
    frame (the frame_sample primitive), and emits per-channel pixel
    sums over the SAMPLED frames — so chunk walk, fdAT sequence
    stripping, per-frame zlib/defilter, and the sampling stride are
    all value-checked against an analytic DuckDB twin.

    100 TB shape: one narrow Arrow pass, zero shuffle; per-row work
    bounded (≤ 4 frames × 8×6 px)."""
    import numpy as np

    from docs2kg_spark.operators import media

    schema = (
        "doc_id bigint, n_frames bigint, n_sampled bigint, w bigint, h bigint, "
        "sum_r bigint, sum_g bigint, sum_b bigint"
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            cols = {k: [] for k in ("doc_id", "n_frames", "n_sampled", "w", "h",
                                    "sum_r", "sum_g", "sum_b")}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                b0, b1, b2 = did % 64, (did * 7) % 64, (did * 13) % 64
                nf = 2 + did % 3
                ys, xs = np.mgrid[0:h, 0:w]
                frames = [
                    np.stack(
                        [b0 + f + xs + 2 * ys, b1 + 2 * f + 3 * xs + ys, b2 + f + xs + ys],
                        axis=2,
                    ).astype(np.uint8)
                    for f in range(nf)
                ]
                sampled = media.frame_sample(media.encode_apng(frames), every_k=2)
                tot = np.zeros(3, dtype=np.int64)
                for fr in sampled:
                    tot += fr.astype(np.int64).sum(axis=(0, 1))
                cols["doc_id"].append(did)
                cols["n_frames"].append(nf)
                cols["n_sampled"].append(len(sampled))
                cols["w"].append(w)
                cols["h"].append(h)
                cols["sum_r"].append(int(tot[0]))
                cols["sum_g"].append(int(tot[1]))
                cols["sum_b"].append(int(tot[2]))
            yield pd.DataFrame(cols)

    return _t(spark, sf_dir, "documents").select("doc_id").mapInPandas(gen, schema=schema)


# analytic twin: frame f adds (f, 2f, f) per pixel on top of the static
# gradient; sampled frames are {0} for 2-frame docs, {0, 2} otherwise,
# so |S| and Σs are CASE expressions and the rest is the closed-form
# grid sum (Sx = w(w-1)/2, Sy = h(h-1)/2).
SQL_MM_VIDEO_DECODE = """
WITH vd AS (
  SELECT doc_id,
         4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
         doc_id % 64 AS b0, (doc_id * 7) % 64 AS b1, (doc_id * 13) % 64 AS b2,
         2 + doc_id % 3 AS nf,
         CASE WHEN 2 + doc_id % 3 = 2 THEN 1 ELSE 2 END AS ns,
         CASE WHEN 2 + doc_id % 3 = 2 THEN 0 ELSE 2 END AS ssum
  FROM documents
)
SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, CAST(ns AS BIGINT) AS n_sampled,
       CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
       CAST(ns * (h*w*b0 + h*(w*(w-1)//2) + 2*(w*(h*(h-1)//2))) + h*w*ssum AS BIGINT) AS sum_r,
       CAST(ns * (h*w*b1 + 3*(h*(w*(w-1)//2)) + w*(h*(h-1)//2)) + 2*h*w*ssum AS BIGINT) AS sum_g,
       CAST(ns * (h*w*b2 + h*(w*(w-1)//2) + w*(h*(h-1)//2)) + h*w*ssum AS BIGINT) AS sum_b
FROM vd
"""


def q_multimodal_gif_decode(spark, sf_dir):
    """REAL decode of a genuinely COMPRESSED format with zero
    libraries: each doc synthesizes its gradient image, encodes it to
    GIF89a whose pixel stream is REAL LZW (operators/media.py —
    variable-width codes, clear/EOI, table growth to 12 bits), decodes
    it back, and emits exact integer stats of the decoded luminance
    plane.  The DuckDB twin recomputes the palette luminance per pixel
    arithmetically — any defect in the LZW bit reader, sub-block
    reassembly, or palette mapping breaks the value hash.  This is the
    one media leg where 'compressed needs a library' is shown false.

    100 TB shape: one narrow Arrow pass, zero shuffle; ≤ 48 px/row."""
    import numpy as np

    from docs2kg_spark.operators import media

    schema = "doc_id bigint, w bigint, h bigint, n_px bigint, sum_gray bigint, max_gray bigint"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            cols = {k: [] for k in ("doc_id", "w", "h", "n_px", "sum_gray", "max_gray")}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                b0, b1, b2 = did % 64, (did * 7) % 64, (did * 13) % 64
                ys, xs = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [b0 + xs + 2 * ys, b1 + 3 * xs + ys, b2 + xs + ys], axis=2
                ).astype(np.uint8)
                dec = media.decode_gif(media.encode_gif(px))
                gray = dec[:, :, 0].astype(np.int64)  # gray palette: R==G==B
                cols["doc_id"].append(did)
                cols["w"].append(int(dec.shape[1]))
                cols["h"].append(int(dec.shape[0]))
                cols["n_px"].append(int(gray.size))
                cols["sum_gray"].append(int(gray.sum()))
                cols["max_gray"].append(int(gray.max()))
            yield pd.DataFrame(cols)

    return _t(spark, sf_dir, "documents").select("doc_id").mapInPandas(gen, schema=schema)


SQL_MM_GIF_DECODE = """
WITH gd AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
         doc_id % 64 AS b0, (doc_id * 7) % 64 AS b1, (doc_id * 13) % 64 AS b2
  FROM documents
),
gd_y AS (SELECT *, unnest(generate_series(0, h - 1)) AS y FROM gd),
gd_xy AS (SELECT *, unnest(generate_series(0, w - 1)) AS x FROM gd_y),
gd_px AS (
  SELECT doc_id, w, h,
         (299 * (b0 + x + 2*y) + 587 * (b1 + 3*x + y) + 114 * (b2 + x + y)) // 1000 AS gray
  FROM gd_xy
)
SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(gray) AS BIGINT) AS sum_gray,
       CAST(max(gray) AS BIGINT) AS max_gray
FROM gd_px GROUP BY 1, 2, 3
"""


def q_multimodal_jpeg_decode(spark, sf_dir):
    """REAL baseline-JPEG encode→decode per document (operators/
    jpeg.py: Huffman entropy coding, quantized DCT, 4:2:0 when doc_id
    is odd) with exact roundtrip-error stats against the source
    gradient.  JPEG's float DCT is not SQL-expressible, so this is the
    one media leg WITHOUT a DuckDB twin — the driver records the
    weaker rows-only check, and tests/test_media_jpeg.py pins the
    codec behavior (determinism, error bounds, honest SOF2/DRI
    rejections).

    100 TB shape: one narrow Arrow pass, zero shuffle."""
    import numpy as np

    from docs2kg_spark.operators import jpeg

    schema = (
        "doc_id bigint, w bigint, h bigint, subsampled int, n_bytes bigint, "
        "max_err bigint, mean_err_x1000 bigint"
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            cols = {k: [] for k in ("doc_id", "w", "h", "subsampled", "n_bytes",
                                    "max_err", "mean_err_x1000")}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 12 + did % 9, 10 + did % 7
                ys, xs = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [did % 64 + 2 * xs + ys, (did * 7) % 64 + xs + 2 * ys,
                     (did * 13) % 64 + xs], axis=2
                ).astype(np.uint8)
                sub = bool(did % 2)
                data = jpeg.encode_jpeg(px, quality=90, subsample=sub)
                dec = jpeg.decode_jpeg(data)
                err = np.abs(dec.astype(np.int64) - px.astype(np.int64))
                cols["doc_id"].append(did)
                cols["w"].append(w)
                cols["h"].append(h)
                cols["subsampled"].append(int(sub))
                cols["n_bytes"].append(len(data))
                cols["max_err"].append(int(err.max()))
                cols["mean_err_x1000"].append(int(err.sum() * 1000 // err.size))
            yield pd.DataFrame(cols)

    return _t(spark, sf_dir, "documents").select("doc_id").mapInPandas(gen, schema=schema)


def q_brand_return_rate(spark, sf_dir):
    """Return rate per part brand: returned line items (l_returnflag =
    'R') over all line items, with exact counts and returned revenue
    share in cents — the product-quality read by brand.  Ratios are
    one rounded division over exact BIGINTs.

    Scale shape: one broadcast part join + one (brand) hash agg with
    conditional sums."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("n_returned"),
            F.sum(
                F.expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
            ).cast("bigint").alias("total_cents"),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"),
                ).otherwise(F.lit(0))
            ).cast("bigint").alias("returned_cents"),
        )
        .selectExpr(
            "p_brand", "n_lines", "n_returned", "total_cents", "returned_cents",
            "ROUND(CAST(n_returned AS DOUBLE) / n_lines, 6) AS return_rate",
        )
    )


SQL_BRAND_RETURN_RATE = """
WITH br AS (
  SELECT p.p_brand,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
         CAST(sum(CASE WHEN l.l_returnflag = 'R'
                       THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS returned_cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
)
SELECT p_brand, n_lines, n_returned, total_cents, returned_cents,
       ROUND(CAST(n_returned AS DOUBLE) / n_lines, 6) AS return_rate
FROM br
"""


def q_turn_loop_detector(spark, sf_dir):
    """Agent-loop detector over the transcripts: per conversation, how
    many ADJACENT turn pairs are near-identical (levenshtein on the
    first 200 lowered chars ≤ 10% of the longer prefix) — the
    stuck-assistant / retry-storm signature, the first failure QA an
    agent-trajectory corpus needs.  Integer threshold cross-multiplied
    (dist·1000 ≤ 100·maxlen), no float comparison.

    Scale shape: one conv-keyed lag window (turn-bounded partitions);
    levenshtein runs on capped 200-char prefixes so per-row cost is
    bounded at 200² regardless of turn length; one conv-grain agg."""
    t = derive_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag(F.lower(F.substring("text", 1, 200))).over(w)
    cur = F.lower(F.substring("text", 1, 200))
    pairs = t.select(
        "conv_id",
        prev.alias("pa"),
        cur.alias("pb"),
    ).filter(F.col("pa").isNotNull())
    d = F.levenshtein("pa", "pb")
    mx = F.greatest(F.length("pa"), F.length("pb"))
    return (
        pairs.select(
            "conv_id",
            d.alias("dist"),
            mx.alias("mx"),
        )
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(
                F.when((F.col("dist") * 1000) <= 100 * F.col("mx"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_loops"),
            F.min("dist").cast("bigint").alias("min_dist"),
        )
    )


SQL_TURN_LOOP_DETECTOR = f"""
WITH {TRANSCRIPTS_CTE},
tl_p AS (
  SELECT conv_id,
         lag(lower(substr(text, 1, 200))) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pa,
         lower(substr(text, 1, 200)) AS pb
  FROM transcripts
),
tl_d AS (
  SELECT conv_id, levenshtein(pa, pb) AS dist,
         greatest(length(pa), length(pb)) AS mx
  FROM tl_p WHERE pa IS NOT NULL
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN dist * 1000 <= 100 * mx THEN 1 ELSE 0 END) AS BIGINT) AS n_loops,
       CAST(min(dist) AS BIGINT) AS min_dist
FROM tl_d GROUP BY 1
"""


def q_conv_label_purity(spark, sf_dir):
    """Per-conversation entity-label purity: the dominant mention label
    and its share — a conversation whose mentions are 90% Tool is a
    build log; one spread evenly across labels is a meeting.  The
    topicality router for downstream sampling.

    Scale shape: (conv, label) hash agg → conv-keyed argmax window
    (label-bounded partitions) + one conv totals join."""
    _, m = _kg_stack(spark, sf_dir)
    cl = m.groupBy("conv_id", "label").agg(F.count("*").alias("n"))
    w = Window.partitionBy("conv_id").orderBy(F.desc("n"), "label")
    top = cl.withColumn("rk", F.row_number().over(w)).filter("rk = 1")
    tot = cl.groupBy("conv_id").agg(
        F.sum("n").alias("n_mentions"), F.count("*").alias("n_labels")
    )
    return (
        top.join(tot, "conv_id")
        .selectExpr(
            "conv_id",
            "label AS top_label",
            "CAST(n_mentions AS BIGINT) AS n_mentions",
            "CAST(n_labels AS BIGINT) AS n_labels",
            "n * 10000 DIV n_mentions AS purity_bp",
        )
    )


def _conv_label_purity_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import kg_triples_ctes

    return f"""
WITH {kg_triples_ctes(TRANSCRIPTS_CTE)},
cp_cl AS (
  SELECT conv_id, label, CAST(count(*) AS BIGINT) AS n
  FROM mentions GROUP BY 1, 2
),
cp_top AS (
  SELECT conv_id, label, n FROM (
    SELECT conv_id, label, n,
           ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY n DESC, label) AS rk
    FROM cp_cl
  ) WHERE rk = 1
),
cp_tot AS (
  SELECT conv_id, CAST(sum(n) AS BIGINT) AS n_mentions,
         CAST(count(*) AS BIGINT) AS n_labels
  FROM cp_cl GROUP BY 1
)
SELECT t.conv_id, t.label AS top_label, o.n_mentions, o.n_labels,
       t.n * 10000 // o.n_mentions AS purity_bp
FROM cp_top t JOIN cp_tot o USING (conv_id)
"""


def q_turn_question_profile(spark, sf_dir):
    """Question-turn share per role: how often each role's turns end
    with a question mark (before trailing whitespace) — user-heavy
    question share is the expected dialogue shape; an assistant that
    mostly asks is deflecting, a tool that asks is malformed.

    Scale shape: one row-local regexp flag, a |roles|-row agg."""
    t = derive_transcripts(spark, sf_dir)
    isq = F.when(
        F.expr(r"regexp_extract(text, '\\?\\s*$', 0)") != "", 1
    ).otherwise(0)
    return (
        t.select("role", isq.alias("q"))
        .groupBy("role")
        .agg(
            F.count("*").cast("bigint").alias("n_turns"),
            F.sum("q").cast("bigint").alias("n_questions"),
        )
        .selectExpr(
            "role", "n_turns", "n_questions",
            "n_questions * 10000 DIV n_turns AS question_bp",
        )
    )


SQL_TURN_QUESTION_PROFILE = f"""
WITH {TRANSCRIPTS_CTE},
tq AS (
  SELECT role,
         CASE WHEN regexp_extract(text, '\\?\\s*$') != '' THEN 1 ELSE 0 END AS q
  FROM transcripts
)
SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(q) AS BIGINT) AS n_questions,
       CAST(sum(q) AS BIGINT) * 10000 // CAST(count(*) AS BIGINT) AS question_bp
FROM tq GROUP BY 1
"""


def q_conv_entity_recurrence(spark, sf_dir):
    """Narrative-coherence read: per conversation, the share of
    distinct entities that are mentioned in MORE than one segment — a
    conversation whose entities never recur is a topic dump; recurring
    entities mean a thread the KG's co-occurrence edges can anchor.

    Scale shape: (conv, entity) distinct-segment agg over memoized
    mentions → conv rollup."""
    _, m = _kg_stack(spark, sf_dir)
    per_ent = m.groupBy("conv_id", "text", "label").agg(
        F.countDistinct("seg_id").alias("n_segs")
    )
    return (
        per_ent.groupBy("conv_id")
        .agg(
            F.count("*").cast("bigint").alias("n_entities"),
            F.sum(F.when(F.col("n_segs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_recurring"),
        )
        .selectExpr(
            "conv_id", "n_entities", "n_recurring",
            "n_recurring * 10000 DIV n_entities AS recurrence_bp",
        )
    )


def _conv_entity_recurrence_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import kg_triples_ctes

    return f"""
WITH {kg_triples_ctes(TRANSCRIPTS_CTE)},
er_pe AS (
  SELECT conv_id, text, label, count(DISTINCT seg_id) AS n_segs
  FROM mentions GROUP BY 1, 2, 3
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_entities,
       CAST(sum(CASE WHEN n_segs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_recurring,
       CAST(sum(CASE WHEN n_segs >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 10000
         // CAST(count(*) AS BIGINT) AS recurrence_bp
FROM er_pe GROUP BY 1
"""


def q_conv_closing_tone(spark, sf_dir):
    """How conversations END: the final turn's role and lexicon
    polarity, classed as positive / negative / neutral — unresolved
    endings (negative tone, or a tool turn with no follow-up) are the
    trajectories an agent-training curator inspects first.

    Scale shape: conv-keyed max_by picks the last turn (no full sort);
    token scoring semi-joins the 20-row broadcast lexicon; one ≤|roles|·3
    agg."""
    lex = spark.createDataFrame(list(_POLARITY_LEXICON), "word string, score int")
    t = derive_transcripts(spark, sf_dir)
    last = t.groupBy("conv_id").agg(
        F.max_by(F.struct("role", "text"), "turn_idx").alias("lt")
    ).select("conv_id", F.col("lt.role").alias("role"), F.col("lt.text").alias("text"))
    pol = (
        last.select(
            "conv_id",
            "role",
            F.explode(F.split(F.lower("text"), WS_RE)).alias("rawtok"),
        )
        .select(
            "conv_id", "role",
            F.regexp_replace("rawtok", r"^[^a-z0-9]+|[^a-z0-9]+$", "").alias("tok"),
        )
        .join(F.broadcast(lex), F.col("tok") == F.col("word"), "left")
        .groupBy("conv_id", "role")
        .agg(F.sum(F.coalesce("score", F.lit(0))).cast("bigint").alias("pol"))
    )
    tone = (
        F.when(F.col("pol") > 0, "positive")
        .when(F.col("pol") < 0, "negative")
        .otherwise("neutral")
    )
    return (
        pol.groupBy("role", tone.alias("tone"))
        .agg(F.count("*").cast("bigint").alias("n_convs"))
    )


def _conv_closing_tone_sql() -> str:
    vals = ", ".join(f"('{w}', {s})" for w, s in _POLARITY_LEXICON)
    return f"""
WITH {TRANSCRIPTS_CTE},
ct_lex(word, score) AS (VALUES {vals}),
ct_last AS (
  SELECT conv_id,
         max_by(role, turn_idx) AS role,
         max_by(text, turn_idx) AS text
  FROM transcripts GROUP BY 1
),
ct_tok AS (
  SELECT conv_id, role,
         regexp_replace(t.tok, '^[^a-z0-9]+|[^a-z0-9]+$', '', 'g') AS tok
  FROM ct_last, unnest(regexp_split_to_array(lower(ct_last.text), '[ \\t\\n\\r\\f\\x0B]+')) t(tok)
),
ct_pol AS (
  SELECT conv_id, role, CAST(sum(COALESCE(l.score, 0)) AS BIGINT) AS pol
  FROM ct_tok k LEFT JOIN ct_lex l ON l.word = k.tok
  GROUP BY 1, 2
)
SELECT role,
       CASE WHEN pol > 0 THEN 'positive'
            WHEN pol < 0 THEN 'negative'
            ELSE 'neutral' END AS tone,
       CAST(count(*) AS BIGINT) AS n_convs
FROM ct_pol GROUP BY 1, 2
"""


def q_conv_role_balance(spark, sf_dir):
    """Role-balance entropy per conversation (ln·1e6 integer
    convention over the role distribution) — H near ln 4 is a balanced
    four-role dialogue; H ≈ 0 is a monologue masquerading as a
    conversation, which SFT assembly should route differently.

    Scale shape: one (conv, role) agg → conv rollup, both
    conv-bounded."""
    t = derive_transcripts(spark, sf_dir)
    cr = t.groupBy("conv_id", "role").agg(F.count("*").cast("bigint").alias("n"))
    lnln = F.expr("CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)")
    per = cr.select("conv_id", "n", (F.col("n") * lnln).alias("nln"))
    return (
        per.groupBy("conv_id")
        .agg(
            F.count("*").cast("bigint").alias("n_roles"),
            F.sum("n").cast("bigint").alias("n_turns"),
            F.sum("nln").alias("sum_nln"),
        )
        .selectExpr(
            "conv_id",
            "n_roles",
            "n_turns",
            "CAST(ROUND(ln(CAST(n_turns AS DOUBLE)) * 1000000) AS BIGINT)"
            " - sum_nln DIV n_turns AS entropy_micro",
        )
    )


SQL_CONV_ROLE_BALANCE = f"""
WITH {TRANSCRIPTS_CTE},
rb_cr AS (
  SELECT conv_id, role, CAST(count(*) AS BIGINT) AS n
  FROM transcripts GROUP BY 1, 2
),
rb_n AS (
  SELECT conv_id, n,
         n * CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS nln
  FROM rb_cr
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_roles,
       CAST(sum(n) AS BIGINT) AS n_turns,
       CAST(ROUND(ln(CAST(sum(n) AS DOUBLE)) * 1000000) AS BIGINT)
         - CAST(sum(nln) AS BIGINT) // CAST(sum(n) AS BIGINT) AS entropy_micro
FROM rb_n GROUP BY 1
"""
