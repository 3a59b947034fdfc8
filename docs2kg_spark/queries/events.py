"""Event-stream analytics: sessions, funnels, Markov chains, anomaly audits, sketches (CMS/HLL/Bloom), retention.

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
    _MARKOV_ITERS,
    _kg_stack,
    _t,
    derive_transcripts,
)

from docs2kg_spark.queries.text import (
    SQL_CORPUS_FILTER,
    _BLOOM_K,
    _BLOOM_M,
)



def q_event_ordering(spark, sf_dir):
    """stable-ordering window — the north_rule's core primitive (§2.5)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.filter(F.col("user_id") < 50)
        .select("user_id", "event_id", (F.row_number().over(w) - 1).alias("seq"))
    )


SQL_EVENT_ORDERING = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS seq
FROM events WHERE user_id < 50
"""


def q_distinct_event_types(spark, sf_dir):
    """distinct-values → metadata value nodes (§2.4, metadata_kg.py:94)."""
    return _t(spark, sf_dir, "events").select("event_type").distinct()


SQL_DISTINCT_TYPES = "SELECT DISTINCT event_type FROM events"


def q_hourly_rollup(spark, sf_dir):
    """time bucketing + agg (§2.8 date functions)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").cast("string").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


SQL_HOURLY = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def q_asof_join(spark, sf_dir):
    """as-of join (absent in the reference, SURVEY §2.3; implemented
    Spark-first as the union-sort-window trick): for every purchase
    event, the ts of the most recent prior-or-equal login by that user."""
    from docs2kg_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    logins = (
        e.filter(F.col("event_type") == "login")
        .select("user_id", "ts", F.col("ts").alias("login_ts"))
    )
    out = asof_join(purchases, logins, key="user_id", ts="ts", right_value_cols=["login_ts"])
    return out.select(
        "user_id", "event_id", F.col("login_ts_asof").cast("string").alias("login_ts")
    )


SQL_ASOF = """
SELECT l.user_id, l.event_id, CAST(r.ts AS VARCHAR) AS login_ts
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'login') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_sessionize(spark, sf_dir):
    """gap-based sessionization (batch analog of session_window): session
    index per user with a 60-minute gap."""
    from docs2kg_spark.operators.asof import sessionize

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return sessionize(e, key="user_id", ts="ts", gap_minutes=60.0).select(
        "user_id", "event_id", "session_idx"
    )


SQL_SESSIONIZE = """
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(LAG(ts) OVER w) > 3600 THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id < 50
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, event_id,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) - 1 AS session_idx
FROM gaps
"""


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition table of event_type sequences per
    user (ts + event_id = a total order) — the tool-chain / funnel-flow
    profile of an agent-trace corpus."""
    from docs2kg_spark.operators.sequences import transition_counts

    e = _t(spark, sf_dir, "events")
    return transition_counts(e, "user_id", ["ts", "event_id"], "event_type")


SQL_EVENT_TRANSITIONS = """
WITH pairs AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
), counts AS (
  SELECT src, dst, COUNT(*) AS n FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2
)
SELECT src, dst, CAST(n AS BIGINT) AS n,
       ROUND(n / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS prob
FROM counts
"""


def q_funnel(spark, sf_dir):
    """Ordered view→click→purchase funnel per user (greedy subsequence
    match over the (ts, event_id)-ordered event stream)."""
    from docs2kg_spark.operators.sequences import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        state_col="event_type",
        steps=["view", "click", "purchase"],
    )


SQL_FUNNEL = """
WITH mapped AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                         WHEN 'purchase' THEN 3 ELSE 0 END AS p
  FROM events
), seqs AS (
  SELECT user_id, list_prepend(0, array_agg(p ORDER BY ts, event_id)) AS l
  FROM mapped WHERE p > 0 GROUP BY 1
), prog AS (
  SELECT list_reduce(l, (a, x) -> CASE WHEN x = a + 1 THEN a + 1 ELSE a END) AS progress
  FROM seqs
)
SELECT step, step_name, CAST(users AS BIGINT) AS users FROM (
  SELECT 1 AS step, 'view' AS step_name,
         COUNT(*) FILTER (WHERE progress >= 1) AS users FROM prog
  UNION ALL
  SELECT 2, 'click', COUNT(*) FILTER (WHERE progress >= 2) FROM prog
  UNION ALL
  SELECT 3, 'purchase', COUNT(*) FILTER (WHERE progress >= 3) FROM prog
)
"""


# ---------------------------------------------------------------------------
# sliding-context SFT example assembly (operators/sequences.py)
# ---------------------------------------------------------------------------


def q_event_context(spark, sf_dir):
    """Each event with the concatenation of its previous 3 event_types
    within the user's stream — the SFT context-window builder as a
    frame-bounded window (state per partition is O(k))."""
    from docs2kg_spark.operators.sequences import context_assembly

    e = _t(spark, sf_dir, "events")
    return context_assembly(e, "user_id", ["ts", "event_id"], "event_type", k=3).select(
        "event_id", "user_id", "event_type", "ctx"
    )


SQL_EVENT_CONTEXT = """
SELECT event_id, user_id, event_type,
       coalesce(string_agg(event_type, '>') OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '') AS ctx
FROM events
"""


def q_event_anomalies(spark, sf_dir):
    """Top-3 hourly volume anomalies per event type by |z-score| — the
    ops-analytics outlier read.  The z moments are exact associative
    BIGINT sums (z = (x·nh − Σx)/√(nh·Σx² − (Σx)²), population form),
    so both engines rank the identical 6dp values; hour breaks ties.
    Degenerate groups (a type seen in one hour, or constant hourly
    counts) have zero variance: z is explicitly NULL there — guarded on
    the Spark side because ANSI mode throws DIVIDE_BY_ZERO, NULLIF in
    the twin — and NULL z sorts last under DESC in both engines."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").cast("string").alias("hour")
    ).agg(F.count("*").cast("bigint").alias("n"))
    mo = hourly.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("nh"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    var_term = (F.col("nh") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    z6 = F.round(
        F.when(
            var_term > 0,
            (F.col("n") * F.col("nh") - F.col("sx")).cast("double") / F.sqrt(var_term),
        ),
        6,
    )
    w = Window.partitionBy("event_type").orderBy(F.abs(F.col("z")).desc(), "hour")
    return (
        hourly.join(F.broadcast(mo), on="event_type")
        .select("event_type", "hour", "n", z6.alias("z"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


SQL_EVENT_ANOMALIES = """
WITH ea_h AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ea_m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
         CAST(sum(n) AS BIGINT) AS sx, CAST(sum(n * n) AS BIGINT) AS sxx
  FROM ea_h GROUP BY 1
),
ea_z AS (
  SELECT h.event_type, h.hour, h.n,
         ROUND(CAST(h.n * m.nh - m.sx AS DOUBLE)
               / NULLIF(sqrt(CAST(m.nh * m.sxx - m.sx * m.sx AS DOUBLE)), 0.0), 6) AS z
  FROM ea_h h JOIN ea_m m ON m.event_type = h.event_type
)
SELECT event_type, hour, n, z, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY abs(z) DESC, hour) AS rnk
      FROM ea_z)
WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# mergeable sketches (operators/sketches.py — CMS + HLL, deterministic)
# ---------------------------------------------------------------------------


def q_cms_user_counts(spark, sf_dir):
    """Count-min estimate vs true frequency per user — the sketch the
    fleet merges cell-wise instead of shuffling raw keys; est ≥ true by
    construction, and the value oracle checks the exact overestimates."""
    from docs2kg_spark.operators.sketches import cms_build, cms_estimate

    ev = _t(spark, sf_dir, "events")
    cms = cms_build(ev, "user_id")
    est = cms_estimate(cms, ev.select("user_id"), "user_id")
    true = ev.groupBy(F.col("user_id").cast("string").alias("user_id")).agg(
        F.count("*").cast("bigint").alias("true_count")
    )
    return (
        est.join(true, on="user_id")
        .select(
            F.col("user_id").cast("bigint").alias("user_id"), "est", "true_count"
        )
    )


SQL_CMS_USER_COUNTS = """
WITH cm_keys AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
cm_seeds AS (SELECT CAST(unnest(generate_series(0, 3)) AS VARCHAR) AS seed),
cm_cells AS (
  SELECT seed,
         CAST(CAST(('0x' || substr(md5(seed || '|' || k), 1, 8)) AS UBIGINT) AS BIGINT) % 256 AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM cm_keys CROSS JOIN cm_seeds
  GROUP BY 1, 2
),
cm_probes AS (
  SELECT k, seed,
         CAST(CAST(('0x' || substr(md5(seed || '|' || k), 1, 8)) AS UBIGINT) AS BIGINT) % 256 AS bucket
  FROM (SELECT DISTINCT k FROM cm_keys) CROSS JOIN cm_seeds
),
cm_est AS (
  SELECT k, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
  FROM cm_probes p LEFT JOIN cm_cells c USING (seed, bucket)
  GROUP BY k
)
SELECT CAST(e.k AS BIGINT) AS user_id, e.est, t.true_count
FROM cm_est e
JOIN (SELECT CAST(user_id AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS true_count
      FROM events GROUP BY 1) t USING (k)
"""


def q_hll_user_distinct(spark, sf_dir):
    """HyperLogLog distinct-user estimate with the exact answer riding
    along — registers and the fixed-point harmonic sum are
    engine-exact, so the estimate (and its error) is value-oracled."""
    from docs2kg_spark.operators.sketches import hll_distinct

    return hll_distinct(_t(spark, sf_dir, "events"), "user_id", include_true=True)


SQL_HLL_USER_DISTINCT = """
WITH hl_h AS (
  SELECT CAST(CAST(('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT) AS BIGINT) AS h
  FROM events
),
hl_b AS (SELECT h & 63 AS bucket, h >> 6 AS h2 FROM hl_h),
hl_r AS (
  SELECT bucket,
         max(CASE WHEN h2 > 0 THEN 43 - length(bin(h2)) ELSE 43 END) AS r
  FROM hl_b GROUP BY 1
),
hl_c AS (
  SELECT CAST(count(*) AS BIGINT) AS v_nonempty,
         SUM(CAST(1 AS BIGINT) << (50 - r)) AS hsum
  FROM hl_r
),
hl_e AS (
  SELECT v_nonempty,
         ROUND(CAST(0.709 AS DOUBLE) * 64 * 64 * CAST(1125899906842624 AS DOUBLE)
               / (hsum + (64 - v_nonempty) * CAST(1125899906842624 AS BIGINT)), 6) AS raw_est
  FROM hl_c
)
SELECT v_nonempty, raw_est,
       CASE WHEN raw_est <= 160.0 AND v_nonempty < 64
            THEN ROUND(64.0 * ln(64.0 / CAST(64 - v_nonempty AS DOUBLE)), 6)
            ELSE raw_est END AS est,
       (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_true
FROM hl_e
"""


def q_user_retention(spark, sf_dir):
    """Classic day-N retention cohort matrix over the events stream:
    cohort = each user's first active calendar day; one row per
    (cohort_day, day_offset ≤ 7) with the exact count of users active
    on that offset day.  Exact integers throughout.

    Scale shape: distinct (user, day) collapses the event stream first
    (map-side combine), the min-day cohort agg and the offset rollup
    both shuffle on user/cohort keys only — no window, no wide rows."""
    e = _t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    acts = e.distinct()
    firsts = acts.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        acts.join(firsts, on="user_id")
        .withColumn("day_offset", F.datediff("d", "cohort_day").cast("int"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


SQL_USER_RETENTION = """
WITH acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
firsts AS (SELECT user_id, MIN(d) AS cohort_day FROM acts GROUP BY 1)
SELECT cohort_day,
       CAST(datediff('day', cohort_day, d) AS INTEGER) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM acts JOIN firsts USING (user_id)
WHERE datediff('day', cohort_day, d) <= 7
GROUP BY 1, 2
"""


def q_filter_funnel_by_source(spark, sf_dir):
    """Per-source quality-filter funnel: for every corpus source, how
    many documents each Gopher/C4 rule rejected and how many survived
    — the triage view a data-curation team reads before deciding which
    crawl to re-clean (reason semantics = gopher_filter's bitmap).

    Scale shape: the reject bitmap is a zero-shuffle projection
    (operators/quality.py::gopher_filter) joined back to the id→source
    projection on doc_id, then ONE |sources|-row hash agg; each reason
    count is a bit-test conditional sum inside that same agg."""
    from docs2kg_spark.operators.quality import gopher_filter

    d = _t(spark, sf_dir, "documents")
    f = gopher_filter(d).select("doc_id", "reasons", "kept")
    src = d.select("doc_id", "source")
    bit = lambda b: F.sum(
        ((F.col("reasons").bitwiseAND(F.lit(b))) / b).cast("bigint")
    ).cast("bigint")
    return (
        f.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            bit(1).alias("r_short"),
            bit(2).alias("r_wordlen"),
            bit(4).alias("r_topword"),
            bit(8).alias("r_dupgram"),
            bit(16).alias("r_lowstop"),
        )
    )


def _filter_funnel_by_source_sql() -> str:
    # the corpus_filter twin verbatim, nested as a CTE subquery so the
    # funnel provably aggregates the SAME bitmap the filter query emits
    return f"""
WITH cf AS ({SQL_CORPUS_FILTER}),
fj AS (SELECT d.source, cf.reasons, cf.kept FROM cf JOIN documents d USING (doc_id))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM((reasons & 1) // 1) AS BIGINT) AS r_short,
       CAST(SUM((reasons & 2) // 2) AS BIGINT) AS r_wordlen,
       CAST(SUM((reasons & 4) // 4) AS BIGINT) AS r_topword,
       CAST(SUM((reasons & 8) // 8) AS BIGINT) AS r_dupgram,
       CAST(SUM((reasons & 16) // 16) AS BIGINT) AS r_lowstop
FROM fj GROUP BY source
"""


def q_role_transitions(spark, sf_dir):
    """Role-transition profile over the derived transcripts: counts of
    each (prev_role → role) adjacency plus how many conversations
    exhibit it — the chat-format QA read that catches non-alternating
    corpora (assistant→assistant repeats, tool calls with no assistant
    turn) before SFT training.

    Scale shape: one lag window partitioned by conv_id (turn-bounded
    partitions), then a hash agg to at most |roles|² rows; the distinct
    conv count runs over the already-narrow (prev, role, conv) stream."""
    t = derive_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        t.select(
            "conv_id",
            "role",
            F.lag("role").over(w).alias("prev_role"),
        )
        .filter(F.col("prev_role").isNotNull())
        .groupBy("prev_role", "role")
        .agg(
            F.count("*").cast("bigint").alias("n_turns"),
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
        )
    )


SQL_ROLE_TRANSITIONS = f"""
WITH {TRANSCRIPTS_CTE},
rt AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM transcripts
)
SELECT prev_role, role,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM rt WHERE prev_role IS NOT NULL GROUP BY 1, 2
"""


def q_event_winsorize(spark, sf_dir):
    """Robust-statistics winsorization per event type: exact
    interpolated P1/P99 of `value`, the clipped-tail counts, and the
    winsorized mean — the outlier-clipping read a reward-model or
    feature pipeline runs before normalizing a heavy-tailed signal.

    Scale shape: pass 1 is one percentile agg per type (exact sort per
    type here — the documented `percentile_approx` swap applies at PB,
    as in doc_length_quantiles); the |types|-row bounds broadcast back
    for pass 2, a pure hash agg whose winsorized sum is integer-scaled
    (round(v·1e6) BIGINT — exact, order-independent)."""
    e = _t(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.percentile("value", 0.01).alias("p01"),
        F.percentile("value", 0.99).alias("p99"),
    )
    j = e.join(F.broadcast(bounds), "event_type")
    wv = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        j.groupBy("event_type", "p01", "p99")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum((F.col("value") < F.col("p01")).cast("bigint"))
            .cast("bigint")
            .alias("n_clipped_lo"),
            F.sum((F.col("value") > F.col("p99")).cast("bigint"))
            .cast("bigint")
            .alias("n_clipped_hi"),
            F.sum(F.round(wv * 1e6).cast("bigint")).alias("_s6"),
        )
        .select(
            "event_type",
            "n",
            F.round("p01", 6).alias("p01"),
            F.round("p99", 6).alias("p99"),
            "n_clipped_lo",
            "n_clipped_hi",
            F.round(F.col("_s6").cast("double") / 1e6 / F.col("n"), 6).alias(
                "mean_winsorized"
            ),
        )
    )


SQL_EVENT_WINSORIZE = """
WITH wb AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS p01,
         quantile_cont(value, 0.99) AS p99
  FROM events GROUP BY 1
),
wj AS (
  SELECT e.event_type, e.value, b.p01, b.p99,
         least(greatest(e.value, b.p01), b.p99) AS wv
  FROM events e JOIN wb b USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(p01, 6) AS p01,
       ROUND(p99, 6) AS p99,
       CAST(SUM(CASE WHEN value < p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(SUM(CASE WHEN value > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       ROUND(CAST(SUM(CAST(round(wv * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*), 6)
         AS mean_winsorized
FROM wj GROUP BY event_type, p01, p99
"""


def q_user_gini(spark, sf_dir):
    """Engagement-concentration profile: the Gini coefficient of events
    per user — the skew scalar that says whether a handful of power
    users dominate the corpus (a sampling-strategy input, like
    skew_profile but as one comparable number).

    Gini = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending xᵢ.  The global
    rank i is computed WITHOUT a single-reducer sort: counts group to
    one row per distinct count value (a bounded relation), running
    offsets ride a window over that tiny relation, and each user's rank
    is offset + row_number within its count partition (tie-broken by
    user_id) — the segments.py two-phase numbering pattern.  All
    moments are exact BIGINTs; one rounded division at the end."""
    e = _t(spark, sf_dir, "events")
    # consumed by the size histogram AND the rank join: one events scan
    ux = (
        e.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    sizes = ux.groupBy("cnt").agg(F.count("*").cast("bigint").alias("m"))
    off = sizes.select(
        "cnt",
        (
            F.sum("m").over(
                Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("offset"),
    ).fillna(0, subset=["offset"])
    ranked = ux.join(F.broadcast(off), "cnt").select(
        "cnt",
        (
            F.col("offset")
            + F.row_number().over(Window.partitionBy("cnt").orderBy("user_id"))
        ).alias("rank"),
    )
    m = ranked.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("cnt").cast("bigint").alias("total_events"),
        F.sum(F.col("rank") * F.col("cnt")).cast("bigint").alias("s_rank_x"),
    )
    gini = F.when(
        F.col("n_users") > 0,
        F.lit(2.0) * F.col("s_rank_x").cast("double")
        / (F.col("n_users") * F.col("total_events")).cast("double")
        - (F.col("n_users") + 1).cast("double") / F.col("n_users").cast("double"),
    )  # empty-events guard: NULL like the twin's NULLIF, not ANSI /0
    return m.select("n_users", "total_events", F.round(gini, 6).alias("gini"))


SQL_USER_GINI = """
WITH gx AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1
),
gr AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS rank FROM gx
),
gm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(cnt) AS BIGINT) AS total_events,
         CAST(SUM(rank * cnt) AS BIGINT) AS s_rank_x
  FROM gr
)
SELECT n_users, total_events,
       ROUND(2.0 * CAST(s_rank_x AS DOUBLE)
               / NULLIF(CAST(n_users AS DOUBLE) * total_events, 0)
             - CAST(n_users + 1 AS DOUBLE) / NULLIF(n_users, 0), 6) AS gini
FROM gm
"""


def q_transition_entropy(spark, sf_dir):
    """Markov entropy per source event type: H(next | src) in nats over
    the per-user transition table — the predictability profile of an
    agent-trace corpus (H≈0 means a deterministic tool chain; high H
    means the type carries no routing signal).

    H = ln(N) − (Σ n·ln n)/N with every log integer-scaled (ln·1e6
    BIGINT — the repo's cross-engine exactness convention), so the sums
    are associative and the one double division happens at the end.

    Scale shape: composes the transition counts (lead window over
    user-bounded partitions, one hash agg) and reduces them with a
    second |types|-row agg."""
    from docs2kg_spark.operators.sequences import transition_counts

    e = _t(spark, sf_dir, "events")
    tc = transition_counts(
        e, "user_id", ["ts", "event_id"], "event_type", with_prob=False
    )
    ln6 = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("bigint")
    per = tc.groupBy("src").agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("n_dst"),
        F.sum(F.col("n") * ln6(F.col("n"))).cast("bigint").alias("_s"),
    )
    h = (
        ln6(F.col("n_total")).cast("double")
        - F.col("_s").cast("double") / F.col("n_total")
    ) / 1e6
    return per.select("src", "n_total", "n_dst", F.round(h, 6).alias("entropy"))


SQL_TRANSITION_ENTROPY = """
WITH te_pairs AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
te_counts AS (
  SELECT src, dst, COUNT(*) AS n FROM te_pairs WHERE dst IS NOT NULL GROUP BY 1, 2
),
te_m AS (
  SELECT src, CAST(SUM(n) AS BIGINT) AS n_total, CAST(COUNT(*) AS BIGINT) AS n_dst,
         SUM(n * CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)) AS s
  FROM te_counts GROUP BY 1
)
SELECT src, n_total, n_dst,
       ROUND((CAST(CAST(round(ln(CAST(n_total AS DOUBLE)) * 1e6) AS BIGINT) AS DOUBLE)
              - CAST(s AS DOUBLE) / n_total) / 1e6, 6) AS entropy
FROM te_m
"""


def q_event_hour_heatmap(spark, sf_dir):
    """Traffic heatmap: event volume and mean value by (day-of-week,
    hour-of-day) — the load-profile read behind batch-window placement
    and volume-anomaly baselines.

    The weekday index is computed with engine-agnostic date arithmetic
    (days since a known Monday, mod 7 — 0=Mon) rather than each
    engine's differently-anchored dayofweek; the mean rides an
    integer-scaled sum.  Scale shape: one projection + one 168-row
    hash agg."""
    e = _t(spark, sf_dir, "events")
    dow = F.pmod(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-05"))), F.lit(7)
    ).cast("int")
    return (
        e.select(
            dow.alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
            F.round(F.col("value") * 1e6).cast("bigint").alias("v6"),
        )
        .groupBy("dow", "hour")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("v6").cast("double") / 1e6 / F.count("*"), 6).alias(
                "mean_value"
            ),
        )
    )


SQL_EVENT_HOUR_HEATMAP = """
SELECT CAST(((CAST(ts AS DATE) - DATE '1970-01-05') % 7 + 7) % 7 AS INT) AS dow,
       CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*), 6)
         AS mean_value
FROM events GROUP BY 1, 2
"""


def q_event_lift(spark, sf_dir):
    """Market-basket lift between event types within user sessions:
    lift(A,B) = N·n_AB / (n_A·n_B) over 60-minute-gap sessions — the
    association read behind funnel design and feature co-activation
    analysis.  All counts exact BIGINTs, one rounded division.

    Scale shape: composes the sessionizer (user-bounded lag window),
    reduces to distinct (session, type) — at most |types| rows per
    session — and self-joins on the session key (per-key fanout ≤
    |types|²); the marginals broadcast back onto ≤|types|² pair rows."""
    s = q_sessionize(spark, sf_dir)
    e = _t(spark, sf_dir, "events").select("event_id", "event_type")
    st = (
        s.join(e, "event_id")
        .select(
            F.concat_ws("#", F.col("user_id").cast("string"),
                        F.col("session_idx").cast("string")).alias("skey"),
            "event_type",
        )
        .distinct()
        .localCheckpoint(eager=False)  # marginals + pair join: ONE pass
    )
    n_s = st.select("skey").distinct().agg(F.count("*").cast("bigint").alias("n_sessions"))
    marg = st.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n_t"))
    pairs = (
        st.alias("x")
        .join(st.alias("y"), "skey")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_ab"))
    )
    return (
        pairs.join(F.broadcast(marg.selectExpr("event_type AS type_a", "n_t AS n_a")), "type_a")
        .join(F.broadcast(marg.selectExpr("event_type AS type_b", "n_t AS n_b")), "type_b")
        .crossJoin(F.broadcast(n_s))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_ab") * F.col("n_sessions")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


SQL_EVENT_LIFT = f"""
WITH el_s AS ({SQL_SESSIONIZE}),
el_st AS (
  SELECT DISTINCT CAST(s.user_id AS VARCHAR) || '#' || CAST(s.session_idx AS VARCHAR) AS skey,
         e.event_type
  FROM el_s s JOIN events e USING (event_id)
),
el_n AS (SELECT CAST(COUNT(DISTINCT skey) AS BIGINT) AS n_sessions FROM el_st),
el_m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM el_st GROUP BY 1),
el_p AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM el_st x JOIN el_st y ON x.skey = y.skey AND x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_ab, a.n_t AS n_a, b.n_t AS n_b,
       ROUND(CAST(p.n_ab * n.n_sessions AS DOUBLE) / (a.n_t * b.n_t), 6) AS lift
FROM el_p p
JOIN el_m a ON a.event_type = p.type_a
JOIN el_m b ON b.event_type = p.type_b
CROSS JOIN el_n n
"""


def q_event_burstiness(spark, sf_dir):
    """Fano factor (variance/mean of hourly event counts) per event
    type — the burstiness read behind rate-limit sizing and anomaly
    thresholds (Fano ≈ 1 ⇒ Poisson; ≫ 1 ⇒ bursty).  Moments are exact
    BIGINTs over integer hourly counts: num = n·Σc² − (Σc)², den =
    n·Σc, fano = num/den — one float division at the end, like the
    repo's z-score and Gini queries.

    Scale shape: two stacked hash aggs ((hour,type) then (type)) —
    the first reduces the corpus to |hours|·|types| rows, the second
    to |types|."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("c"))
    return (
        hourly.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_hours"),
            F.sum("c").cast("bigint").alias("n_events"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
        )
        .selectExpr(
            "event_type",
            "n_hours",
            "n_events",
            "n_hours * s2 - n_events * n_events AS fano_num",
            "n_hours * n_events AS fano_den",
            "ROUND(CAST(n_hours * s2 - n_events * n_events AS DOUBLE) / (n_hours * n_events), 6) AS fano",
        )
    )


SQL_EVENT_BURSTINESS = """
WITH eb_h AS (
  SELECT date_trunc('hour', ts) AS h, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
eb_a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(c) AS BIGINT) AS n_events, CAST(sum(c*c) AS BIGINT) AS s2
  FROM eb_h GROUP BY 1
)
SELECT event_type, n_hours, n_events,
       n_hours * s2 - n_events * n_events AS fano_num,
       n_hours * n_events AS fano_den,
       ROUND(CAST(n_hours * s2 - n_events * n_events AS DOUBLE) / (n_hours * n_events), 6) AS fano
FROM eb_a
"""


def q_bloom_membership(spark, sf_dir):
    """Bloom-filter membership sketch with a measured false-positive
    audit: build an m=4096-bit, k=3 Bloom filter over purchasing users
    (md5-derived bit positions — the deterministic stand-in for the
    hash family), probe EVERY user, and report exact
    members/flagged/false-positive counts in one row — the
    approximate-membership primitive a 100 TB pipeline uses to
    pre-filter a huge stream against a large-but-boundable key set,
    with the approximation's error itself oracled (like
    cms_user_counts / hll_user_distinct).

    Scale shape: bit positions are row-local projections; the bit SET
    is ≤ m rows (a broadcast however big the member set is — that is
    the point of the sketch); the probe is one broadcast join + a
    user-keyed hash agg; output is ONE row."""
    e = _t(spark, sf_dir, "events")

    def bh(j):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit("bloom-v1"), F.lit(str(j)), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _BLOOM_M
        )

    hashes = F.array(*[bh(j) for j in range(_BLOOM_K)])
    users = e.select("user_id").distinct().localCheckpoint(eager=False)
    members = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .localCheckpoint(eager=False)  # bits + membership flag: ONE pass
    )
    bits = (
        members.select(F.explode(hashes).alias("bit")).distinct()
        .withColumn("hit", F.lit(1))
    )
    probed = (
        users.select("user_id", F.explode(hashes).alias("bit"))
        .join(F.broadcast(bits), "bit", "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce("hit", F.lit(0))).alias("all_hit"))
        .join(members.withColumn("is_member", F.lit(1)), "user_id", "left")
    )
    return (
        probed.agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum(F.coalesce("is_member", F.lit(0))).cast("bigint").alias("n_members"),
            F.sum("all_hit").cast("bigint").alias("n_flagged"),
            F.sum(
                F.when((F.col("all_hit") == 1) & F.col("is_member").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_false_pos"),
        )
        .crossJoin(
            F.broadcast(bits.agg(F.count("*").cast("bigint").alias("n_bits_set")))
        )
        .select("n_users", "n_members", "n_bits_set", "n_flagged", "n_false_pos")
    )


SQL_BLOOM_MEMBERSHIP = f"""
WITH bl_u AS (SELECT DISTINCT user_id FROM events),
bl_m AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
bl_h AS (
  SELECT user_id, j,
         CAST(CAST(('0x' || substr(md5('bloom-v1' || '|' || CAST(j AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) % {_BLOOM_M} AS bit
  FROM bl_u, generate_series(0, {_BLOOM_K - 1}) AS g(j)
),
bl_bits AS (
  SELECT DISTINCT h.bit FROM bl_h h JOIN bl_m m USING (user_id)
),
bl_probe AS (
  SELECT h.user_id, min(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS all_hit
  FROM bl_h h LEFT JOIN bl_bits b ON b.bit = h.bit
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(m.user_id) AS BIGINT) AS n_members,
       (SELECT CAST(count(*) AS BIGINT) FROM bl_bits) AS n_bits_set,
       CAST(sum(p.all_hit) AS BIGINT) AS n_flagged,
       CAST(sum(CASE WHEN p.all_hit = 1 AND m.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM bl_probe p LEFT JOIN bl_m m ON m.user_id = p.user_id
"""


def q_user_rfm_bands(spark, sf_dir):
    """RFM (recency/frequency/monetary) segmentation with POLICY
    thresholds: per user, days since last event vs the corpus max
    date, event count, and exact spend in BIGINT cents, banded by
    fixed cutoffs and counted per (r, f, m) cell — the cohort read
    behind retention targeting.  Fixed-threshold banding (not
    quantile) is deliberate: it needs NO global sort/rank, so the
    shape survives any user count.

    Scale shape: one user-keyed hash agg; the corpus max date is a
    1-row broadcast; banding is row-local; the final cell agg is
    ≤ 27 rows."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_d"),
        F.count("*").cast("bigint").alias("freq"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
    )
    gmax = e.agg(F.max(F.to_date("ts")).alias("gmax_d"))
    banded = per_user.crossJoin(F.broadcast(gmax)).selectExpr(
        "user_id",
        "datediff(gmax_d, last_d) AS rdays",
        "freq",
        "cents",
        "CASE WHEN datediff(gmax_d, last_d) <= 0 THEN 'hot' "
        "WHEN datediff(gmax_d, last_d) <= 1 THEN 'warm' ELSE 'cold' END AS r_band",
        "CASE WHEN freq >= 75 THEN 'high' WHEN freq >= 60 THEN 'mid' ELSE 'low' END AS f_band",
        "CASE WHEN cents >= 400000 THEN 'big' WHEN cents >= 300000 THEN 'mid' ELSE 'small' END AS m_band",
    )
    return banded.groupBy("r_band", "f_band", "m_band").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )


SQL_USER_RFM_BANDS = """
WITH rf_u AS (
  SELECT user_id, CAST(max(ts) AS DATE) AS last_d,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
rf_g AS (SELECT CAST(max(ts) AS DATE) AS gmax_d FROM events),
rf_b AS (
  SELECT CASE WHEN date_diff('day', last_d, gmax_d) <= 0 THEN 'hot'
              WHEN date_diff('day', last_d, gmax_d) <= 1 THEN 'warm'
              ELSE 'cold' END AS r_band,
         CASE WHEN freq >= 75 THEN 'high' WHEN freq >= 60 THEN 'mid' ELSE 'low' END AS f_band,
         CASE WHEN cents >= 400000 THEN 'big' WHEN cents >= 300000 THEN 'mid' ELSE 'small' END AS m_band,
         cents
  FROM rf_u CROSS JOIN rf_g
)
SELECT r_band, f_band, m_band, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM rf_b GROUP BY 1, 2, 3
"""


def q_event_value_histogram(spark, sf_dir):
    """Fixed-width value histogram per event type: bucket i counts
    values in [50·i, 50·(i+1)) with the top bucket open — the
    distribution profile a pipeline uses to pick clipping bounds.
    Bucket assignment is integer floor division; sums are exact
    cents.  Scale shape: row-local bucketing into one
    (type, bucket) hash agg — ≤ |types|·10 output rows."""
    e = _t(spark, sf_dir, "events")
    return (
        e.selectExpr(
            "event_type",
            "CAST(least(CAST(floor(value / 50) AS BIGINT), 9) AS INT) AS bucket",
            "CAST(round(value * 100) AS BIGINT) AS cents",
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )


SQL_EVENT_VALUE_HISTOGRAM = """
SELECT event_type,
       CAST(least(CAST(floor(value / 50) AS BIGINT), 9) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY 1, 2
"""


def q_purchase_attribution(spark, sf_dir):
    """Last-touch attribution: for every purchase, the most recent
    PRIOR view by the same user (conditional running-last over a
    ROWS … 1 PRECEDING frame — the event-stream as-of shape), bucketed
    by view→purchase latency and counted — the attribution read behind
    conversion-window policy.  Latency is exact integer seconds;
    'none' buckets purchases with no prior view.

    Scale shape: ONE user-partitioned window (O(1) running state per
    row, never a self-join on user), then a ≤5-row hash agg."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        e.withColumn("prior_view_ts", last_view)
        .filter(F.col("event_type") == "purchase")
        .selectExpr(
            "CASE WHEN prior_view_ts IS NULL THEN 'none' "
            "WHEN unix_timestamp(ts) - unix_timestamp(prior_view_ts) < 60 THEN 'lt_1m' "
            "WHEN unix_timestamp(ts) - unix_timestamp(prior_view_ts) < 3600 THEN 'lt_1h' "
            "WHEN unix_timestamp(ts) - unix_timestamp(prior_view_ts) < 86400 THEN 'lt_1d' "
            "ELSE 'older' END AS latency_bucket"
        )
        .groupBy("latency_bucket")
        .agg(F.count("*").cast("bigint").alias("n_purchases"))
    )


SQL_PURCHASE_ATTRIBUTION = """
WITH pa AS (
  SELECT event_type, ts,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_ts
  FROM events
)
SELECT CASE WHEN prior_view_ts IS NULL THEN 'none'
            WHEN floor(epoch(ts)) - floor(epoch(prior_view_ts)) < 60 THEN 'lt_1m'
            WHEN floor(epoch(ts)) - floor(epoch(prior_view_ts)) < 3600 THEN 'lt_1h'
            WHEN floor(epoch(ts)) - floor(epoch(prior_view_ts)) < 86400 THEN 'lt_1d'
            ELSE 'older' END AS latency_bucket,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM pa WHERE event_type = 'purchase'
GROUP BY 1
"""


def q_hll_type_distinct(spark, sf_dir):
    """Per-event-type HyperLogLog distinct-user estimate beside the
    exact answer and the integer-scaled relative error — the per-group
    sketch read (count(DISTINCT) per group expands every row at 100 TB;
    the (group, register) table reduces to |groups|·64 rows and is the
    sketch's MERGE form).  Registers, fixed-point harmonic sum, and
    the error basis points are all engine-exact."""
    from docs2kg_spark.operators.sketches import hll_distinct_by

    return hll_distinct_by(
        _t(spark, sf_dir, "events"), "user_id", "event_type"
    ).selectExpr(
        "grp AS event_type", "v_nonempty", "est", "n_true", "rel_err_bp"
    )


SQL_HLL_TYPE_DISTINCT = """
WITH ht_h AS (
  SELECT event_type AS grp,
         CAST(CAST(('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT) AS BIGINT) AS h
  FROM events
),
ht_b AS (SELECT grp, h & 63 AS bucket, h >> 6 AS h2 FROM ht_h),
ht_r AS (
  SELECT grp, bucket,
         max(CASE WHEN h2 > 0 THEN 43 - length(bin(h2)) ELSE 43 END) AS r
  FROM ht_b GROUP BY 1, 2
),
ht_c AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS v_nonempty,
         SUM(CAST(1 AS BIGINT) << (50 - r)) AS hsum
  FROM ht_r GROUP BY 1
),
ht_e AS (
  SELECT grp, v_nonempty,
         ROUND(CAST(0.709 AS DOUBLE) * 64 * 64 * CAST(1125899906842624 AS DOUBLE)
               / (hsum + (64 - v_nonempty) * CAST(1125899906842624 AS BIGINT)), 6) AS raw_est
  FROM ht_c
),
ht_f AS (
  SELECT grp, v_nonempty,
         CASE WHEN raw_est <= 160.0 AND v_nonempty < 64
              THEN ROUND(64.0 * ln(64.0 / CAST(64 - v_nonempty AS DOUBLE)), 6)
              ELSE raw_est END AS est
  FROM ht_e
),
ht_t AS (
  SELECT event_type AS grp, CAST(count(DISTINCT user_id) AS BIGINT) AS n_true
  FROM events GROUP BY 1
)
SELECT f.grp AS event_type, f.v_nonempty, f.est, t.n_true,
       CAST(abs(CAST(round(f.est) AS BIGINT) - t.n_true) * 10000 // t.n_true AS BIGINT) AS rel_err_bp
FROM ht_f f JOIN ht_t t ON t.grp = f.grp
"""


def q_event_mad_anomalies(spark, sf_dir):
    """Robust (median/MAD) hourly-volume anomaly profile per event
    type: median hourly count, median absolute deviation, and the most
    deviant hour — the outlier-resistant alternative to
    event_anomalies' z-scores (one bursty hour inflates a stddev but
    not a MAD).  Medians interpolate over exact integer counts
    (`percentile` ≡ `quantile_cont`, parity proven by
    shipping_delay_stats); the top hour tie-breaks on the hour key.

    Scale shape: hourly counts are one (hour, type) hash agg; median
    and MAD are per-GROUP order statistics; the deviant-hour pick is a
    per-type top-1 window over already-reduced rows."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", "ts").cast("string").alias("h"), "event_type"
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # median agg + dev window: ONE pass
    )
    med = hourly.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.expr("percentile(c, 0.5)").alias("med"),
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("c") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("adev").desc(), "h")
    top = (
        dev.withColumn("r", F.row_number().over(w))
        .filter("r = 1")
        .select("event_type", F.col("h").alias("top_hour"), F.col("c").alias("top_count"))
    )
    return (
        med.join(mad, "event_type")
        .join(top, "event_type")
        .select(
            "event_type",
            "n_hours",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "top_hour",
            "top_count",
        )
    )


SQL_EVENT_MAD_ANOMALIES = """
WITH ma_h AS (
  SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS h, event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
ma_m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         quantile_cont(c, 0.5) AS med
  FROM ma_h GROUP BY 1
),
ma_d AS (
  SELECT h.h, h.event_type, h.c, m.n_hours, m.med, abs(h.c - m.med) AS adev
  FROM ma_h h JOIN ma_m m USING (event_type)
),
ma_mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM ma_d GROUP BY 1
),
ma_top AS (
  SELECT event_type, h AS top_hour, c AS top_count FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev DESC, h) AS r
    FROM ma_d) WHERE r = 1
)
SELECT m.event_type, m.n_hours, ROUND(m.med, 6) AS med, ROUND(d.mad, 6) AS mad,
       t.top_hour, t.top_count
FROM ma_m m JOIN ma_mad d USING (event_type) JOIN ma_top t USING (event_type)
"""


def q_session_stats(spark, sf_dir):
    """Session-grain corpus profile in one row: session count, median
    events per session, median and p90 session duration (exact integer
    seconds, interpolated per-group percentiles — quantile_cont
    parity) — the engagement summary read off the sessionizer.

    Scale shape: composes the user-bounded sessionizer; one
    (user, session) hash agg to |sessions| rows, then a 1-row
    order-statistics aggregate."""
    s = q_sessionize(spark, sf_dir)
    e = _t(spark, sf_dir, "events").select("event_id", "ts")
    per = (
        s.join(e, "event_id")
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("bigint")
            .alias("dur_s"),
        )
    )
    return per.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.round(F.expr("percentile(n_events, 0.5)"), 6).alias("med_events"),
        F.round(F.expr("percentile(dur_s, 0.5)"), 6).alias("med_dur_s"),
        F.round(F.expr("percentile(dur_s, 0.9)"), 6).alias("p90_dur_s"),
    )


SQL_SESSION_STATS = f"""
WITH ss_s AS ({SQL_SESSIONIZE}),
ss_p AS (
  SELECT s.user_id, s.session_idx,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(floor(epoch(max(e.ts))) - floor(epoch(min(e.ts))) AS BIGINT) AS dur_s
  FROM ss_s s JOIN events e USING (event_id)
  GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       ROUND(quantile_cont(n_events, 0.5), 6) AS med_events,
       ROUND(quantile_cont(dur_s, 0.5), 6) AS med_dur_s,
       ROUND(quantile_cont(dur_s, 0.9), 6) AS p90_dur_s
FROM ss_p
"""


def q_event_trigrams(spark, sf_dir):
    """Top-20 three-step event paths per user stream (double-lag
    window) — the order-3 extension of event_transitions, the pattern
    read behind funnel hypothesis generation.  Exact counts; ties
    break on the path triple.

    Scale shape: ONE user-partitioned window provides both lags;
    a (t1,t2,t3) hash agg; TakeOrdered 20."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            F.lag("event_type", 2).over(w).alias("t1"),
            F.lag("event_type", 1).over(w).alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .filter("t1 IS NOT NULL")
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "t1", "t2", "t3")
        .limit(20)
    )


SQL_EVENT_TRIGRAMS = """
WITH tg AS (
  SELECT lag(event_type, 2) OVER w AS t1,
         lag(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM tg WHERE t1 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3
LIMIT 20
"""


def q_user_churn(spark, sf_dir):
    """Churn cohort split at the corpus midpoint timestamp
    ((min+max)/2 epoch — a deterministic policy cut, no global sort):
    users active only early (churned), only late (new), both
    (retained), with exact counts in one row — the lifecycle summary
    behind user_retention's cohort curves.

    Scale shape: the midpoint is a 1-row broadcast; the user split is
    one (user) hash agg over row-local early/late flags."""
    e = _t(spark, sf_dir, "events")
    mid = e.agg(
        F.expr(
            "(unix_timestamp(min(ts)) + unix_timestamp(max(ts))) DIV 2"
        ).alias("mid")
    )
    per_user = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.unix_timestamp("ts") <= F.col("mid"), 1).otherwise(0)).alias("early"),
            F.max(F.when(F.unix_timestamp("ts") > F.col("mid"), 1).otherwise(0)).alias("late"),
        )
    )
    return per_user.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum(F.when((F.col("early") == 1) & (F.col("late") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(F.when((F.col("early") == 1) & (F.col("late") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_churned"),
        F.sum(F.when((F.col("early") == 0) & (F.col("late") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
    )


SQL_USER_CHURN = """
WITH uc_m AS (
  SELECT (CAST(floor(epoch(min(ts))) AS BIGINT) + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS mid
  FROM events
),
uc_u AS (
  SELECT user_id,
         max(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) <= m.mid THEN 1 ELSE 0 END) AS early,
         max(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) > m.mid THEN 1 ELSE 0 END) AS late
  FROM events CROSS JOIN uc_m m
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN early = 1 AND late = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(sum(CASE WHEN early = 1 AND late = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(sum(CASE WHEN early = 0 AND late = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
FROM uc_u
"""


def q_event_outlier_profile(spark, sf_dir):
    """Tukey boxplot profile per event type: q1/q3/IQR of value and
    the count above the 1.5·IQR fence — the robust outlier read
    (winsorize's diagnostic sibling).  Quartiles interpolate per group
    (quantile_cont parity); the fence comparison uses the identical
    doubles on both engines.

    Scale shape: two per-group passes over the events projection (one
    order-statistics agg, one fence count with the quartiles broadcast
    back)."""
    e = _t(spark, sf_dir, "events").select("event_type", "value")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.max("q1"), 6).alias("q1"),
            F.round(F.max("q3"), 6).alias("q3"),
            F.sum(
                F.when(
                    F.col("value") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )


SQL_EVENT_OUTLIER_PROFILE = """
WITH eo_q AS (
  SELECT event_type, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       ROUND(max(q.q1), 6) AS q1, ROUND(max(q.q3), 6) AS q3,
       CAST(sum(CASE WHEN e.value > q.q3 + 1.5 * (q.q3 - q.q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN eo_q q USING (event_type)
GROUP BY 1
"""


def q_cms_merge_audit(spark, sf_dir):
    """Self-certifying mergeability audit of the count-min sketch:
    sketch the event stream split in half by event_id parity, SUM the
    two half-sketches cell-by-cell, and compare against the one-pass
    sketch — n_mismatch MUST be 0 (cells are counters; merging IS
    addition), and total_mass = depth · |events| exactly.  This is the
    property the streaming CMS sink (streaming/dedup.py::
    incremental_cms) relies on, value-oracled.

    Scale shape: three constant-size d×w sketch builds + one
    full-outer cell join; output is ONE row."""
    from docs2kg_spark.operators.sketches import CMS_DEPTH, cms_build

    e = _t(spark, sf_dir, "events")
    whole = cms_build(e, "user_id")
    h0 = cms_build(e.filter("event_id % 2 = 0"), "user_id")
    h1 = cms_build(e.filter("event_id % 2 = 1"), "user_id")
    merged = (
        h0.unionByName(h1)
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    cmp = whole.withColumnRenamed("cnt", "cnt_direct").join(
        merged.withColumnRenamed("cnt", "cnt_merged"), ["seed", "bucket"], "full_outer"
    )
    n_events = e.count()
    return cmp.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum(
            F.when(
                F.coalesce("cnt_direct", F.lit(0)) != F.coalesce("cnt_merged", F.lit(0)),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_mismatch"),
        F.sum(F.coalesce("cnt_direct", F.lit(0))).cast("bigint").alias("total_mass"),
        F.lit(CMS_DEPTH * n_events).cast("bigint").alias("expected_mass"),
    )


SQL_CMS_MERGE_AUDIT = """
WITH ca_seeds AS (SELECT CAST(unnest(generate_series(0, 3)) AS VARCHAR) AS seed),
ca_cells AS (
  SELECT seed,
         CAST(CAST(('0x' || substr(md5(seed || '|' || CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) % 256 AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events CROSS JOIN ca_seeds GROUP BY 1, 2
),
ca_half AS (
  SELECT seed,
         CAST(CAST(('0x' || substr(md5(seed || '|' || CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) % 256 AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events CROSS JOIN ca_seeds
  WHERE event_id % 2 = 0 GROUP BY 1, 2
),
ca_half2 AS (
  SELECT seed,
         CAST(CAST(('0x' || substr(md5(seed || '|' || CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) % 256 AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events CROSS JOIN ca_seeds
  WHERE event_id % 2 = 1 GROUP BY 1, 2
),
ca_merged AS (
  SELECT seed, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM (SELECT * FROM ca_half UNION ALL SELECT * FROM ca_half2)
  GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(CASE WHEN coalesce(d.cnt, 0) != coalesce(m.cnt, 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       CAST(sum(coalesce(d.cnt, 0)) AS BIGINT) AS total_mass,
       (SELECT CAST(4 * count(*) AS BIGINT) FROM events) AS expected_mass
FROM ca_cells d FULL OUTER JOIN ca_merged m USING (seed, bucket)
"""


def q_event_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain by
    8 unrolled power iterations over the per-user transition counts —
    where an agent-trace funnel settles if you let it run (the
    long-run share of each event type under its own dynamics, vs the
    empirical share that mixes user entry effects).

    Integer discipline: π is carried in scaled units (start 10⁶ per
    state) and each term is (π(s)·n(s,d)) DIV n_out(s) — the per-term
    truncation is written identically in the twin, so after any fixed
    iteration count the vector is BIGINT-exact (truncation loses a few
    units of mass per step; the read is the RANKING and ratios, both
    stable).

    Scale shape: the transition table is |types|² rows after one lead
    window + hash agg over the events scan; each iteration is a
    |types|-row join — constant-size linear algebra expressed
    declaratively, the same unrolled-fixed-iteration convention as
    PageRank/LPA."""
    trans = (
        q_event_transitions(spark, sf_dir)
        .select("src", "dst", "n")
        .localCheckpoint(eager=False)
    )
    out_tot = trans.groupBy("src").agg(F.sum("n").alias("n_out"))
    t = trans.join(out_tot, "src")
    states = t.select(F.col("src").alias("state")).distinct()
    pi = states.withColumn("p", F.lit(1_000_000).cast("bigint"))
    for _ in range(_MARKOV_ITERS):
        nxt = (
            pi.join(t, pi.state == t.src)
            .groupBy(F.col("dst").alias("state2"))
            .agg(F.sum(F.expr("p * n DIV n_out")).cast("bigint").alias("p2"))
        )
        pi = (
            states.join(nxt, states.state == nxt.state2, "left")
            .select("state", F.coalesce("p2", F.lit(0)).cast("bigint").alias("p"))
        )
    return pi.selectExpr("state AS event_type", "p AS pi_scaled")


def _event_markov_stationary_sql() -> str:
    ctes = ["""
mk_t AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT event_type AS src,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events
  ) WHERE dst IS NOT NULL GROUP BY 1, 2
),
mk_o AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_out FROM mk_t GROUP BY 1),
mk_s AS (SELECT DISTINCT src AS state FROM mk_t),
mk_p0 AS (SELECT state, CAST(1000000 AS BIGINT) AS p FROM mk_s)"""]
    for i in range(_MARKOV_ITERS):
        ctes.append(f"""
mk_n{i} AS (
  SELECT t.dst AS state, CAST(sum(p.p * t.n // o.n_out) AS BIGINT) AS p
  FROM mk_p{i} p JOIN mk_t t ON t.src = p.state JOIN mk_o o ON o.src = p.state
  GROUP BY 1
),
mk_p{i + 1} AS (
  SELECT s.state, CAST(COALESCE(n.p, 0) AS BIGINT) AS p
  FROM mk_s s LEFT JOIN mk_n{i} n USING (state)
)""")
    return (
        "WITH " + ",".join(ctes)
        + f"\nSELECT state AS event_type, p AS pi_scaled FROM mk_p{_MARKOV_ITERS}"
    )


def q_event_value_benford(spark, sf_dir):
    """Benford first-significant-digit profile of event values — the
    classic fabricated-data / unit-mix smoke test: organic multi-scale
    magnitudes follow log10(1+1/d); a flat or spiked profile means
    synthetic values, unit collisions, or truncation upstream.
    Observed counts are exact; the Benford expectation ships as
    pre-computed integer milli-probabilities (identical literals in
    the twin).

    Scale shape: one row-local regexp digit extraction + a 9-row
    agg."""
    e = _t(spark, sf_dir, "events")
    # first significant digit of the decimal rendering of a positive
    # double: strip sign/zeros/dot — regexp '[1-9]' first match
    d1 = F.regexp_extract(F.format_number(F.abs(F.col("value")), 6), "[1-9]", 0)
    ben = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46}
    expect = F.create_map(
        *[F.lit(x) for kv in ben.items() for x in (str(kv[0]), kv[1])]
    )
    rows = (
        e.filter(F.abs(F.col("value")) > 0)
        .select(d1.alias("d"))
        .filter(F.col("d") != "")
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = rows.agg(F.sum("n").alias("n_tot"))
    return (
        rows.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").cast("int").alias("digit"),
            "n",
            F.expr("n * 1000 DIV n_tot").alias("observed_milli"),
            expect[F.col("d")].cast("bigint").alias("benford_milli"),
        )
    )


def _event_value_benford_sql() -> str:
    ben = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46}
    vals = ", ".join(f"({d}, {m})" for d, m in ben.items())
    return f"""
WITH bf_e(digit, benford_milli) AS (VALUES {vals}),
bf_d AS (
  SELECT regexp_extract(format('{{:.6f}}', abs(value)), '[1-9]') AS d
  FROM events WHERE abs(value) > 0
),
bf_c AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n FROM bf_d WHERE d != '' GROUP BY 1
),
bf_t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM bf_c)
SELECT CAST(c.d AS INT) AS digit, c.n,
       c.n * 1000 // t.n_tot AS observed_milli,
       CAST(e.benford_milli AS BIGINT) AS benford_milli
FROM bf_c c CROSS JOIN bf_t t
JOIN bf_e e ON e.digit = CAST(c.d AS INT)
"""


def q_event_rolling_24h(spark, sf_dir):
    """Per-event rolling 24-hour window over each user's stream: how
    many events and how much value the trailing day held at that
    moment — the RANGE-interval window frame (time-based, not
    row-based: the frame width follows the clock, so bursts and gaps
    change the row count per frame).  Value summed in exact cents.

    Scale shape: one user-keyed RANGE window over epoch seconds —
    user-bounded partitions, O(frame) running state, no self-join
    formulation."""
    e = _t(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-86399, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_24h"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .over(w)
        .cast("bigint")
        .alias("value_cents_24h"),
    )


SQL_EVENT_ROLLING_24H = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_24h,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS value_cents_24h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch(ts)
  RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW
)
"""


def q_user_type_dominance(spark, sf_dir):
    """User-level event-type dominance histogram: for each user the
    share of their most frequent event type, bucketed to 10%-wide
    bands — single-behavior users (dominance ≈ 100%) need different
    sampling treatment than explorers.

    Scale shape: (user, type) agg → user argmax window (type-bounded)
    → ≤10-row band agg."""
    e = _t(spark, sf_dir, "events")
    ut = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    top = ut.withColumn("rk", F.row_number().over(w)).filter("rk = 1")
    tot = ut.groupBy("user_id").agg(F.sum("n").alias("n_events"))
    dom = top.join(tot, "user_id").selectExpr(
        "user_id", "n * 10 DIV n_events AS band"
    )
    return (
        dom.groupBy("band")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .selectExpr("CAST(band AS INT) AS dominance_decile", "n_users")
    )


SQL_USER_TYPE_DOMINANCE = """
WITH ud_ut AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ud_top AS (
  SELECT user_id, n FROM (
    SELECT user_id, n,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
    FROM ud_ut
  ) WHERE rk = 1
),
ud_tot AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events FROM ud_ut GROUP BY 1)
SELECT CAST(t.n * 10 // o.n_events AS INT) AS dominance_decile,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud_top t JOIN ud_tot o USING (user_id)
GROUP BY 1
"""


def q_event_gap_survival(spark, sf_dir):
    """Inter-event gap survival curve: for thresholds 1m / 10m / 1h /
    1d, how many adjacent same-user gaps EXCEED each — the read that
    picks a session timeout empirically instead of by convention (the
    knee of this curve is where sessionize's gap parameter should
    sit).

    Scale shape: one user-keyed lag window, then four conditional sums
    in one pass → 4 rows."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
            .cast("long")
            .alias("gap")
        )
        .filter(F.col("gap").isNotNull())
        .localCheckpoint(eager=False)
    )
    tot = gaps.agg(F.count("*").alias("n_gaps"))
    out = None
    for name, secs in (("1m", 60), ("10m", 600), ("1h", 3600), ("1d", 86400)):
        row = (
            gaps.agg(
                F.lit(name).alias("threshold"),
                F.lit(secs).cast("long").alias("threshold_s"),
                F.sum(F.when(F.col("gap") > secs, 1).otherwise(0))
                .cast("bigint")
                .alias("n_exceed"),
            )
            .crossJoin(F.broadcast(tot))
            .selectExpr(
                "threshold", "threshold_s", "n_exceed",
                "CAST(n_gaps AS BIGINT) AS n_gaps",
                "n_exceed * 10000 DIV n_gaps AS exceed_bp",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


SQL_EVENT_GAP_SURVIVAL = """
WITH gs_g AS (
  SELECT epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
), gs_f AS (SELECT CAST(gap AS BIGINT) AS gap FROM gs_g WHERE gap IS NOT NULL),
gs_t AS (SELECT CAST(count(*) AS BIGINT) AS n_gaps FROM gs_f),
gs_c(threshold, threshold_s) AS (VALUES ('1m', 60), ('10m', 600), ('1h', 3600), ('1d', 86400))
SELECT c.threshold, CAST(c.threshold_s AS BIGINT) AS threshold_s,
       CAST(sum(CASE WHEN g.gap > c.threshold_s THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
       t.n_gaps,
       CAST(sum(CASE WHEN g.gap > c.threshold_s THEN 1 ELSE 0 END) AS BIGINT) * 10000
         // t.n_gaps AS exceed_bp
FROM gs_c c CROSS JOIN gs_f g CROSS JOIN gs_t t
GROUP BY 1, 2, t.n_gaps
"""


def q_seg_label_transitions(spark, sf_dir):
    """Layout-flow profile: (previous label → label) adjacency counts
    over each conversation's segment sequence — the structural grammar
    of the corpus (H1 → P → CODE chains), the segment-level analog of
    role_transitions.

    Scale shape: one conv-keyed lag window over the memoized segments,
    ≤|labels|² agg."""
    segs, _ = _kg_stack(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("seg_idx")
    return (
        segs.select("conv_id", "label", F.lag("label").over(w).alias("prev_label"))
        .filter(F.col("prev_label").isNotNull())
        .groupBy("prev_label", "label")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
        )
    )


def _seg_label_transitions_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import kg_triples_ctes

    return f"""
WITH {kg_triples_ctes(TRANSCRIPTS_CTE)},
st AS (
  SELECT conv_id, label,
         lag(label) OVER (PARTITION BY conv_id ORDER BY seg_idx) AS prev_label
  FROM segs
)
SELECT prev_label, label,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM st WHERE prev_label IS NOT NULL GROUP BY 1, 2
"""


def q_event_hour_entropy(spark, sf_dir):
    """Timing regularity per event type: entropy of the hour-of-day
    distribution (24 buckets, the ln·1e6 integer convention) — H near
    ln 24 means the type fires around the clock (machine traffic);
    low H means a human or cron pattern concentrated in a few hours.

    Scale shape: one (type, hour) hash agg → per-type rollup, both
    bounded by |types|·24."""
    e = _t(spark, sf_dir, "events")
    th = e.groupBy(
        "event_type", F.hour("ts").alias("h")
    ).agg(F.count("*").cast("bigint").alias("n"))
    lnln = F.expr("CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)")
    per = th.select("event_type", "n", (F.col("n") * lnln).alias("nln"))
    return (
        per.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_hours"),
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("nln").alias("sum_nln"),
        )
        .selectExpr(
            "event_type",
            "n_hours",
            "n_events",
            "CAST(ROUND(ln(CAST(n_events AS DOUBLE)) * 1000000) AS BIGINT)"
            " - sum_nln DIV n_events AS entropy_micro",
        )
    )


SQL_EVENT_HOUR_ENTROPY = """
WITH he_th AS (
  SELECT event_type, hour(ts) AS h, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
he_n AS (
  SELECT event_type, n,
         n * CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS nln
  FROM he_th
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(ROUND(ln(CAST(sum(n) AS DOUBLE)) * 1000000) AS BIGINT)
         - CAST(sum(nln) AS BIGINT) // CAST(sum(n) AS BIGINT) AS entropy_micro
FROM he_n GROUP BY 1
"""


def q_order_volume_autocorr(spark, sf_dir):
    """Weekly seasonality strength of order volume: lag-1 and lag-7
    Pearson autocorrelation of the DAILY order-count series — the
    statistical form of the weekday profile (lag-7 ≫ lag-1 means the
    weekly cycle dominates day-to-day drift).  Moments are exact
    BIGINT; only the final ratio is a rounded double.

    Scale shape: one (date) count agg (series-sized), a 1-day/7-day
    self-join on the date key (no window over the fact table), 1-row
    moment aggs."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    out = None
    for lag in (1, 7):
        pairs = daily.alias("a").join(
            daily.alias("b"),
            F.expr(f"date_add(a.d, {lag})") == F.col("b.d"),
        ).select(F.col("a.n").alias("x"), F.col("b.n").alias("y"))
        row = pairs.agg(
            F.lit(lag).cast("int").alias("lag_days"),
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * y")).alias("sxy"),
            F.sum(F.expr("x * x")).alias("sxx"),
            F.sum(F.expr("y * y")).alias("syy"),
        ).selectExpr(
            "lag_days",
            "n_pairs",
            """ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
               / NULLIF(sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                             * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 0.0), 6) AS r""",
        )
        out = row if out is None else out.unionByName(row)
    return out


SQL_ORDER_VOLUME_AUTOCORR = """
WITH av_d AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
av_l(lag_days) AS (VALUES (1), (7)),
av_p AS (
  SELECT l.lag_days, a.n AS x, b.n AS y
  FROM av_l l
  JOIN av_d a ON TRUE
  JOIN av_d b ON b.d = a.d + to_days(l.lag_days)
)
SELECT lag_days,
       CAST(count(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
             / NULLIF(sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
                           * CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE)), 0.0), 6) AS r
FROM av_p GROUP BY 1
"""


def q_rolling_7d_users_hll(spark, sf_dir):
    """Trailing-7-day distinct users per day, answered by WINDOWED
    HyperLogLog register merges — the composition a dashboard needs at
    100 TB (exact trailing distincts are a 7× re-count; register
    tables merge with max and each day's window is just the max over
    its 7 daily register sets).  The exact trailing distinct rides
    along so the sketch's daily error is itself an oracled quantity.

    Exactness: registers, fixed-point harmonic sums and the final
    6dp-rounded estimate follow the repo's HLL convention
    (register-exact twin); truth is an exact distinct.

    Scale shape: ONE daily (day, bucket) register agg over the events
    scan; the 7-day merge replicates register ROWS (≤ 64/day) across
    ≤7 window keys — never the event stream; truth dedups (day, user)
    FIRST, then replicates the deduped pairs."""
    e = _t(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), F.col("user_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    base = e.select(F.to_date("ts").alias("day"), h.alias("h")).select(
        "day",
        F.col("h").bitwiseAND(63).alias("bucket"),
        F.shiftright("h", 6).alias("h2"),
    )
    rho = F.when(F.col("h2") > 0, F.lit(43) - F.length(F.expr("bin(h2)"))).otherwise(
        F.lit(43)
    )
    daily = (
        base.select("day", "bucket", rho.cast("int").alias("rho"))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("r"))
        .localCheckpoint(eager=False)
    )
    days = daily.select("day").distinct()
    win = (
        daily.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .select(F.expr("date_add(day, off)").alias("wday"), "bucket", "r")
        .join(days.withColumnRenamed("day", "wday"), "wday")
        .groupBy("wday", "bucket")
        .agg(F.max("r").alias("r"))
    )
    comb = win.groupBy("wday").agg(
        F.count("*").cast("bigint").alias("v_nonempty"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - r)")).alias("hsum"),
    )
    est_raw = F.round(
        F.lit(0.709) * 64 * 64 * F.lit(float(2**50))
        / (F.col("hsum") + (64 - F.col("v_nonempty")) * (2**50)),
        6,
    )
    lc = F.round(
        F.lit(64.0) * F.log(F.lit(64.0) / (64 - F.col("v_nonempty")).cast("double")), 6
    )
    est = F.when((est_raw <= 160.0) & (F.col("v_nonempty") < 64), lc).otherwise(
        est_raw
    )
    pairs = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    truth = (
        pairs.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .select(F.expr("date_add(day, off)").alias("wday"), "user_id")
        .join(days.withColumnRenamed("day", "wday"), "wday")
        .groupBy("wday")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_true"))
    )
    return (
        comb.select("wday", "v_nonempty", est.alias("est"))
        .join(truth, "wday")
        .selectExpr(
            "wday AS day",
            "v_nonempty",
            "est",
            "n_true",
            "CAST(abs(CAST(round(est) AS BIGINT) - n_true) * 10000 DIV n_true AS BIGINT) AS rel_err_bp",
        )
    )


SQL_ROLLING_7D_USERS_HLL = """
WITH r7_h AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(CAST(('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT) AS BIGINT) AS h
  FROM events
),
r7_b AS (SELECT day, h & 63 AS bucket, h >> 6 AS h2 FROM r7_h),
r7_d AS (
  SELECT day, bucket,
         max(CASE WHEN h2 > 0 THEN 43 - length(bin(h2)) ELSE 43 END) AS r
  FROM r7_b GROUP BY 1, 2
),
r7_days AS (SELECT DISTINCT day FROM r7_d),
r7_w AS (
  SELECT d.day + to_days(CAST(o.off AS INTEGER)) AS wday, d.bucket, max(d.r) AS r
  FROM r7_d d, unnest(range(0, 7)) o(off)
  JOIN r7_days x ON x.day = d.day + to_days(CAST(o.off AS INTEGER))
  GROUP BY 1, 2
),
r7_c AS (
  SELECT wday, CAST(count(*) AS BIGINT) AS v_nonempty,
         SUM(CAST(1 AS BIGINT) << (50 - r)) AS hsum
  FROM r7_w GROUP BY 1
),
r7_e AS (
  SELECT wday, v_nonempty,
         ROUND(CAST(0.709 AS DOUBLE) * 64 * 64 * CAST(1125899906842624 AS DOUBLE)
               / (hsum + (64 - v_nonempty) * CAST(1125899906842624 AS BIGINT)), 6) AS raw_est
  FROM r7_c
),
r7_f AS (
  SELECT wday, v_nonempty,
         CASE WHEN raw_est <= 160.0 AND v_nonempty < 64
              THEN ROUND(64.0 * ln(64.0 / CAST(64 - v_nonempty AS DOUBLE)), 6)
              ELSE raw_est END AS est
  FROM r7_e
),
r7_p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
r7_t AS (
  SELECT p.day + to_days(CAST(o.off AS INTEGER)) AS wday, CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_true
  FROM r7_p p, unnest(range(0, 7)) o(off)
  JOIN r7_days x ON x.day = p.day + to_days(CAST(o.off AS INTEGER))
  GROUP BY 1
)
SELECT CAST(f.wday AS DATE) AS day, f.v_nonempty, f.est, t.n_true,
       CAST(abs(CAST(round(f.est) AS BIGINT) - t.n_true) * 10000 // t.n_true AS BIGINT) AS rel_err_bp
FROM r7_f f JOIN r7_t t ON t.wday = f.wday
"""
