"""Property tests for the round-5 core primitives.

- skew.global_row_number: for ANY multiset of sortable rows, the
  two-phase numbering must equal the single-reducer row_number model
  (Python sorted()) exactly — orderings mixing DESC/ASC, negative
  values, duplicates broken by a tie-break column.
- TableStore.merge_upsert / snapshot_read: an arbitrary SEQUENCE of
  merges must track the dict model at every step, and every historic
  snapshot must replay its own point-in-time dict.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from docs2kg_spark.functions.skew import global_row_number
from docs2kg_spark.io.sinks import TableStore

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=300
    ),
    desc=st.booleans(),
)
@settings(**_SETTINGS)
def test_global_row_number_matches_sorted_model(spark, vals, desc):
    rows = [(i, v) for i, v in enumerate(vals)]  # i = unique tie-break
    df = spark.createDataFrame(rows, "i long, v long")
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("i").asc()]
    got = {
        r["i"]: r["rk"]
        for r in global_row_number(df, order, "rk", n_parts=5).collect()
    }
    model = sorted(rows, key=lambda t: ((-t[1] if desc else t[1]), t[0]))
    want = {i: rk + 1 for rk, (i, _v) in enumerate(model)}
    assert got == want


@given(
    steps=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),
                st.text(alphabet="abcxyz", min_size=1, max_size=3),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_merge_upsert_tracks_dict_model_with_time_travel(spark, tmp_path_factory, steps):
    store = TableStore(spark, str(tmp_path_factory.mktemp("prop_ts")))
    model: dict = {}
    history = []
    for delta in steps:
        # a delta may repeat a key; MERGE semantics need one row per key —
        # keep the LAST occurrence, like the model
        dedup = dict(delta)
        df = spark.createDataFrame(list(dedup.items()), "k int, v string")
        sid = store.merge_upsert(df, "t", keys=["k"])
        model.update(dedup)
        history.append((sid, dict(model)))
        got = {r["k"]: r["v"] for r in store.snapshot_read("t").collect()}
        assert got == model
    # every historic snapshot replays its point-in-time state
    for sid, snap in history:
        got = {r["k"]: r["v"] for r in store.snapshot_read("t", sid).collect()}
        assert got == snap
