"""Round-4 batch-56: tax profile, order size×value matrix, mention
method mix."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_tax_profile_totals(spark):
    rows = Q.q_lineitem_tax_profile(spark, SF_DIR).collect()
    li = Q._t(spark, SF_DIR, "lineitem")
    assert sum(r["n_items"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["tax_pct"] <= 100
        # tax can never exceed revenue at rates < 100%
        assert r["tax_cents"] <= r["revenue_cents"]


def test_order_size_value_matrix_totals(spark):
    rows = Q.q_order_size_value_matrix(spark, SF_DIR).collect()
    # orders with no lineitems are excluded by the inner join
    li = Q._t(spark, SF_DIR, "lineitem")
    n_orders_with_lines = li.select("l_orderkey").distinct().count()
    assert sum(r["n_orders"] for r in rows) == n_orders_with_lines
    assert {r["size_band"] for r in rows} <= {"1-2", "3-4", "5+"}


def test_mention_method_mix(spark):
    rows = Q.q_mention_method_mix(spark, SF_DIR).collect()
    _, m = Q._kg_stack(spark, SF_DIR)
    assert sum(r["n_mentions"] for r in rows) == m.count()
    methods = {r["method"] for r in rows}
    assert "gazetteer" in methods and "llm_standin" in methods
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], 0)
        by_label[r["label"]] += r["method_share_bp"]
    for share in by_label.values():
        assert 9990 <= share <= 10000  # truncation slack
