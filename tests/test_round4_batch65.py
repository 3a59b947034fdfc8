"""Round-4 batch-65: top boilerplate grams."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_top_boilerplate_grams(spark):
    rows = Q.q_top_boilerplate_grams(spark, SF_DIR).collect()
    assert len(rows) == 15
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        assert r["df"] >= 2
        assert r["n_occ"] >= r["df"]
        assert len(r["gram"].split(" ")) <= 8
