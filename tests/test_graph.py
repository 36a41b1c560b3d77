

def test_jaccard_neighbors_closed_form(spark, tmp_path):
    """Customers sharing 3 of their suppliers: J = common/(d1+d2-common)
    exactly; pairs below the shared-supplier gate are absent."""
    import os
    from pyspark.sql import functions as F
    from repcheck_data_integration_spark.operators.graph import (
        PAIR_MIN_QTY,
        graph_jaccard_neighbors,
    )
    # A buys from suppliers 1,2,3,4; B from 1,2,3; C from 9 only
    edges = [(100, s) for s in (1, 2, 3, 4)] + [(200, s) for s in (1, 2, 3)] + [
        (300, 9)
    ]
    orows, lrows = [], []
    for i, (cust, supp) in enumerate(edges):
        orows.append((i, cust, "O", 1.0, "x"))
        lrows.append((i, 1, supp, 1, float(PAIR_MIN_QTY), 1.0, 0.0, 0.0, "N", "O"))
    spark.createDataFrame(
        orows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    spark.createDataFrame(
        lrows,
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus"],
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    out = graph_jaccard_neighbors(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["cust1"], r["cust2"]) == (100, 200)
    assert r["n_common"] == 3 and (r["deg1"], r["deg2"]) == (4, 3)
    assert r["jaccard"] == 0.75
