"""Bucketed co-located joins: pre-bucketing both fact tables on the join key
removes the shuffle entirely — THE preparation that makes repeated big-big
joins affordable at 100 TB (both sides scan bucket-aligned, no Exchange)."""

import pandas as pd
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark):
    # tables land in the session's default warehouse (./spark-warehouse,
    # gitignored); drop first in case a previous interrupted run left the
    # managed location behind
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    import shutil
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b"))
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    # at this fixture size the planner would broadcast (also correct); the
    # merge hint forces the big-big strategy this test is about
    joined = ob.hint("merge").join(lb, ob.o_orderkey == lb.l_orderkey).select(
        "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # co-located: no shuffle on either side

    # same answer as the shuffled join over the raw parquet
    raw = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).select(
        "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
    )
    a = joined.toPandas().sort_values(["o_orderkey", "l_linenumber"]).reset_index(drop=True)
    b = raw.toPandas().sort_values(["o_orderkey", "l_linenumber"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # bucket-aligned aggregation is also shuffle-free
    agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in agg_plan, agg_plan
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
