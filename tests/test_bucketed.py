"""Bucketed co-located join: the orders x lineitem join must run with
ZERO shuffle when both sides are bucketed+sorted on the key."""

from pyspark.sql import functions as F

from hyperpolyglot_spark.sources.bucketed import colocated_join, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse.dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped at the end
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8)

    # at real scale neither side broadcasts — force the SMJ path the
    # bucketed layout exists for (sf0.001 tables would auto-broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]  # co-located: no shuffle

        # and it's correct
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected

        # the same join on plain parquet DOES shuffle (what we avoided)
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan

        agg = (
            joined.groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # aggregation on the bucket key also reuses the layout
        assert "Exchange" not in agg
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
