"""Bucketed persistence: co-located joins without a shuffle."""


def test_bucketed_join_has_no_exchange(spark):
    import pyspark.sql.functions as F

    from scribe_js_spark.pipeline import write_bucketed

    a = spark.range(200).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.col("id").alias("x"))
    b = spark.range(200).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") * 2).alias("y"))
    write_bucketed(a, "bkt_a", 8)
    write_bucketed(b, "bkt_b", 8)
    # joining two same-bucketed tables on the bucket key must not
    # shuffle either side (sort-merge join over co-located buckets);
    # disable broadcast so the test exercises the bucketed path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 200
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
