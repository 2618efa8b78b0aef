package graft

import org.apache.spark.sql.functions._

/** Bucketing proof (SURVEY §7.3: "the read path keys on the same columns
  * so that optimization drops in"): writing both join sides bucketed by
  * the join key lets the lineitem⋈orders join run with ZERO exchanges —
  * the pre-shuffled layout at 100 TB. Asserted on the physical plan.
  */
class BucketJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // a failed earlier run can leave an orphan dir the catalog refuses
    val wh = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_test_warehouse")
    Seq("li_b", "ord_b").foreach(t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t)))
    Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sfTiny)
      .select("o_orderkey", "o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // tiny test tables would auto-broadcast (also shuffle-free, but then
    // the bucketed layout isn't what's being exercised) — force the
    // shuffle-join path so bucketing is what removes the exchanges
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = spark.table("li_b")
          .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
        j.queryExecution.sparkPlan // force planning under the -1 threshold
        j
      } finally ()

    val plan = joined.queryExecution.sparkPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(plan.contains("Bucketed: true"), plan)
    // the join itself must not shuffle either side: the only allowed
    // exchange is the post-join aggregation's
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
           !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)

    // and it computes the right answer
    val n = joined.agg(sum(col("n"))).head().getLong(0)
    assert(n === Tables.lineitem(spark, sfTiny).count())

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
