package graft

import org.apache.spark.sql.DataFrame

/** The SQL entry path answers the reference's client queries with the
  * SAME results as the DataFrame operators: both styles compile through
  * one Catalyst pipeline, so a user of the reference's raw-SQL client
  * can switch without rewriting queries.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def rows(df: DataFrame) = df.collect().toSeq

  test("MLapp reference queries run as literal SQL and match the operators") {
    GraftCatalog.registerViews(spark, sfTiny)
    val pairs = Seq(
      "ref_topk_newest" ->
        "SELECT * FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 200",
      "ref_topk_oldest" ->
        "SELECT * FROM orders ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 200",
      "ref_sort_full" ->
        "SELECT * FROM orders ORDER BY o_orderdate, o_orderkey",
      "ref_count" ->
        "SELECT COUNT(*) AS n_rows FROM lineitem",
      "ref_agg_max" ->
        "SELECT MAX(l_shipdate) AS max_ts, MIN(l_shipdate) AS min_ts FROM lineitem")
    pairs.foreach { case (name, sql) =>
      assert(rows(spark.sql(sql)) ==
        rows(SparkEntry.queries(name)(spark, sfTiny)), name)
    }
  }

  test("custom expressions compose inside literal SQL") {
    GraftCatalog.registerViews(spark, sfTiny)
    // vec_dot is a registered SQL function (GraftExtensions), so ANN-ish
    // scoring is expressible by a SQL-only user
    val top = spark.sql("""
      SELECT vec_id, vec_dot(embedding, embedding) AS self_dot
      FROM embeddings ORDER BY self_dot DESC, vec_id LIMIT 5
    """).collect()
    assert(top.length == 5)
    assert(top.forall(_.getDouble(1) > 0.0))
    val nfc = spark.sql(
      "SELECT nfc_normalize('Café') = 'Café' AS eq").head.getBoolean(0)
    assert(nfc)
  }

  test("views re-register idempotently and follow the sf dir") {
    GraftCatalog.registerViews(spark, sfTiny)
    val n1 = spark.sql("SELECT COUNT(*) AS n FROM lineitem").head.getLong(0)
    GraftCatalog.registerViews(spark, "/root/testdata/sf0.01")
    val n2 = spark.sql("SELECT COUNT(*) AS n FROM lineitem").head.getLong(0)
    assert(n1 < n2, s"sf0.001=$n1 should be smaller than sf0.01=$n2")
    GraftCatalog.registerViews(spark, sfTiny)
    assert(spark.sql("SELECT COUNT(*) AS n FROM lineitem").head.getLong(0) == n1)
  }
}
