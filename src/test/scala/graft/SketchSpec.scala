package graft

import org.apache.spark.sql.functions._

/** agg_approx_distinct is self-validating (each engine checks its own
  * HLL estimate against its own exact count, so the boolean column
  * hash-matches the oracle). This spec pins the two properties the
  * boolean alone doesn't: the exact column really is exact, and the raw
  * estimator error stays within 3× the configured 2% rsd.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val exact = Tables.lineitem(spark, sfTiny)
    .groupBy($"l_returnflag")
    .agg(countDistinct($"l_partkey").as("n"))
    .as[(String, Long)].collect().toMap

  test("agg_approx_distinct validates its own estimate (all groups true)") {
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, sfTiny)
      .select("l_returnflag", "exact_parts", "estimate_within_10pct")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, ex, ok) =>
      assert(ex === exact(k), s"flag $k: exact_parts drifted")
      assert(ok, s"flag $k: HLL estimate outside 10% of exact $ex")
    }
  }

  test("raw approx_count_distinct within configured 2% rsd (allow 3x slack)") {
    val approx = Tables.lineitem(spark, sfTiny)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("a"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val rel = math.abs(approx(k) - n).toDouble / n
      assert(rel < 0.06, s"flag $k: approx=${approx(k)} exact=$n rel=$rel")
    }
  }
}
