package graft

import org.apache.spark.sql.functions._

/** agg_approx_distinct has no exact oracle (HLL++ sketches are
  * engine-specific); bound its relative error against the exact count.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within configured 2% rsd (allow 3x slack)") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sfTiny)
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, sfTiny)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      val rel = math.abs(a - n).toDouble / n
      assert(rel < 0.06, s"flag $k: approx=$a exact=$n rel=$rel")
    }
  }
}
