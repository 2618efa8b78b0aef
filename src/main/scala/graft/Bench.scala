package graft

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR
  * (default sf0.1) and prints ONE JSON line for the driver's BENCH_r{N}.
  * Timing = full plan execution via `.count()` after a warm-up of the
  * session (first query pays JIT/codegen warmup; we run a tiny priming
  * job first so per-query numbers reflect the plans, not JVM startup).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // prime: JIT + filesystem metadata, not part of any timing
    spark.range(1000000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
