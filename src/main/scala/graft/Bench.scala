package graft

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR
  * (default sf0.1) and prints ONE JSON line for the driver's BENCH_r{N}.
  *
  * Timing action is a noop-sink write (`format("noop")`), which fully
  * materializes every operator: under round 1's `.count()`, Catalyst's
  * EliminateSorts deleted the global sort being measured and column
  * pruning removed all scalar projections, so ~6 of 31 timings measured
  * nothing. The noop sink consumes every row of every column downstream
  * of the complete plan, with zero sink-side cost.
  *
  * Warm-up is a real parquet scan + shuffle over the bench data (not
  * `spark.range`), so the first measured query doesn't pay filesystem
  * metadata, parquet footer reads, or shuffle-machinery initialization.
  *
  * Failures are reported in an `errors` field (name → exception class),
  * never silently recorded as a timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // prime: parquet scan + shuffle + noop sink, not part of any timing
    materialize(
      Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag").count())

    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // isolate queries: release the previous query's checkpoint blocks
      // (freed via ContextCleaner on GC) so its heap churn isn't billed
      // to the next query
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { materialize(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          errors ::= (name -> e.getClass.getSimpleName)
          false
        }
        finally Materialize.releaseAll() // free this query's staged cache
      // a failed query records -1, never its partial elapsed time
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Round to ms so the JSON line stays small: the round-2 artifact was
    // truncated by the driver's finite output capture, losing the head of
    // one long full-precision line (total + first ~7 queries).
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val errs = errors.reverse.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val good = results.filter(_._2 >= 0)
    val total = if (good.nonEmpty) good.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // Survive any finite head/tail output capture: persist the full JSON
    // to a file, print it once up front, and re-print it as the very last
    // line of the process (after spark.stop(), so no shutdown log noise
    // can land between it and EOF and eat the capture budget).
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_FULL.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
    println(line)
  }
}
