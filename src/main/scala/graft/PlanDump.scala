package graft

/** Dump `.explain("formatted")` for named registry queries to files —
  * the optimization rounds' evidence trail (plans/r{N}/<query>_{before,
  * after}.txt). Construction-time driver actions (iterative fixpoints,
  * cost-dispatch stats) run exactly as in Verify/Bench, so the dumped
  * plan is the one the timed run executes (for iterative operators:
  * the final round's truncated plan, by design).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [names...]
  * (no names = every registered query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <sfDir> <outDir> <suffix> [queryName...]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names =
      if (args.length > 3) args.drop(3).toSeq else SparkEntry.queries.keys.toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.get()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.sorted.foreach { name =>
      val txt =
        try Materialize.scoped {
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable =>
          s"EXPLAIN FAILED: ${e.getClass.getName}: ${e.getMessage}"
        }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
