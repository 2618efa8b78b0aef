package graft

import org.apache.spark.sql.functions._

/** The injected LevenshteinLengthGuard rule: fires on bounded
  * edit-distance filters, adds only an implied conjunct (results
  * unchanged), and stays idempotent. Frames come from parquet, not
  * literals — ConvertToLocalRelation would otherwise evaluate the
  * filter away before the assertion.
  */
class OptimizerRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = scratchDir("optrule")
    Seq(
      (0L, "abc", "abd"),       // lev 1, lengths equal
      (1L, "abc", "abcdefgh"),  // lev 5, length diff 5 — guard prunes at k=2
      (2L, "same", "same"),
      (3L, "x", "abcdefghijklmnopqrstuvwxyz012345")) // lev 31
      .toDF("id", "a", "b")
      .write.mode("overwrite").parquet(s"$d/pairs.parquet")
    d
  }

  private def frame = spark.read.parquet(s"$dir/pairs.parquet")

  test("rule injects the length-difference guard into the optimized plan") {
    val df = frame.filter(levenshtein($"a", $"b") <= 2)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((length(a"), optimized)
    assert(optimized.contains("levenshtein"), optimized)
  }

  test("results are unchanged by the rewrite") {
    val rows = frame.filter(levenshtein($"a", $"b") <= 2)
      .select($"id").as[Long].collect().toSet
    assert(rows === Set(0L, 2L))
  }

  test("bounded (thresholded) levenshtein is NOT rewritten") {
    // levenshtein(a, b, 5) returns -1 above the bound, which passes
    // `<= 10`; injecting the length guard would wrongly drop row 3
    val df = frame.filter(levenshtein($"a", $"b", 5) <= 10)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("abs((length(a"), optimized)
    val rows = df.select($"id").as[Long].collect().toSet
    assert(rows === Set(0L, 1L, 2L, 3L), "sentinel -1 rows must survive")
  }

  test("rule is idempotent (no double guard)") {
    val df = frame.filter(
      abs(length($"a") - length($"b")) <= 2 && levenshtein($"a", $"b") <= 2)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("abs\\(\\(length\\(a".r.findAllIn(optimized).size === 1, optimized)
  }
}
