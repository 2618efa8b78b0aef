package graft

import org.apache.spark.sql.functions.col

/** The driver contract: every registered query must resolve, execute,
  * and (where an oracle exists) be SQL-expressible. Row-level parity is
  * the driver's DuckDB gate (tools/check.py); this suite guards the
  * Scala side so a broken plan never reaches it.
  */
class QueryRegistrySpec extends SparkSpec {

  test("query names are unique across modules") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Queries with legitimately data-dependent emptiness at tiny SF.
  private val mayBeEmpty = Set(
    "join_anti_not_exists", "set_except", "ref_watermark_filter",
    "dedup_ngram_jaccard", "dedup_minhash", "dedup_simhash",
    // k = 20 sits at sf0.01's degeneracy edge; the 200-part sf0.001
    // graph dissolves entirely (6 peel rounds to the empty fixpoint)
    "graph_k_core",
    // rides dedup_minhash's pair relation, empty whenever that is
    "curate_source_overlap")

  for (q <- SparkEntry.all) {
    test(s"${q.name}: plan executes at sf0.001") {
      val df = q.fn(spark, sfTiny)
      assert(df.schema.nonEmpty, "schema must resolve")
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("every oracle references only columns the Spark result emits") {
    // cheap structural guard: oracle column aliases are checked by the
    // driver; here just assert every oracle is non-empty, single-line
    // normalizable SQL (Verify.normalize collapses newlines).
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name oracle empty")
      assert(!sql.contains("--"), s"$name oracle has a line comment, which " +
        "breaks Verify's newline collapsing")
    }
  }
}
