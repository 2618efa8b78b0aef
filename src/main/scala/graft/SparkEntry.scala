package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the §2.8 extensions)
  * registers here as a named query; those with ANSI-SQL-expressible
  * semantics also carry a DuckDB oracle twin. Column names are aliased
  * identically on both sides (driver compare sorts columns by name).
  */
object SparkEntry {

  /** All operator modules contributing queries. */
  def modules: Seq[QueryModule] = Seq(
    ops.Parity,
    ops.Joins,
    ops.Analytics,
    ops.Dedup,
    ops.Curation,
    ops.Selection,
    ops.TextAnalysis,
    ops.Similarity,
    ops.VectorIndex,
    ops.SearchIndex,
    ops.SketchStore,
    ops.Multimodal,
    ops.Advanced,
    ops.Extras,
    ops.Graph,
    ops.Learning,
    pipeline.Sources,
    pipeline.Layout
  )

  def all: Seq[GraftQuery] = {
    val qs = modules.flatMap(_.queries)
    val dups = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty,
      s"duplicate query name(s) across modules: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
