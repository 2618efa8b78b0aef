package graft

import org.apache.spark.sql.SparkSession

/** SQL entry surface: registers every engine table as a temp view so the
  * whole operator surface is drivable with literal SQL — the reference's
  * actual client path (MLapp issues raw SQL strings over a connection,
  * SURVEY §2.5/§3.2; `MLapp/MachineLearningApp.dll` per §2.1-S7). The
  * custom expressions (`vec_dot`, `nfc_normalize`) are SQL-visible via
  * `GraftExtensions`, so DataFrame-built and SQL-built plans compile
  * through the same Catalyst pipeline and hit the same optimizations
  * (SqlSurfaceSpec pins result equality on the reference queries).
  *
  * Views resolve through the `Tables` loaders, so source-level fixes
  * (the events ns→µs timestamp normalization) apply identically to both
  * entry styles.
  */
object GraftCatalog {

  /** name → loader, in FIXTURES.md order. */
  val tables: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "region"     -> Tables.region _,
      "nation"     -> Tables.nation _,
      "customer"   -> Tables.customer _,
      "supplier"   -> Tables.supplier _,
      "part"       -> Tables.part _,
      "orders"     -> Tables.orders _,
      "lineitem"   -> Tables.lineitem _,
      "events"     -> Tables.events _,
      "documents"  -> Tables.documents _,
      "embeddings" -> Tables.embeddings _)

  /** Register all tables of `dir` as session temp views. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tables.foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }
}
