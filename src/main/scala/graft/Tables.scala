package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All engine operators are pure functions over these tables; at 100 TB the
  * same code reads `s3a://...` prefixes instead of a local dir — only the
  * path changes. Parquet scans get column pruning + predicate pushdown from
  * Catalyst for free, so loaders return the raw scan and let each query
  * project/filter (visible in the plan as `ReadSchema`/`PushedFilters`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 won't map to
    * TimestampType directly; with `spark.sql.legacy.parquet.nanosAsLong=true`
    * it arrives as epoch-nanos LongType. Truncate to microseconds (integer
    * `div`, matching DuckDB's ns→µs truncation) and expose TimestampType so
    * every downstream operator sees normal timestamp semantics.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One registered engine operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle twin used by the
  * driver's correctness gate. `oracle == None` → driver records a weaker
  * rows-only check (used for hash-family-dependent ops like MinHash).
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def queries: Seq[GraftQuery]
}
