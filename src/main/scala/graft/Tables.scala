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
  /** `events.ts` arrives as one of two physical types depending on how the
    * parquet was written: TIMESTAMP(NANOS) (which Spark 4 won't map to
    * TimestampType directly — with `spark.sql.legacy.parquet.nanosAsLong=true`
    * it scans as epoch-nanos LongType) or plain TIMESTAMP(MICROS) (ordinary
    * TimestampType). Branch on the SCANNED dtype: truncate ns→µs (integer
    * `div`, matching DuckDB) only when the scan produced a Long; otherwise
    * the column is already the timestamp every downstream operator expects.
    * An unconditional rewrite fails analysis the moment the data layout
    * changes underneath us — exactly what a lake engine must absorb.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // µs parquet with isAdjustedToUTC=false scans as TIMESTAMP_NTZ;
        // session TZ is pinned UTC (GraftSession), so this cast is
        // value-preserving and downstream sees one uniform TimestampType.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
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
