package graft.ops

import graft.{GraftQuery, QueryModule, Tables}
import graft.pipeline.{SnapshotStore, Sources}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent KMV cardinality sketches over a `SnapshotStore` — the
  * third persistent-index family beside the IVF vector index (cells)
  * and the BM25 inverted index (term shards): per-group distinct-count
  * state maintained INCREMENTALLY, so "how many distinct keys per
  * group" never rescans history. At 100 TB this is the difference
  * between a nightly full COUNT(DISTINCT) over the lake and folding
  * each ingest batch into ≤k rows per touched group.
  *
  * Layout: one row per (grp, h) with h among the group's k smallest
  * 60-bit md5 key hashes (the `agg_kmv_distinct` sketch, made durable).
  * Rows are content-bucketed by `pmod(hash(grp), shards)` — a group's
  * whole sketch lives in one bucket dir, so maintenance rewrites only
  * TOUCHED groups' buckets and reads prune to them (`readBuckets`,
  * fed by a ≤shards-int bucket list — metadata-class, the VectorIndex
  * probe pattern).
  *
  * Ingest merges the stored sketch of the batch's groups with the
  * batch's hashes and keeps the k smallest per group; displaced rows
  * are TOMBSTONED in the same exactly-once commit. The KMV merge
  * invariance (k-smallest of a union = k-smallest of the union of
  * k-smallest sets, SketchSpec) makes incremental ≡ one-shot — which
  * is precisely what the oracle pins: the DuckDB twin computes the
  * sketch in ONE pass over the full table and the hashes must match.
  * Store versioning gives replay no-ops, CDC, and crash safety for
  * free, and estimates follow the `agg_kmv_distinct` math exactly
  * (one double division, m < k collapses to exact).
  */
object SketchStore extends QueryModule {

  private[graft] val k = 64
  private[graft] val shards = 16
  /** 63·2⁶⁰ — exactly representable; one division per estimate. */
  private val scale = 63.0 * 1152921504606846976.0

  private def hashExpr(keyCol: String) = expr(
    s"CAST(conv(substring(md5(CAST($keyCol AS STRING)), 1, 15), 16, 10) AS BIGINT)")

  private def shardOf(grpCol: String) =
    pmod(hash(col(grpCol)), lit(shards)).cast("int")

  /** Fold one batch of (grp, key) rows into the store at `dir` under
    * `version` (exactly-once: a replayed version no-ops). Only the
    * batch's groups are read, merged, and rewritten — O(delta +
    * touched buckets), never O(store).
    */
  def ingest(s: SparkSession, batch: DataFrame, dir: String,
             version: Long): Unit = {
    val hashed = batch.select(col("grp"), hashExpr("key").as("h")).distinct()
    // ≤shards ints — metadata-class driver action, not a data collect
    val touched = hashed.select(shardOf("grp").as("b")).distinct()
      .collect().map(_.getInt(0)).toSet
    val prev = SnapshotStore.readBuckets(s, dir, touched)
      .map(_.select(col("grp"), col("h")))
      .getOrElse(s.range(0).select(lit("").as("grp"), lit(0L).as("h")))
    // only groups present in THIS batch evolve; co-sharded strangers
    // must not be re-ranked (or worse, tombstoned) by someone else's
    // batch
    val prevTouched = prev.join(hashed.select(col("grp")).distinct(), "grp")
    val merged = prevTouched.union(hashed).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
    // rows ranked past k are evicted — tombstoned in the same commit;
    // a tombstone for a row the store never held merges as a no-op
    val delta = merged
      .withColumn("_op", when(col("rn") <= k, lit("u")).otherwise(lit("d")))
      .select(concat_ws(":", col("grp"), col("h")).as("skey"),
        col("grp"), col("h"), shardOf("grp").as("shard"), col("_op"))
    SnapshotStore.upsertVersion(s, delta, key = "skey", seqCol = None,
      dir = dir, version = version, opCol = Some("_op"),
      bucketCol = Some("shard"), numBuckets = Some(shards))
  }

  /** Per-group estimates from the stored sketches — the read side a
    * dashboard hits instead of COUNT(DISTINCT) over the lake. Reads
    * the ≤k·groups sketch rows only.
    */
  def estimates(s: SparkSession, dir: String): DataFrame =
    SnapshotStore.read(s, dir)
      .getOrElse(sys.error(s"no sketch store at $dir"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("m"), max(col("h")).as("hk"))
      .select(col("grp"), col("m"),
        when(col("m") < k, col("m").cast("double"))
          .otherwise(lit(scale) / col("hk").cast("double"))
          .as("est_distinct"))

  override def queries: Seq[GraftQuery] = Seq(

    // ───── persistent sketch table: build → incremental fold → probe ─────
    // Two deterministic key-split batches fold into the store; the
    // read-back estimate joins the exact answer computed from the raw
    // table. The oracle computes the ONE-SHOT sketch over the full
    // table — the hash gate therefore pins incremental ≡ one-shot
    // (the KMV merge invariance as a value-level contract), estimate
    // math included.
    GraftQuery(
      "agg_sketch_store",
      (s, d) => {
        val dir = Sources.scratch(d, "sketchstore_")
        // versioned store: a re-run in the same JVM would collide below
        // the committed head — start fresh (cheap local scratch)
        new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(new Path(dir), true)
        val rows = Tables.orders(s, d)
          .select(col("o_orderpriority").as("grp"), col("o_custkey").as("key"))
        ingest(s, rows.filter(pmod(col("key"), lit(4)) =!= 0), dir, 1L)
        ingest(s, rows.filter(pmod(col("key"), lit(4)) === 0), dir, 2L)
        val exact = Tables.orders(s, d)
          .groupBy(col("o_orderpriority").as("grp"))
          .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
        estimates(s, dir).join(exact, "grp")
          .select(col("grp"), col("m"), col("est_distinct"),
            col("exact_distinct"))
          .orderBy(col("grp"))
      },
      Some("""
        WITH dk AS (
          SELECT DISTINCT o_orderpriority AS grp, o_custkey FROM orders),
        h AS (
          SELECT DISTINCT grp,
                 ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM dk),
        sk AS (
          SELECT grp, h FROM (
            SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM h) t WHERE rn <= 64),
        per_grp AS (
          SELECT grp, CAST(COUNT(*) AS BIGINT) AS m,
                 CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE (63.0 * 1152921504606846976.0) / CAST(MAX(h) AS DOUBLE)
                 END AS est_distinct
          FROM sk GROUP BY grp),
        ex AS (
          SELECT o_orderpriority AS grp,
                 COUNT(DISTINCT o_custkey) AS exact_distinct
          FROM orders GROUP BY o_orderpriority)
        SELECT grp, m, est_distinct, exact_distinct
        FROM per_grp JOIN ex USING (grp)
        ORDER BY grp
      """))
  )
}
