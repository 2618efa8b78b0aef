package graft

import org.apache.spark.sql.functions._

/** Generates a scaled synthetic corpus for scaling-curve measurements
  * (SCALE.md): replicates documents/embeddings FACTOR× with
  * deterministic per-replica perturbations chosen so the statistical
  * shape of the workload is preserved — the point is to measure how the
  * ENGINE scales, not to manufacture a quadratically harder problem:
  *
  *  - documents: replica k suffixes every token with `_k` (replica 0 is
  *    the original corpus verbatim). Token counts, shingle structure,
  *    and the intra-replica duplicate rate are identical to the source;
  *    cross-replica shingle overlap is ZERO, so the near-dup pair
  *    density per document stays CONSTANT as volume grows — the same
  *    property a real 10× crawl has (10× docs ≈ 10× dup pairs, not
  *    45×, which is what naive replication would produce by making
  *    every doc a 10-way near-dup of its own copies).
  *  - embeddings: replica k shifts the label space (`label + 10000·k`),
  *    holding vectors-per-IVF-cell constant — matching the production
  *    practice of scaling the cell count with the corpus, and keeping
  *    the blocked kNN/ANN join linear rather than quadratic in FACTOR —
  *    and perturbs each component with deterministic sinusoidal noise
  *    (±0.05, ~half the typical component magnitude). Unperturbed
  *    replicas would be bit-identical vectors, which collapse into the
  *    SAME sign-random-projection LSH buckets and manufacture a
  *    quadratic candidate blowup no real corpus has (exact-duplicate
  *    vectors are removed by exact dedup long before ANN runs).
  *
  *  - events/orders/lineitem: replica k re-keys ids (`id·F + k`, with
  *    foreign keys re-keyed identically so joins stay consistent) and
  *    shifts the user/part/supplier spaces so per-key row density stays
  *    constant — the layout/sink family (`sink_compaction`,
  *    `sink_clustered_write`, `sink_upsert_merge`) measures against
  *    genuinely 10× relational volume, not 10×-hot keys.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> [factor=10] [skew]
  * (Pair with Bench's SPARK_GRAFT_BENCH_ONLY to run a family.)
  *
  * The optional `skew` flag deliberately BREAKS the balanced-cell
  * embedding contract instead of preserving it: 70% of the replicated
  * vectors are rewritten into one dominant cluster (unit direction 0
  * plus small deterministic sinusoidal jitter), so a single IVF cell
  * absorbs most of the corpus — the adversarial distribution for
  * measuring that the `ivfCellCap` knob bounds candidate volume when
  * clustering assumptions fail (SCALE.md's skew row).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val (src, out, factor, skew) = args.toSeq match {
      case Seq(s, o)            => (s, o, 10, false)
      case Seq(s, o, f)         => (s, o, f.toInt, false)
      case Seq(s, o, f, "skew") => (s, o, f.toInt, true)
      case _ => sys.error("usage: ScaleGen <srcSfDir> <outDir> [factor] [skew]")
    }
    val spark = GraftSession.get()
    val reps = spark.range(0, factor).select(col("id").cast("int").as("k"))

    Tables.documents(spark, src)
      .crossJoin(broadcast(reps)) // k is FACTOR rows — a true broadcast
      .select(
        (col("doc_id") * factor + col("k")).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("k"))), " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val scaledEmb = Tables.embeddings(spark, src)
      .crossJoin(broadcast(reps))
      .select(
        (col("vec_id") * factor + col("k")).as("vec_id"),
        when(col("k") === 0, col("embedding")).otherwise(
          expr("""transform(embedding, (x, i) ->
            cast(x + sin(cast(vec_id * 131 + k * 17 + i AS DOUBLE)) * 0.05d AS FLOAT))"""))
          .as("embedding"),
        (col("label") + col("k") * 10000).as("label"))
    val outEmb =
      if (!skew) scaledEmb
      else scaledEmb.select(
        col("vec_id"),
        // 70% of vectors collapse into ONE dominant cluster: unit
        // direction 0 + jitter an order of magnitude below the spike,
        // so their nearest seed is shared and one IVF cell goes hot
        when(col("vec_id") % 10 < 7,
          expr("""transform(embedding, (x, i) ->
            cast((CASE WHEN i = 0 THEN 1.0d ELSE 0.0d END)
              + sin(cast(vec_id * 131 + i AS DOUBLE)) * 0.02d AS FLOAT))"""))
          .otherwise(col("embedding")).as("embedding"),
        col("label"))
    outEmb
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events read RAW (ts stays an epoch-ns long on disk, the shape
    // Tables.events normalizes); user space grows with the corpus so
    // per-user event density — what sessionization/window state is
    // keyed on — stays constant
    Tables.table(spark, src, "events")
      .crossJoin(broadcast(reps))
      .select(
        (col("event_id") * factor + col("k")).as("event_id"),
        col("ts"),
        (col("user_id") + col("k") * 10000000L).as("user_id"),
        col("event_type"), col("value"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    Tables.orders(spark, src)
      .crossJoin(broadcast(reps))
      .select(
        (col("o_orderkey") * factor + col("k")).as("o_orderkey"),
        (col("o_custkey") + col("k") * 10000000L).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // customer re-keys c_custkey in lockstep with orders' o_custkey so
    // the fact→dim join stays consistent; nation keys are shared
    // dimensions and stay as-is (per-nation density grows with the
    // corpus, like a real 10× book of business)
    Tables.customer(spark, src)
      .crossJoin(broadcast(reps))
      .select(
        (col("c_custkey") + col("k") * 10000000L).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    Tables.lineitem(spark, src)
      .crossJoin(broadcast(reps))
      .select(
        (col("l_orderkey") * factor + col("k")).as("l_orderkey"),
        (col("l_partkey") + col("k") * 10000000L).as("l_partkey"),
        (col("l_suppkey") + col("k") * 10000000L).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // part re-keys p_partkey in lockstep with lineitem's l_partkey;
    // descriptive columns (brand etc.) repeat, so per-brand density
    // grows with the corpus like the other shared dimensions
    Tables.part(spark, src)
      .crossJoin(broadcast(reps))
      .select(
        (col("p_partkey") + col("k") * 10000000L).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    println(s"[scalegen] wrote ${factor}x corpus to $out")
    spark.stop()
  }
}
