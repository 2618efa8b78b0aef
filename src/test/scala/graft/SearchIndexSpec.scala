package graft

import graft.ops.SearchIndex
import graft.pipeline.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index semantics: shard-pruned probes, incremental ingest /
  * delete convergence to a fresh build, stats-sidecar lockstep, and the
  * streaming CDC maintainer's exactly-once replay.
  */
class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame = Tables.documents(spark, sfTiny)
    .select(col("doc_id"), col("text"))

  private val terms = Seq("join", "filter", "group")

  private def probeRows(dir: String): Seq[(Long, Double)] =
    SearchIndex.probe(spark, dir, terms)
      .select(col("doc_id"), col("bm25")).as[(Long, Double)]
      .collect().toSeq

  test("probe reads only the query terms' shard dirs") {
    val dir = scratchDir("si_prune") + "/idx"
    SearchIndex.build(spark, docs, dir)
    val shardIds = terms.toDF("term")
      .select(pmod(hash(col("term")), lit(16))).as[Int].collect().toSet
    val touched = SearchIndex.probe(spark, dir, terms).inputFiles
      .filterNot(_.contains("/_stats/")) // the 2-row sidecar, not postings
      .filter(_.contains("_bucket="))
      .map(_.replaceAll(".*_bucket=(\\d+).*", "$1").toInt).toSet
    assert(touched.nonEmpty && touched.subsetOf(shardIds),
      s"probe touched shards $touched, query terms own $shardIds")
  }

  test("incremental ingest and delete converge to a fresh build") {
    val incDir = scratchDir("si_inc") + "/idx"
    SearchIndex.build(spark, docs.filter(col("doc_id") % 4 =!= 3), incDir)
    SearchIndex.ingest(spark, docs.filter(col("doc_id") % 4 === 3), incDir)
    val oneDir = scratchDir("si_one") + "/idx"
    SearchIndex.build(spark, docs, oneDir)
    assert(probeRows(incDir) == probeRows(oneDir),
      "ingest must converge to the one-shot index")

    // delete the currently top-ranked doc: it must vanish from the
    // probe, and the whole index must equal a build without it
    val topDoc = probeRows(incDir).head._1
    SearchIndex.remove(spark, docs.filter(col("doc_id") === topDoc), incDir)
    val lessDir = scratchDir("si_less") + "/idx"
    SearchIndex.build(spark, docs.filter(col("doc_id") =!= topDoc), lessDir)
    assert(probeRows(incDir) == probeRows(lessDir),
      "delete must converge to a build without the doc")
    assert(!probeRows(incDir).exists(_._1 == topDoc))
  }

  test("streaming CDC maintainer is exactly-once under replay") {
    val dir  = scratchDir("si_stream") + "/idx"
    val ckpt = scratchDir("si_stream_ckpt") + "/cp"
    val land = scratchDir("si_stream_land")

    SearchIndex.build(spark, docs.filter(col("doc_id") % 4 =!= 3), dir)
    val v0 = SnapshotStore.latestVersion(spark, dir).get

    // batch: add the held-out quarter, delete one doc already indexed
    val delDoc = docs.filter(col("doc_id") % 4 =!= 3)
      .select(min(col("doc_id"))).as[Long].head()
    docs.filter(col("doc_id") % 4 === 3).withColumn("op", lit("u"))
      .unionByName(docs.filter(col("doc_id") === delDoc)
        .withColumn("op", lit("d")))
      .write.mode("overwrite").parquet(s"$land/b0")
    def run(): Unit = graft.streaming.StreamingPipeline.runSearchIndexIngest(
      spark,
      spark.readStream.schema("doc_id BIGINT, text STRING, op STRING")
        .parquet(s"$land/*"), dir, ckpt, opCol = Some("op"))
      .awaitTermination()
    run()
    assert(SnapshotStore.latestVersion(spark, dir).contains(v0 + 1))
    run() // replay with no new files: nothing recommits
    assert(SnapshotStore.latestVersion(spark, dir).contains(v0 + 1))

    val wantDir = scratchDir("si_stream_want") + "/idx"
    SearchIndex.build(spark, docs.filter(col("doc_id") =!= delDoc), wantDir)
    assert(probeRows(dir) == probeRows(wantDir))
  }

  test("mid-stream schema change: a widened CDC feed leaves the index correct") {
    val dir  = scratchDir("si_evolve") + "/idx"
    val ckpt = scratchDir("si_evolve_ckpt") + "/cp"
    val land = scratchDir("si_evolve_land")

    SearchIndex.build(spark, docs.filter(col("doc_id") % 4 === 0), dir)

    // run 1: the original (doc_id, text) feed
    docs.filter(col("doc_id") % 4 === 1)
      .write.mode("overwrite").parquet(s"$land/b0")
    graft.streaming.StreamingPipeline.runSearchIndexIngest(
      spark,
      spark.readStream.schema("doc_id BIGINT, text STRING")
        .parquet(s"$land/*"), dir, ckpt).awaitTermination()

    // the upstream feed gains columns (a lang tag, a source id);
    // restart against the SAME checkpoint with the wider schema — the
    // maintainer's fixed projection must absorb them and the index must
    // converge to a fresh build over the union of texts
    docs.filter(col("doc_id") % 4 >= 2)
      .withColumn("lang", lit("en"))
      .withColumn("src_id", col("doc_id") % 10)
      .write.mode("overwrite").parquet(s"$land/b1")
    graft.streaming.StreamingPipeline.runSearchIndexIngest(
      spark,
      spark.readStream
        .schema("doc_id BIGINT, text STRING, lang STRING, src_id BIGINT")
        .parquet(s"$land/*"), dir, ckpt).awaitTermination()

    val wantDir = scratchDir("si_evolve_want") + "/idx"
    SearchIndex.build(spark, docs, wantDir)
    assert(probeRows(dir) == probeRows(wantDir))
  }

  test("streamed chunk-level index equals a batch build over batch chunks") {
    // docs stream → chunkedDocs (the streaming RAG splitter) → inverted
    // index keyed by chunk: the full retrieval-ingest composition. The
    // streamed result must equal building the index from BATCH-chunked
    // docs in one shot — stream/batch chunking parity plus exactly-once
    // ingest, end to end.
    val dir  = scratchDir("si_chunk") + "/idx"
    val ckpt = scratchDir("si_chunk_ckpt") + "/cp"
    val land = scratchDir("si_chunk_land")
    val subset = docs.filter(col("doc_id") < 100)

    subset.write.mode("overwrite").parquet(s"$land/b0")
    val chunkStream = graft.streaming.StreamingPipeline.chunkedDocs(
        spark.readStream.schema("doc_id BIGINT, text STRING")
          .parquet(s"$land/*"))
      .select(col("chunk_key").as("doc_id"), col("chunk_text").as("text"))
    // seed the index empty (build needs a frame; zero rows is fine)
    SearchIndex.build(spark, docs.limit(0), dir)
    graft.streaming.StreamingPipeline.runSearchIndexIngest(
      spark, chunkStream, dir, ckpt).awaitTermination()

    val wantDir = scratchDir("si_chunk_want") + "/idx"
    SearchIndex.build(spark,
      graft.streaming.StreamingPipeline.chunkedDocs(subset)
        .select(col("chunk_key").as("doc_id"), col("chunk_text").as("text")),
      wantDir)
    assert(probeRows(dir) == probeRows(wantDir))
    assert(probeRows(dir).nonEmpty)
  }

  test("stats sidecar tracks signed doc/token totals") {
    val dir = scratchDir("si_stats") + "/idx"
    val four = docs.limit(0).unionByName(
      Seq((1L, "a b c"), (2L, "a"), (3L, ""), (4L, "x y"))
        .toDF("doc_id", "text"))
    SearchIndex.build(spark, four, dir)
    def stats(): Map[String, Long] =
      SnapshotStore.read(spark, s"$dir/_stats").get
        .as[(String, Long)].collect().toMap
    assert(stats() == Map("n" -> 4L, "tot" -> 6L)) // empty doc counts in n
    SearchIndex.remove(spark,
      Seq((1L, "a b c")).toDF("doc_id", "text"), dir)
    assert(stats() == Map("n" -> 3L, "tot" -> 3L))
  }
}
