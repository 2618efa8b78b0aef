package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the Selection module beyond the DuckDB oracle:
  * properties the value compare can't see (split stability under corpus
  * change, chunk coverage/overlap, quantization error bounds, importance
  * direction).
  */
class SelectionSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfTiny)

  test("curate_split: assignment is a pure function of doc_id (stable under corpus subsetting)") {
    val full = q("curate_split").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // recompute on an arbitrary half of the corpus: every doc that
    // remains must keep its split — the property that makes eval sets
    // immune to re-ingestion and corpus growth
    val half = Tables.documents(spark, sfTiny).filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .select(col("doc_id"),
        when(col("h") < "c", "train").when(col("h") < "e", "val")
          .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(half.nonEmpty)
    half.foreach { case (id, s) => assert(full(id) == s, s"doc $id migrated") }
    // all three splits are populated and train dominates (75/12.5/12.5
    // expected; tolerate small-corpus noise)
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("curate_global_index: indexes are exactly 0..n-1, ordered by the md5 shuffle key") {
    val rows = q("curate_global_index").collect()
    val idx = rows.map(_.getLong(1)).sorted
    assert(idx.toSeq == (0L until rows.length.toLong))
    // order agrees with a driver-side sort of the md5 keys
    val expected = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .sorted.map(_._2).zipWithIndex.toMap
    rows.foreach(r =>
      assert(r.getLong(1) == expected(r.getLong(0)).toLong))
  }

  test("text_chunk_windows: chunks tile every token, strides are uniform, short docs chunk whole") {
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = q("text_chunk_windows").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = docs(id).toLong
      val sorted = cs.sortBy(_._2)
      // starts are 0, 24, 48, …; last chunk reaches the end exactly
      sorted.zipWithIndex.foreach { case ((_, cid, start, len), i) =>
        assert(cid == i.toLong && start == i * 24L)
        assert(len == math.min(32L, n - start))
      }
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == n, s"doc $id not fully tiled")
      // every non-final chunk is the full window (tiling has no holes:
      // window 32 > stride 24)
      sorted.dropRight(1).foreach { case (_, _, _, len) => assert(len == 32L) }
      if (n <= 32) assert(sorted.length == 1)
    }
  }

  test("sim_quantize_int8: codes bounded, error within one quantization step") {
    val rows = q("sim_quantize_int8").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val mx = r.getDouble(1)
      val codes = r.getString(2).split(",").map(_.toInt)
      val maxErr = r.getDouble(3)
      assert(codes.forall(c => c >= -128 && c <= 127))
      // floor quantization: reconstruction error < one step = mx/127
      assert(maxErr <= mx / 127.0 + 1e-12,
        s"vec ${r.getLong(0)}: err $maxErr exceeds step ${mx / 127.0}")
      if (mx == 0.0) assert(codes.forall(_ == 0) && maxErr == 0.0)
    }
  }

  test("curate_importance_sample: target-language docs are overrepresented in the kept slice") {
    val kept = q("curate_importance_sample")
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), (col("lang") === "en").as("t")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val corpusShare = docs.values.count(identity).toDouble / docs.size
    val keptDocs = keptIds.filter(docs.contains)
    val keptShare = keptDocs.count(docs).toDouble / keptDocs.size
    assert(keptShare > corpusShare,
      s"kept en-share $keptShare not above corpus share $corpusShare")
  }

  test("text_collocations: reported counts are real corpus counts and lift is their exact ratio") {
    val rows = q("text_collocations").collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sfTiny)
      .select(split(col("text"), " ").as("t")).collect()
      .map(_.getSeq[String](0))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = toks.map(_.size.toLong).sum
    val big = toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val (x, y) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == big((x, y)) && r.getLong(2) >= 5)
      assert(r.getLong(3) == uni(x) && r.getLong(4) == uni(y))
      assert(r.getDouble(5) ==
        (total * r.getLong(2)).toDouble / (r.getLong(3) * r.getLong(4)).toDouble)
    }
    // ranked by lift descending
    val lifts = rows.map(_.getDouble(5))
    assert(lifts.zip(lifts.drop(1)).forall { case (a, b) => a >= b })
  }
}
