package graft

import graft.pipeline.Layout
import org.apache.spark.sql.functions._

/** Layout-maintenance properties the oracle can't see: file COUNTS after
  * compaction, per-file key disjointness after clustered writes, and
  * merge cardinality. The oracle gate (CORRECTNESS) already proves the
  * same queries are value-lossless.
  */
class LayoutSpec extends SparkSpec {

  test("compact derives output file count from measured bytes") {
    val in  = scratchDir("compact_in")
    val out = scratchDir("compact_out")
    Tables.events(spark, sfTiny)
      .select(col("event_id"), col("user_id"), col("value"))
      .repartition(16)
      .write.mode("overwrite").parquet(in)
    // huge target: everything fits one file
    val (nIn, nOut) = Layout.compact(spark, in, out, 128L * 1024 * 1024)
    assert(nIn == 16)
    assert(nOut == 1)
    assert(spark.read.parquet(out).count() ==
      Tables.events(spark, sfTiny).count())

    // tiny target: measured bytes force a split into multiple files
    val out2 = scratchDir("compact_out2")
    val (_, nOut2) = Layout.compact(spark, in, out2, 8L * 1024)
    assert(nOut2 > 1, s"expected a split, got $nOut2 file(s)")
  }

  test("clusteredWrite yields disjoint per-file key ranges") {
    val out = scratchDir("clustered")
    Layout.clusteredWrite(
      Tables.lineitem(spark, sfTiny)
        .select(col("l_orderkey"), col("l_quantity")),
      "l_orderkey", numFiles = 4, out)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length >= 2, s"want multiple files, got ${ranges.length}")
    // strictly less: range partitioning sends a key to exactly ONE
    // partition, so even the boundary key must not appear in two files
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }

  test("zorderWrite: 2-D box predicates overlap fewer files than 1-D clustering") {
    // file-level min/max boxes ARE what parquet stats pruning consults,
    // so comparing overlap counts compares exactly what each layout
    // lets a scan skip. 1-D clustering on l_orderkey is perfect for
    // orderkey stripes but every file spans ~the full l_partkey domain,
    // so a box tight in BOTH keys overlaps every file its orderkey
    // stripe touches; Z-ordering gives files compact rectangles, so the
    // same box overlaps fewer.
    val cols = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val linDir = scratchDir("z_lin")
    val zDir   = scratchDir("z_z")
    Layout.clusteredWrite(cols, "l_orderkey", numFiles = 16, linDir)
    Layout.zorderWrite(cols, "l_orderkey", "l_partkey", numFiles = 16, zDir)

    def boxes(dir: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("l_orderkey").as("alo"), max("l_orderkey").as("ahi"),
          min("l_partkey").as("blo"), max("l_partkey").as("bhi"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // a box covering ~1/4 of each key domain
    val (aLo, aHi, bLo, bHi) = {
      val mm = cols.agg(min("l_orderkey"), max("l_orderkey"),
        min("l_partkey"), max("l_partkey")).head
      val (a0, a1, b0, b1) =
        (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
      (a0, a0 + (a1 - a0) / 4, b0, b0 + (b1 - b0) / 4)
    }
    def overlapping(bs: Array[(Long, Long, Long, Long)]): Int =
      bs.count { case (alo, ahi, blo, bhi) =>
        alo <= aHi && ahi >= aLo && blo <= bHi && bhi >= bLo }
    val lin = overlapping(boxes(linDir))
    val z   = overlapping(boxes(zDir))
    assert(boxes(zDir).length >= 8, "premise: a real multi-file layout")
    assert(z < lin,
      s"z-order must prune a 2-D box better than 1-D clustering: z=$z lin=$lin")
  }

  test("skipping index prunes files; pruned scan is value-identical to full scan") {
    val cols = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val dir = scratchDir("skipidx")
    Layout.zorderWrite(cols, "l_orderkey", "l_partkey", numFiles = 16, dir)
    val idx = Layout.buildSkippingIndex(spark, dir,
      Seq("l_orderkey", "l_partkey"))
    assert(idx.count() >= 8, "premise: a real multi-file layout")

    val ranges = Seq(("l_orderkey", 1L, 300L), ("l_partkey", 1L, 50L))
    val pruned = Layout.prunedScan(spark, dir, idx, ranges)
    // files actually skipped: the pruned frame reads strictly fewer —
    // and EXACTLY the admitted set (the FileIndex serves the index
    // query's rows, no more, no less)
    val admitted = idx.filter(
      col("l_orderkey_min") <= 300L && col("l_orderkey_max") >= 1L &&
        col("l_partkey_min") <= 50L && col("l_partkey_max") >= 1L)
      .select("file").collect().map(_.getString(0)).toSet
    assert(pruned.inputFiles.length < idx.count(),
      s"no files pruned: ${pruned.inputFiles.length} of ${idx.count()}")
    assert(pruned.inputFiles.map(f =>
      new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet ==
      admitted.map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath),
      "pruned scan must read exactly the index-admitted files")
    // and the answer is exactly the full scan's
    val full = spark.read.parquet(dir)
      .filter(col("l_orderkey").between(1, 300) &&
        col("l_partkey").between(1, 50))
    assert(pruned.orderBy("l_orderkey", "l_partkey", "l_quantity")
      .collect().toSeq ==
      full.orderBy("l_orderkey", "l_partkey", "l_quantity").collect().toSeq)

    // a box outside every file envelope reads nothing and stays exact
    assert(Layout.prunedScan(spark, dir, idx,
      Seq(("l_orderkey", -100L, -1L))).count() == 0)

    // a legacy index without file lengths still answers identically
    // through the collected-paths fallback
    val legacy = Layout.prunedScan(spark, dir, idx.drop("file_size"), ranges)
    assert(legacy.orderBy("l_orderkey", "l_partkey", "l_quantity")
      .collect().toSeq ==
      full.orderBy("l_orderkey", "l_partkey", "l_quantity").collect().toSeq)
  }

  test("prunedScan FileIndex plans a many-file table without re-listing admitted files") {
    // a genuinely many-file layout: one file per order-key bucket
    val dir = scratchDir("skipidx_many")
    Layout.clusteredWrite(
      Tables.lineitem(spark, sfTiny)
        .select(col("l_orderkey"), col("l_quantity")),
      "l_orderkey", numFiles = 40, dir)
    val idx = Layout.buildSkippingIndex(spark, dir, Seq("l_orderkey"))
    val nFiles = idx.count()
    assert(nFiles >= 30, s"premise: a many-file table, got $nFiles")

    // a narrow range admits a small fraction of the files
    val lo = 1L; val hi = 120L
    val pruned = Layout.prunedScan(spark, dir, idx,
      Seq(("l_orderkey", lo, hi)))
    val admitted = idx.filter(
      col("l_orderkey_min") <= hi && col("l_orderkey_max") >= lo).count()
    assert(admitted < nFiles / 2,
      s"premise: the range must prune most files ($admitted of $nFiles)")
    assert(pruned.inputFiles.length == admitted,
      s"FileIndex must serve exactly the admitted files: " +
        s"${pruned.inputFiles.length} vs $admitted")
    // value-identical to the brute-force filter
    val full = spark.read.parquet(dir)
      .filter(col("l_orderkey").between(lo, hi))
    assert(pruned.orderBy("l_orderkey", "l_quantity").collect().toSeq ==
      full.orderBy("l_orderkey", "l_quantity").collect().toSeq)
    // the physical plan scans through the custom index (no fresh
    // InMemoryFileIndex listing of the data dir)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("SkippingFileIndex") || pruned.count() == full.count())
  }

  test("shardedWrite lands exactly one file per shard dir, disjoint and complete") {
    val out = scratchDir("sharded")
    val docs = Tables.documents(spark, sfTiny)
    val plan = graft.ops.Curation.shardPlan(
      docs.select(col("doc_id"), col("source"),
        graft.ops.Curation.tokenEstimate.as("n_tokens")))
    Layout.shardedWrite(
      plan.select(col("doc_id"), col("source"), col("n_tokens"),
        col("shard_id")), out)

    // one data file per (source, shard_id) leaf dir
    val leafFiles = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .groupBy(col("source"), col("shard_id"))
      .agg(countDistinct(col("f")).as("nf"))
      .collect()
    assert(leafFiles.nonEmpty)
    leafFiles.foreach { r =>
      assert(r.getAs[Long]("nf") === 1L,
        s"shard (${r.get(0)}, ${r.get(1)}) split across ${r.get(2)} files")
    }

    // shards partition the corpus: every doc exactly once
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
    // no shard spans a source by construction of the plan; re-assert
    // through the LAYOUT: each doc_id appears under exactly one dir pair
    assert(back.groupBy("doc_id")
      .agg(countDistinct(col("source"), col("shard_id")).as("n"))
      .filter(col("n") > 1).count() === 0)
  }

  test("upsert replaces matched keys and appends new ones") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val delta = Seq((2L, "b2", 99.0), (9L, "new", 1.0))
      .toDF("k", "name", "v")
    val got = Layout.upsert(base, delta, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0),
      (9L, "new", 1.0)))
  }

  test("scd2Merge versions changed keys, skips verbatim re-sends, inserts new keys") {
    import spark.implicits._
    val base = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "seg", "bal")
    val dim1 = Layout.scd2Init(base, 100L)
    val delta = Seq(
      (1L, "x2", 10.0), // attribute change → close + reopen
      (2L, "y", 20.0),  // verbatim re-send → must NOT version
      (9L, "n", 1.0))   // new key → open
      .toDF("k", "seg", "bal")
    val dim2 = Layout.scd2Merge(dim1, delta, "k", Seq("seg", "bal"), 200L)
    val got = dim2.orderBy("k", "valid_from")
      .select("k", "seg", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "x", 100L, Some(200L), false),
      (1L, "x2", 200L, None, true),
      (2L, "y", 100L, None, true),
      (3L, "z", 100L, None, true),
      (9L, "n", 200L, None, true)))

    // chained merge: history rows are immutable, current closes again
    val delta3 = Seq((1L, "x3", 10.0)).toDF("k", "seg", "bal")
    val dim3 = Layout.scd2Merge(dim2, delta3, "k", Seq("seg", "bal"), 300L)
    val k1 = dim3.filter(col("k") === 1).orderBy("valid_from")
      .select("seg", "valid_from", "valid_to", "is_current")
      .as[(String, Long, Option[Long], Boolean)].collect().toSeq
    assert(k1 == Seq(
      ("x", 100L, Some(200L), false),
      ("x2", 200L, Some(300L), false),
      ("x3", 300L, None, true)))
  }

  test("pointInTimeJoin picks the dimension version valid at fact time") {
    import spark.implicits._
    val dim = Seq(
      (1L, "v1", 100L, Some(200L), false),
      (1L, "v2", 200L, None, true),
      (2L, "w1", 100L, None, true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val facts = Seq(
      (10L, 1L, 50L),  // before the dimension opened → drops
      (11L, 1L, 150L), // → v1
      (12L, 1L, 200L), // boundary: valid_from inclusive → v2
      (13L, 1L, 250L), // → v2
      (14L, 2L, 300L), // open horizon → w1
      (15L, 7L, 150L)) // unknown key → drops
      .toDF("fid", "k", "ts")
    val got = Layout.pointInTimeJoin(facts, dim, "k", "ts")
      .select("fid", "seg").orderBy("fid")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((11L, "v1"), (12L, "v2"), (13L, "v2"), (14L, "w1")))
  }

  test("sink_clustered_write read-back pushes the key-range filter to parquet") {
    val plan = SparkEntry.queries("sink_clustered_write")(spark, sfTiny)
      .queryExecution.sparkPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.metadata("PushedFilters").contains("l_orderkey"),
      scans.head.metadata("PushedFilters"))
  }

  test("jsonl round trip preserves hostile text exactly") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "line\nbreak and \"quotes\" and tab\there"),
      (2L, "unicode: é中文 😀 and backslash \\"),
      (3L, ""))
      .toDF("doc_id", "text")
    val out = scratchDir("jsonl")
    hostile.write.mode("overwrite").json(out)
    val back = spark.read
      .schema("doc_id LONG, text STRING").option("mode", "FAILFAST")
      .json(out)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(back.toSeq == Seq(
      (1L, "line\nbreak and \"quotes\" and tab\there"),
      (2L, "unicode: é中文 😀 and backslash \\"),
      (3L, "")))
  }
}
