package graft

import graft.ops.VectorIndex
import graft.pipeline.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistent IVF index semantics: content-bucketed store placement,
  * probe IO pruning, incremental-ingest ≡ one-shot equivalence, and the
  * bucketCol contract's loud failure modes.
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def normed(d: String): DataFrame =
    Tables.embeddings(spark, d).select(
      col("vec_id"), col("embedding"),
      expr("sqrt(vec_dot(embedding, embedding))").as("nrm"))

  test("bucketCol store places rows by the column and prunes reads") {
    val dir = scratchDir("vx_bucketcol") + "/t"
    val rows = Seq((1L, 0, "a"), (2L, 0, "b"), (3L, 2, "c"))
      .toDF("k", "cell", "v")
    SnapshotStore.upsertVersion(spark, rows, "k", None, dir, 0L,
      bucketCol = Some("cell"), numBuckets = Some(4))

    // physical placement: rows live in their DECLARED bucket dirs
    val probe0 = SnapshotStore.readBuckets(spark, dir, Set(0)).get
    assert(probe0.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(probe0.inputFiles.forall(_.contains("_bucket=0")),
      "probe of bucket 0 must read only bucket 0's files")
    // a bucket never written serves no rows, schema intact
    val probe13 = SnapshotStore.readBuckets(spark, dir, Set(1, 3)).get
    assert(probe13.count() == 0 && probe13.columns.contains("v"))

    // merge stays per-bucket: an upsert of k=2 touches only cell 0
    SnapshotStore.upsertVersion(spark,
      Seq((2L, 0, "b2")).toDF("k", "cell", "v"), "k", None, dir, 1L,
      bucketCol = Some("cell"))
    assert(SnapshotStore.readBuckets(spark, dir, Set(0)).get
      .filter(col("k") === 2L).select("v").as[String].head() == "b2")
    assert(SnapshotStore.readBuckets(spark, dir, Set(2)).get
      .inputFiles.forall(_.contains("v00000000")),
      "untouched bucket must still serve version-0 files")
  }

  test("bucketCol out-of-range fails the write; bad probe ids refused") {
    val dir = scratchDir("vx_range") + "/t"
    intercept[Exception] {
      SnapshotStore.upsertVersion(spark,
        Seq((1L, 7, "x")).toDF("k", "cell", "v"), "k", None, dir, 0L,
        bucketCol = Some("cell"), numBuckets = Some(4))
    }
    SnapshotStore.upsertVersion(spark,
      Seq((1L, 3, "x")).toDF("k", "cell", "v"), "k", None, dir, 1L,
      bucketCol = Some("cell"), numBuckets = Some(4))
    intercept[IllegalArgumentException] {
      SnapshotStore.readBuckets(spark, dir, Set(9))
    }
  }

  test("build + incremental ingest == one-shot index; probe IO is pruned") {
    val e = normed(sfTiny)
    val base  = e.filter(pmod(col("vec_id"), lit(4)) =!= 3)
    val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)

    val incDir = scratchDir("vx_inc") + "/idx"
    VectorIndex.build(spark, base, incDir, k = 8)
    VectorIndex.ingest(spark, delta, incDir)

    val oneDir = scratchDir("vx_one") + "/idx"
    // same frozen quantizer (seeds from BASE), whole corpus at once
    VectorIndex.build(spark, e, oneDir, k = 8,
      seeds = Some(VectorIndex.seedCentroids(base, 8)))

    def contents(dir: String): Set[(Long, Int)] =
      SnapshotStore.read(spark, dir).get
        .select(col("vec_id"), col("cell"))
        .as[(Long, Int)].collect().toSet
    assert(contents(incDir) == contents(oneDir),
      "incremental ingest must converge to the one-shot index")

    // probe: answers match between the two stores, and IO is pruned to
    // the probed cells' bucket dirs only
    val q = e.filter(col("vec_id") < 20)
    val rInc = VectorIndex.query(spark, q, incDir)
    val rOne = VectorIndex.query(spark, q, oneDir)
    assert(rInc.collect().toSeq == rOne.collect().toSeq)

    // pruning evidence: a single-cell query must touch one bucket dir
    val q1 = e.filter(col("vec_id") === 5)
    val files = VectorIndex.query(spark, q1, incDir).inputFiles
      .filter(_.contains("_bucket="))
      .map(_.replaceAll(".*(_bucket=\\d+).*", "$1")).toSet
    assert(files.size == 1,
      s"single-query probe should read exactly one cell dir, got $files")
  }

  test("drifted index auto-reindexes into a generation matching a fresh build") {
    val root = scratchDir("vx_reindex")
    val g1 = s"$root/g1"; val g2 = s"$root/g2"; val fresh = s"$root/fresh"
    val e = normed(sfTiny) // 500 vectors
    // gen-1 frozen at K=2 over a quarter of the corpus, then 4× growth:
    // mean occupancy 250 ≫ any sane cap — the frozen-K drift scenario
    VectorIndex.build(spark, e.filter(pmod(col("vec_id"), lit(4)) === 0),
      g1, k = 2)
    VectorIndex.ingest(spark,
      e.filter(pmod(col("vec_id"), lit(4)) =!= 0), g1)
    assert(VectorIndex.meanOccupancy(spark, g1) === 250.0)

    val cellCap = 20
    assert(VectorIndex.needsReindex(spark, g1, cellCap))
    // healthy index (cap far above occupancy): no rollover, outDir untouched
    assert(VectorIndex.maybeReindex(spark, g1, g2, cellCap = 1000).isEmpty)
    assert(SnapshotStore.latestVersion(spark, g2).isEmpty)

    // drifted: roll generation 2, sized for 0.4 × cap occupancy
    val k2 = VectorIndex.maybeReindex(spark, g1, g2, cellCap).get
    assert(k2 === 63) // ceil(500 / (0.4 × 20))
    // the old generation is untouched and stays serveable throughout
    assert(SnapshotStore.read(spark, g1).get.count() === 500)
    assert(VectorIndex.query(spark, e.limit(5), g1, cellCap = cellCap)
      .count() === 5)

    // convergence: the rolled generation IS a fresh one-shot build of the
    // current corpus at the same K — same quantizer (md5 seed order is
    // corpus-determined), same cell assignment, same probe answers, same
    // probe cost (occupancy back under target, so the cap no longer
    // truncates the average cell)
    VectorIndex.build(spark, e, fresh, k2)
    def contents(p: String): Set[(Long, Int)] =
      SnapshotStore.read(spark, p).get
        .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toSet
    assert(contents(g2) === contents(fresh))
    assert(VectorIndex.meanOccupancy(spark, g2) <= 0.4 * cellCap)
    def probe(p: String): Set[(Long, Long)] =
      VectorIndex.query(spark, e, p, cellCap = cellCap)
        .select(col("vec_id"), col("ann_id")).as[(Long, Long)]
        .collect().toSet
    assert(probe(g2) === probe(fresh))
  }

  test("streaming ingest commits exactly-once and converges to one-shot") {
    val e = normed(sfTiny)
    val base  = e.filter(pmod(col("vec_id"), lit(4)) =!= 3)
    val dir  = scratchDir("vx_stream") + "/idx"
    val ckpt = scratchDir("vx_stream_ckpt") + "/cp"
    val land = scratchDir("vx_stream_land")

    VectorIndex.build(spark, base, dir, k = 8)
    val v0 = SnapshotStore.latestVersion(spark, dir).get

    // land the held-out quarter as a file stream of (vec_id, embedding)
    Tables.embeddings(spark, sfTiny)
      .filter(pmod(col("vec_id"), lit(4)) === 3)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$land/b0")
    def run(): Unit = graft.streaming.StreamingPipeline.runAnnIndexIngest(
      spark,
      spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .parquet(s"$land/*"), dir, ckpt).awaitTermination()
    run()
    assert(SnapshotStore.latestVersion(spark, dir).contains(v0 + 1))

    // checkpoint replay with no new files: nothing recommits
    run()
    assert(SnapshotStore.latestVersion(spark, dir).contains(v0 + 1))

    // converged to the one-shot index under the same frozen quantizer
    val oneDir = scratchDir("vx_stream_one") + "/idx"
    VectorIndex.build(spark, e, oneDir, k = 8,
      seeds = Some(VectorIndex.seedCentroids(base, 8)))
    def contents(p: String): Set[(Long, Int)] =
      SnapshotStore.read(spark, p).get.select(col("vec_id"), col("cell"))
        .as[(Long, Int)].collect().toSet
    assert(contents(dir) == contents(oneDir))
  }

  test("mid-stream schema change: wider feed absorbed; carried column evolves") {
    val e = normed(sfTiny)
    val base = e.filter(pmod(col("vec_id"), lit(4)) === 0)
    val dir  = scratchDir("vx_evolve") + "/idx"
    val ckpt = scratchDir("vx_evolve_ckpt") + "/cp"
    val land = scratchDir("vx_evolve_land")
    VectorIndex.build(spark, base, dir, k = 8)

    // run 1: the original (vec_id, embedding) feed
    Tables.embeddings(spark, sfTiny)
      .filter(pmod(col("vec_id"), lit(4)) === 1)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$land/b0")
    graft.streaming.StreamingPipeline.runAnnIndexIngest(
      spark,
      spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .parquet(s"$land/*"), dir, ckpt).awaitTermination()

    // the feed gains a column; a restart WITHOUT carryCols ignores it
    // (fixed projection — the index schema does not churn by accident)
    Tables.embeddings(spark, sfTiny)
      .filter(pmod(col("vec_id"), lit(4)) === 2)
      .select(col("vec_id"), col("embedding"), lit("en").as("lang"))
      .write.mode("overwrite").parquet(s"$land/b1")
    def widened = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, lang STRING")
      .parquet(s"$land/*")
    graft.streaming.StreamingPipeline.runAnnIndexIngest(
      spark, widened, dir, ckpt).awaitTermination()
    assert(!SnapshotStore.read(spark, dir).get.columns.contains("lang"))

    // a restart WITH carryCols + evolve lands the column: the new
    // vintage carries values, old vintages null-fill on read
    Tables.embeddings(spark, sfTiny)
      .filter(pmod(col("vec_id"), lit(4)) === 3)
      .select(col("vec_id"), col("embedding"), lit("de").as("lang"))
      .write.mode("overwrite").parquet(s"$land/b2")
    graft.streaming.StreamingPipeline.runAnnIndexIngest(
      spark, widened, dir, ckpt,
      carryCols = Seq("lang"), evolve = true).awaitTermination()
    val all = SnapshotStore.read(spark, dir).get
    assert(all.count() === 500)
    assert(all.filter(col("lang") === "de").count() === 125)
    assert(all.filter(col("lang").isNull).count() === 375)

    // probes are unaffected by the evolution: identical to the one-shot
    // index under the same frozen quantizer
    val oneDir = scratchDir("vx_evolve_one") + "/idx"
    VectorIndex.build(spark, e, oneDir, k = 8,
      seeds = Some(VectorIndex.seedCentroids(base, 8)))
    val q = e.filter(col("vec_id") < 50)
    def probe(p: String): Set[(Long, Long)] =
      VectorIndex.query(spark, q, p)
        .select(col("vec_id"), col("ann_id")).as[(Long, Long)]
        .collect().toSet
    assert(probe(dir) === probe(oneDir))
  }

  test("ADC probe scans 4-byte codes, never the vectors") {
    val e = normed(sfTiny)
    val dir = scratchDir("vx_adc") + "/idx"
    VectorIndex.build(spark, e, dir, k = 8)
    val q = e.filter(col("vec_id") < 50)
    val plan = VectorIndex.queryAdc(spark, q, dir).queryExecution.sparkPlan
    val indexScans = plan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.output.exists(_.name.startsWith("code")) => sc
    }
    assert(indexScans.nonEmpty, "expected a codes scan over the index")
    assert(indexScans.exists(!_.output.exists(_.name == "embedding")),
      "the ADC scan must prune the embedding column — codes only")

    // and the answers agree with the plain probe wherever the true
    // neighbor survives quantization: spot-check result shape
    val r = VectorIndex.queryAdc(spark, q, dir)
    assert(r.columns.toSeq == Seq("vec_id", "ann_id", "cosine"))
    assert(r.count() > 0)
  }

  test("ADC retrieval quality: dominated by the exact probe, floored") {
    val e = normed(sfTiny)
    val dir = scratchDir("vx_adcq") + "/idx"
    VectorIndex.build(spark, e, dir, k = 8)
    // brute-force exact NN (the SimilaritySpec pattern)
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("va")).orderBy(col("cos").desc, col("vb").asc)
    val exact = a.join(b, col("va") =!= col("vb"))
      .select(col("va"), col("vb"),
        (expr("vec_dot(ea, eb)") / (col("na") * col("nb"))).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("va", "vb").as[(Long, Long)].collect().toMap
    def recall(res: Map[Long, Long]): Double =
      exact.count { case (v, nn) => res.get(v).contains(nn) }.toDouble /
        exact.size
    val plain = recall(VectorIndex.query(spark, e, dir)
      .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap)
    val adc = recall(VectorIndex.queryAdc(spark, e, dir)
      .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap)
    // ADC re-ranks a top-8-by-approximation SUBSET of the same cells the
    // exact probe searches exhaustively, so it can never beat it; the
    // floor pins that 4-byte codes still carry real signal
    assert(adc <= plain + 1e-9, s"adc=$adc plain=$plain")
    assert(adc > 0.1, s"ADC recall collapsed: $adc (plain $plain)")
  }

  test("ADC recall is monotone in rerank depth") {
    val e = normed(sfTiny)
    val dir = scratchDir("vx_adcmono") + "/idx"
    VectorIndex.build(spark, e, dir, k = 8)
    // exact in-cell answer = the plain probe; ADC at depth r re-ranks
    // its top-r approximation of the same candidate set, so agreement
    // with the plain probe can only improve as r grows
    val plain = VectorIndex.query(spark, e, dir)
      .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
    def agree(r: Int): Double = {
      val m = VectorIndex.queryAdc(spark, e, dir, rerank = r)
        .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
      plain.count { case (v, nn) => m.get(v).contains(nn) }.toDouble /
        plain.size
    }
    val (a1, a4, a8) = (agree(1), agree(4), agree(8))
    info(f"ADC agreement with exact probe: rerank1=$a1%.3f rerank4=$a4%.3f rerank8=$a8%.3f")
    assert(a1 <= a4 + 1e-9 && a4 <= a8 + 1e-9, s"$a1 / $a4 / $a8")
    // measured 0.09 / 0.25 / 0.40 with md5-seed sub-codebooks on the
    // random driver corpus (~62-vector cells): honest coarse-quantizer
    // quality — the production lever is k-means codebooks + deeper
    // rerank, same machinery. Floor pins signal, not aspiration.
    assert(a8 > 0.25, s"depth-8 ADC agreement collapsed: $a8")
  }

  test("learned PQ sub-codebooks beat the seed quantizer's ADC agreement") {
    val e = normed(sfTiny)
    def agree(dir: String): Double = {
      val plain = VectorIndex.query(spark, e, dir)
        .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
      val adc = VectorIndex.queryAdc(spark, e, dir, rerank = 4)
        .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
      plain.count { case (v, nn) => adc.get(v).contains(nn) }.toDouble /
        plain.size
    }
    val seedDir = scratchDir("vx_pqseed") + "/idx"
    VectorIndex.build(spark, e, seedDir, k = 8)
    val kmDir = scratchDir("vx_pqkm") + "/idx"
    VectorIndex.build(spark, e, kmDir, k = 8, pqKmeansIters = 4)
    val (aSeed, aKm) = (agree(seedDir), agree(kmDir))
    info(f"ADC agreement@rerank4: seed=$aSeed%.3f kmeans(4)=$aKm%.3f")
    // trained sub-codebooks quantize the actual distribution; md5 seeds
    // quantize 16 arbitrary corpus points — agreement must not degrade
    // and in practice improves markedly (recorded in the info line)
    assert(aKm >= aSeed - 1e-9, s"k-means degraded ADC: $aKm < $aSeed")
  }

  test("ADC surfaces a planted near-duplicate (lossless small codebook)") {
    // crafted 8-vector geometry (SimilaritySpec's fixture recipe):
    // vector 1 is a near-dup of vector 0; with ≤16 corpus vectors every
    // sub-slice is its own codebook entry, so quantization is lossless
    // and the ADC probe must return it
    val d = scratchDir("vx_adcfix")
    val vecs = Seq(
      (0L, Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f), 0),
      (1L, Array.tabulate(64)(i =>
        if (i == 0) 1.0f else if (i == 1) 0.02f else 0.0f), 0),
      (2L, Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f), 0),
      (3L, Array.tabulate(64)(i => if (i == 2) 1.0f else 0.0f), 1),
      (4L, Array.tabulate(64)(i => if (i == 3) 1.0f else 0.0f), 1),
      (5L, Array.tabulate(64)(i => if (i == 4) 1.0f else 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val e = normed(d)
    val dir = s"$d/idx"
    VectorIndex.build(spark, e, dir, k = 2)
    val r = VectorIndex.queryAdc(spark, e.filter(col("vec_id") === 0), dir)
      .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
    assert(r.get(0L).contains(1L), s"expected near-dup 1, got $r")
  }

  test("re-embedding a vector upserts its row (same key, maybe same cell)") {
    val e = normed(sfTiny)
    val dir = scratchDir("vx_reemb") + "/idx"
    VectorIndex.build(spark, e, dir, k = 8)
    val before = SnapshotStore.read(spark, dir).get.count()
    // re-ingest an existing vector unchanged: keyed upsert, not append
    VectorIndex.ingest(spark, e.filter(col("vec_id") === 1), dir)
    assert(SnapshotStore.read(spark, dir).get.count() == before)
  }
}
