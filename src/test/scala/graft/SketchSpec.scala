package graft

import org.apache.spark.sql.functions._

/** agg_approx_distinct is self-validating (each engine checks its own
  * HLL estimate against its own exact count, so the boolean column
  * hash-matches the oracle). This spec pins the two properties the
  * boolean alone doesn't: the exact column really is exact, and the raw
  * estimator error stays within 3× the configured 2% rsd.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val exact = Tables.lineitem(spark, sfTiny)
    .groupBy($"l_returnflag")
    .agg(countDistinct($"l_partkey").as("n"))
    .as[(String, Long)].collect().toMap

  test("agg_approx_distinct validates its own estimate (all groups true)") {
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, sfTiny)
      .select("l_returnflag", "exact_parts", "estimate_within_10pct")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, ex, ok) =>
      assert(ex === exact(k), s"flag $k: exact_parts drifted")
      assert(ok, s"flag $k: HLL estimate outside 10% of exact $ex")
    }
  }

  test("raw approx_count_distinct within configured 2% rsd (allow 3x slack)") {
    val approx = Tables.lineitem(spark, sfTiny)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("a"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val rel = math.abs(approx(k) - n).toDouble / n
      assert(rel < 0.06, s"flag $k: approx=${approx(k)} exact=$n rel=$rel")
    }
  }

  // ───── bloom_build / bloom_probe ─────

  private def bloomOf(keys: Seq[Long], parts: Int): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .agg(expr("bloom_build(k, 65536, 6)")).head.getAs[Array[Byte]](0)

  test("bloom: no false negatives, ever; bounded false positives") {
    val rnd = new scala.util.Random(7)
    val present = Seq.fill(2000)(rnd.nextLong()).distinct
    val bf = bloomOf(present, 8)
    present.foreach(k => assert(
      graft.functions.BloomRuntime.mightContain(bf, k),
      s"false negative for $k — bloom contract broken"))
    val absent = Seq.fill(10000)(rnd.nextLong()).filterNot(present.contains)
    val fp = absent.count(graft.functions.BloomRuntime.mightContain(bf, _))
    // 65536 bits / 2000 keys / 6 hashes → theoretical fp ~0.56%; allow 4x
    assert(fp < absent.size * 0.025, s"$fp/${absent.size} false positives")
  }

  test("bloom: OR-merge is order-independent (bit-identical across partitionings)") {
    val keys = (1L to 5000L).map(_ * 2654435761L)
    assert(java.util.Arrays.equals(bloomOf(keys, 1), bloomOf(keys, 13)))
  }

  test("bloom built over zero rows matches nothing") {
    val bf = bloomOf(Seq.empty[Long], 1)
    assert((1L to 100L).forall(
      !graft.functions.BloomRuntime.mightContain(bf, _)))
  }

  test("join_bloom_prune: probe filter sits below the semi-join exchange") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val plan = SparkEntry.queries("join_bloom_prune")(spark, sfTiny)
      .queryExecution.sparkPlan
    val semi = plan.collectFirst {
      case j: BaseJoinExec if j.joinType.sql == "LEFT SEMI" => j
    }
    assert(semi.isDefined, s"no semi join in\n$plan")
    // the streamed (fact) side below the join must already be
    // bloom-filtered: pruned rows never reach the join's exchange
    assert(semi.get.children.head.toString.contains("bloom_probe"),
      s"bloom_probe not below the semi join's fact side:\n${semi.get}")
  }

  // ───── mg_candidates (Misra–Gries) ─────

  test("MG guarantee: candidates always cover true heavy hitters (random streams)") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 5) {
      val k = 4 + rnd.nextInt(12)
      val vocab = (1 to 40 + rnd.nextInt(60)).map(i => s"w$i")
      // zipf-ish skew so some tokens genuinely cross n/(k+1)
      val stream = (1 to 8000).map { _ =>
        val r = rnd.nextDouble()
        vocab((r * r * vocab.size).toInt.min(vocab.size - 1))
      }
      val parts = 1 + rnd.nextInt(16)
      val cands = stream.toDF("t").repartition(parts)
        .agg(expr(s"mg_candidates(t, $k)")).head.getSeq[String](0).toSet
      assert(cands.size <= k, s"round $round: ${cands.size} > k=$k")
      val exactCounts = stream.groupBy(identity).view.mapValues(_.size)
      val hh = exactCounts.filter(_._2 * (k + 1) > stream.size).keys.toSet
      assert(hh.subsetOf(cands),
        s"round $round (k=$k, parts=$parts): missed ${hh -- cands}")
    }
  }

  test("agg_heavy_hitters output is exact and matches a plain groupBy") {
    val got = SparkEntry.queries("agg_heavy_hitters")(spark, sfTiny)
      .as[(String, Long)].collect().toSeq
    val toks = Tables.documents(spark, sfTiny)
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')")).as("t"))
    val n = toks.count()
    val want = toks.groupBy($"t").count()
      .filter($"count" * 29 > n)
      .orderBy($"count".desc, $"t")
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty, "threshold should yield hitters on sf0.001 too")
  }

  test("agg_kmv_distinct: estimates within KMV error bounds; union row present") {
    // KMV with k=64 has relative stderr ~ 1/√(k−2) ≈ 12.7%; assert a
    // generous 4σ envelope — deterministic data, so this is a fixed
    // regression pin, not a flaky statistical test
    val rows = SparkEntry.queries("agg_kmv_distinct")(spark, sfTiny)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).contains("__union"))
    rows.foreach { case (grp, m, est, exact) =>
      if (m < 64) assert(est == exact.toDouble,
        s"$grp: sketch below k must be exact, est=$est exact=$exact")
      else assert(math.abs(est - exact) <= 0.51 * exact,
        s"$grp: est=$est exact=$exact outside 4sigma envelope")
    }
    // the union estimate must not exceed the sum of group estimates
    // (it merges the same hash sets) and must at least match the max
    val grps = rows.filter(_._1 != "__union")
    val uni = rows.find(_._1 == "__union").get
    assert(uni._4 <= grps.map(_._4).sum && uni._4 >= grps.map(_._4).max)
  }

  test("KMV merge property: k-smallest of unioned sketches = sketch of union") {
    import spark.implicits._
    // partial sketches per partition-group merge EXACTLY like the
    // query's per-group ones: the global k-smallest is always a subset
    // of the union of per-group k-smallest lists
    val k = 16
    val data = (1 to 500).map(i => (i % 5, s"key_$i"))
    val df = data.toDF("g", "v")
      .select($"g", expr(
        "cast(conv(substring(md5(v), 1, 15), 16, 10) as bigint)").as("h"))
      .distinct()
    val perGroup = df
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"h")))
      .filter($"rn" <= k)
    val mergedTopK = perGroup.select($"h").distinct()
      .orderBy($"h").limit(k).as[Long].collect().toSeq
    val directTopK = df.select($"h").distinct()
      .orderBy($"h").limit(k).as[Long].collect().toSeq
    assert(mergedTopK == directTopK)
  }

  // ───── persistent KMV sketch store ─────

  test("sketch store: incremental ≡ one-shot, replay no-op, group isolation, k bound") {
    import graft.ops.SketchStore
    import org.apache.hadoop.fs.Path
    def freshDir(tag: String): String = {
      val dir = graft.pipeline.Sources.scratch(sfTiny, tag)
      new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new Path(dir), true)
      dir
    }
    def store(dir: String): Set[(String, Long)] =
      graft.pipeline.SnapshotStore.read(spark, dir).get
        .select($"grp", $"h").as[(String, Long)].collect().toSet
    val rows = Tables.orders(spark, sfTiny)
      .select($"o_orderpriority".as("grp"), $"o_custkey".as("key"))
    val (inc, one) = (freshDir("skinc_"), freshDir("skone_"))
    SketchStore.ingest(spark, rows.filter($"key" % 4 =!= 0), inc, 1L)
    SketchStore.ingest(spark, rows.filter($"key" % 4 === 0), inc, 2L)
    SketchStore.ingest(spark, rows, one, 1L)
    val incRows = store(inc)
    assert(incRows === store(one), "incremental fold must equal one-shot")
    // the k bound holds for every group
    incRows.groupBy(_._1).foreach { case (g, hs) =>
      assert(hs.size <= SketchStore.k, s"$g overflows k")
    }
    // replay of the committed head is a no-op
    SketchStore.ingest(spark, rows.filter($"key" % 4 === 0), inc, 2L)
    assert(store(inc) === incRows)
    // a batch touching ONE group leaves every other group's sketch
    // untouched (bucket-pruned read + batch-group-restricted merge)
    val someGrp = incRows.head._1
    SketchStore.ingest(spark,
      Seq((someGrp, 999999999L)).toDF("grp", "key"), inc, 3L)
    val after = store(inc)
    assert(after.filter(_._1 != someGrp) === incRows.filter(_._1 != someGrp))
    // the touched group re-ranked: still ≤ k, and the union's k smallest
    val touchedNow = after.filter(_._1 == someGrp).map(_._2)
    assert(touchedNow.size <= SketchStore.k)
  }

  test("streaming sketch maintainer: exactly-once replay, converges to one-shot") {
    import graft.ops.SketchStore
    import graft.pipeline.SnapshotStore
    val dir  = scratchDir("sk_stream") + "/store"
    val ckpt = scratchDir("sk_stream_ckpt") + "/cp"
    val land = scratchDir("sk_stream_land")
    val rows = Tables.orders(spark, sfTiny)
      .select($"o_orderpriority".as("grp"), $"o_custkey".as("key"))
    rows.filter($"key" % 2 === 0).write.mode("overwrite").parquet(s"$land/b0")
    def run(): Unit = graft.streaming.StreamingPipeline.runSketchIngest(
      spark,
      spark.readStream.schema("grp STRING, key BIGINT").parquet(s"$land/*"),
      dir, ckpt).awaitTermination()
    run()
    val v1 = SnapshotStore.latestVersion(spark, dir).get
    run() // replay with no new files: nothing recommits
    assert(SnapshotStore.latestVersion(spark, dir).contains(v1))
    // a second landing file folds incrementally…
    rows.filter($"key" % 2 === 1).write.mode("overwrite").parquet(s"$land/b1")
    run()
    // …and the store equals a one-shot build over everything
    val want = scratchDir("sk_stream_want") + "/store"
    SketchStore.ingest(spark, rows, want, 1L)
    def store(p: String): Set[(String, Long)] =
      SnapshotStore.read(spark, p).get
        .select($"grp", $"h").as[(String, Long)].collect().toSet
    assert(store(dir) === store(want))
  }

  // ───── agg_kmv_setops (theta-sketch set algebra) ─────

  test("agg_kmv_setops: partition identity, exact truth, bounded error") {
    val rows = SparkEntry.queries("agg_kmv_setops")(spark, sfTiny)
      .select("measure", "c_trim", "est", "exact")
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(rows.keySet === Set("diff_ab", "diff_ba", "intersect", "union"))
    val (cU, estU, exU) = rows("union")
    val parts = Seq("diff_ab", "diff_ba", "intersect").map(rows)
    // trimmed counts partition the union region exactly (integers)
    assert(parts.map(_._1).sum === cU, "c_trim does not partition the union")
    // so the estimates partition too (same θ divisor; float-sum slack)
    assert(math.abs(parts.map(_._2).sum - estU) < 1e-6 * math.max(estU, 1.0))
    // the exact arm is a true set partition of |A∪B|
    assert(parts.map(_._3).sum === exU, "exact columns are not a partition")
    // independently recompute the exact overlap from the raw key sets
    val byStatus = Tables.orders(spark, sfTiny)
      .filter($"o_orderstatus".isin("F", "O"))
      .select($"o_orderstatus", $"o_custkey").distinct()
      .as[(String, Long)].collect().groupMap(_._1)(_._2)
    val (a, b) = (byStatus("F").toSet, byStatus("O").toSet)
    assert(rows("intersect")._3 === (a & b).size.toLong)
    assert(rows("diff_ab")._3 === (a -- b).size.toLong)
    assert(rows("diff_ba")._3 === (b -- a).size.toLong)
    assert(exU === (a | b).size.toLong)
    // k = 64 gives ~1/√(k−1) ≈ 12.7% rsd on the union-scale estimates;
    // gate at 3σ for measures large enough to carry a relative bound
    rows.foreach { case (m, (_, est, exact)) =>
      if (exact >= 100)
        assert(math.abs(est - exact) <= 0.4 * exact,
          s"$m: est $est vs exact $exact outside 40%")
    }
  }
}
