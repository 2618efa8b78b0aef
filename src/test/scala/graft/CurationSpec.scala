package graft

import org.apache.spark.sql.functions._

/** Curation-operator semantics on crafted fixtures with hand-checkable
  * answers: stable stratified sampling, greedy budget packing, exact
  * contamination intersection.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = scratchDir("curation")
    val eight = "one two three four five six seven eight"
    val docs = Seq(
      // doc 0 is an "eval" doc (doc_id % 20 == 0)
      (0L, s"$eight and some eval only tail words", "en", "srcA", 40L),
      // doc 1 contains the same 8-gram → contaminated
      (1L, s"prefix words then $eight trailing text", "en", "srcA", 40L),
      // doc 2 shares no 8-gram
      (2L, "totally different content with no overlap at all here kept short", "en", "srcA", 64L),
      // doc 3: high diversity, srcB; doc 4: low diversity, srcB
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "de", "srcB", 56L),
      (4L, "rep rep rep rep rep rep rep rep rep rep", "de", "srcB", 40L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("curate_stratified_sample: per-stratum ranks are stable and bounded") {
    val rows = SparkEntry.queries("curate_stratified_sample")(spark, dir)
      .select("doc_id", "lang", "rk").as[(Long, String, Int)].collect()
    // every doc survives (k=50 > stratum sizes) with ranks 1..n per lang
    assert(rows.length === 5)
    val en = rows.filter(_._2 == "en").map(_._3).sorted
    assert(en.toSeq === Seq(1, 2, 3))
    // determinism: a second run produces the identical assignment
    val again = SparkEntry.queries("curate_stratified_sample")(spark, dir)
      .select("doc_id", "lang", "rk").as[(Long, String, Int)].collect()
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("curate_token_budget packs high-diversity docs first, respects budget") {
    val rows = SparkEntry.queries("curate_token_budget")(spark, dir)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect()
    // srcB: doc 3 (10 distinct) packs before doc 4 (1 distinct)
    val srcB = rows.filter(_._2 == "srcB").sortBy(_._4)
    assert(srcB.head._1 === 3L)
    // running sums are monotone and within budget
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.last._4 <= 2000L)
      assert(sorted.map(_._4).toSeq === sorted.scanLeft(0L)(_ + _._3).tail.toSeq)
    }
  }

  test("curate_contamination flags exactly the docs sharing an 8-gram") {
    val rows = SparkEntry.queries("curate_contamination")(spark, dir)
      .select("doc_id", "n_shared_grams").as[(Long, Long)].collect().toMap
    assert(rows.contains(1L), "doc 1 embeds the eval 8-gram")
    assert(rows(1L) >= 1L)
    assert(!rows.contains(2L), "doc 2 shares nothing")
    assert(!rows.contains(0L), "eval docs are not scored against themselves")
  }

  test("curate_shard_plan packs every doc; shards never span sources") {
    import org.apache.spark.sql.functions.lit
    val d = scratchDir("shard")
    // ~600 est tokens per doc -> shard capacity 2000 fits 3-4 docs
    val docs = (0L to 19L).map(i =>
      (i, ("tok " * 600).trim, "en", if (i < 12) "A" else "B"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", lit(2399L))
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("curate_shard_plan")(spark, d)
      .select("doc_id", "source", "n_tokens", "cum_tokens", "shard_id")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(rows.length === 20, "every document is assigned")
    assert(rows.forall(r => r._5 === (r._4 - 1) / 2000))
    // within a (source, shard) the token span never exceeds the budget
    // start boundary: consecutive shard ids, starting at 0, per source
    for ((_, rs) <- rows.groupBy(_._2)) {
      val ids = rs.map(_._5).distinct.sorted.toSeq
      assert(ids === (0L until ids.length.toLong),
        s"shards are dense per source: $ids")
    }
    // deterministic: same assignment on a re-run
    val again = SparkEntry.queries("curate_shard_plan")(spark, d)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._5).toMap === again)
  }

  test("curate_domain_mix caps the dominant source, keeps small ones whole") {
    import org.apache.spark.sql.functions.lit
    val d = scratchDir("mix")
    // source A dominates: 8 of 12 docs; cap = 12 / (2*3) = 2 per source
    val docs = ((0L to 7L).map(i => (i, s"alpha beta doc $i", "en", "A")) ++
      Seq((8L, "gamma one", "en", "B"), (9L, "gamma two", "en", "B"),
        (10L, "delta one", "en", "C"), (11L, "delta two", "en", "C")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", lit(10L))
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("curate_domain_mix")(spark, d)
      .select("doc_id", "source", "rk", "src_cap")
      .as[(Long, String, Int, Long)].collect()
    val bySrc = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc === Map("A" -> 2, "B" -> 2, "C" -> 2),
      s"dominant source must be capped to n_tot/(2*n_sources): $bySrc")
    assert(rows.forall(_._4 === 2L))
    // determinism: identical selection on a re-run
    val again = SparkEntry.queries("curate_domain_mix")(spark, d)
      .select("doc_id").as[Long].collect().sorted
    assert(again.toSeq === rows.map(_._1).sorted.toSeq)
  }

  test("curate_pipeline_e2e drops gated docs and non-canonical exact dupes") {
    import org.apache.spark.sql.functions.{length, lit}
    val d = scratchDir("e2e")
    // 24 distinct words incl. stopwords: passes every gate rule
    val good = "the quick brown fox jumps over a lazy dog while many other " +
      "animals watch from the tall green hill beside this winding river today"
    val other = "a different body of twenty plus words with the usual mix " +
      "of stopwords and content terms spread across one natural sentence here"
    Seq(
      (1L, good, "en", "srcA"),    // canonical copy (min doc_id)
      (5L, good, "en", "srcA"),    // exact dupe — must be dropped
      (3L, other, "en", "srcA"),   // unique survivor
      (9L, "too short", "en", "srcA")) // gated out (n_tokens < 20)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val manifest = SparkEntry.queries("curate_pipeline_e2e")(spark, d)
      .select("doc_id").as[Long].collect().sorted
    assert(manifest.toSeq === Seq(1L, 3L),
      "manifest must keep the canonical dupe + the unique doc only")
  }

  test("curate_quality_gate drops NULL-text docs as too_short, never keeps them") {
    import org.apache.spark.sql.functions.lit
    val d = scratchDir("gate_null")
    Seq((1L, Option.empty[String]), (2L, Some("tiny")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", lit(0L))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("curate_quality_gate")(spark, d)
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    // NULL n_tokens must hit the length rule's IS NULL arm — a fall-
    // through would mislabel junk as 'keep'
    assert(rows(1L) === "too_short")
    assert(rows(2L) === "too_short")
  }

  test("curate_domain_mix cap floors at 1 when sources outnumber docs/2") {
    import org.apache.spark.sql.functions.lit
    val d = scratchDir("mix_floor")
    // 4 docs over 4 sources: 4/(2*4) = 0 — the floor keeps one each
    (0L to 3L).map(i => (i, s"doc $i", "en", s"S$i"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", lit(5L))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("curate_domain_mix")(spark, d)
      .select("doc_id").as[Long].collect()
    assert(rows.sorted.toSeq === Seq(0L, 1L, 2L, 3L),
      "no corpus is ever silently emptied by the cap")
  }

  test("curate_pack_sequences: contiguous token stream, valid straddles") {
    val rows = SparkEntry.queries("curate_pack_sequences")(spark, sfTiny)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("seq_first"), r.getAs[Long]("seq_off"),
        r.getAs[Long]("seq_last"), r.getAs[Long]("cum")))
    assert(rows.nonEmpty)
    val L = 512L
    rows.groupBy(_._1).foreach { case (src, ds) =>
      // rows arrive ordered by cum within source; the stream is gapless:
      // each doc starts exactly where the previous ended
      var expectStart = 0L
      ds.sortBy(_._6).foreach { case (_, n, sf, off, sl, cum) =>
        val start = cum - n
        assert(start == expectStart, s"$src: gap at token $expectStart")
        expectStart = cum
        assert(sf == start / L && off == start % L, s"$src: window math")
        assert(sl == (cum - 1) / L, s"$src: last window math")
        assert(sl >= sf && off >= 0 && off < L)
        // straddle count implied by size: tokens past the first window
        assert(sl - sf == (off + n - 1) / L, s"$src: straddle count")
      }
    }
    // the two-level scan must actually straddle: at least one doc spans
    // a window boundary on the driver corpus (packLen << doc sizes sum)
    assert(rows.exists(r => r._5 > r._3), "no doc straddles — packLen too big?")
  }

  test("curate_temperature_mix: quotas filled exactly; α=0.5 flattens the mix") {
    val sampled = SparkEntry.queries("curate_temperature_mix")(spark, sfTiny)
      .select($"lang", $"rk", $"quota").as[(String, Long, Long)].collect()
    val raw = Tables.documents(spark, sfTiny)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val byLang = sampled.groupBy(_._1)
    assert(byLang.keySet === raw.keySet, "every language must be represented")
    byLang.foreach { case (lang, rows) =>
      val quota = rows.head._3
      assert(rows.forall(_._3 == quota), s"$lang: quota not constant")
      // every slot below the quota is filled (rank is dense from 1)
      assert(rows.map(_._2).sorted.toSeq ==
        (1L to math.min(quota, raw(lang))).toSeq, s"$lang: ranks not dense")
    }
    // temperature property: the dominant language's share shrinks vs raw,
    // the scarcest language's share grows — the whole point of α < 1
    val n = raw.values.sum.toDouble
    val m = sampled.length.toDouble
    val top = raw.maxBy(_._2)._1
    val bottom = raw.minBy(_._2)._1
    assert(byLang(top).size / m < raw(top) / n,
      s"$top not down-weighted: ${byLang(top).size / m} vs ${raw(top) / n}")
    assert(byLang(bottom).size / m > raw(bottom) / n,
      s"$bottom not up-weighted: ${byLang(bottom).size / m} vs ${raw(bottom) / n}")
    // determinism: a second run is row-identical (md5 rank, no RNG)
    val again = SparkEntry.queries("curate_temperature_mix")(spark, sfTiny)
      .select($"lang", $"rk", $"quota").as[(String, Long, Long)].collect()
    assert(again.sorted.toSeq == sampled.sorted.toSeq)
  }

  test("curate_k_anonymity: lattice invariants hold against a Scala replay") {
    val K = 8L
    val rows = SparkEntry.queries("curate_k_anonymity")(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long, Long)].collect()
    // levels are distinct, sorted, in the lattice's range
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq.distinct)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 3))
    // conservation: every customer lands at exactly one level
    val total = Tables.customer(spark, "/root/testdata/sf0.01").count()
    assert(rows.map(_._2).sum === total)
    // the k in k-anonymity: every anonymizing class below the suppression
    // level holds at least K records (min over the achieved classes)
    rows.filter(_._1 < 3).foreach { r =>
      assert(r._4 >= K, s"level ${r._1}: min class ${r._4} < $K")
      assert(r._4 <= r._5)
      assert(r._3 >= 1L)
    }
    // Scala replay of the full lattice from the raw table
    val cust = Tables.customer(spark, "/root/testdata/sf0.01")
      .select($"c_nationkey".cast("long"), $"c_mktsegment", $"c_acctbal")
      .as[(Long, String, Double)].collect()
      .map { case (nat, seg, bal) =>
        (nat, seg, math.floor(bal / 4000).toLong) }
    val n0 = cust.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val n1 = cust.groupBy(c => (c._1, c._2))
      .map { case (k, g) => k -> g.length.toLong }
    val n2 = cust.groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val n3 = cust.length.toLong
    val byLvl = n0.toSeq.map { case (c @ (nat, seg, _), cnt) =>
      val lvl = if (cnt >= K) 0L else if (n1((nat, seg)) >= K) 1L
        else if (n2(seg) >= K) 2L else 3L
      val sz = lvl match {
        case 0L => cnt case 1L => n1((nat, seg)) case 2L => n2(seg)
        case _ => n3
      }
      val key = lvl match {
        case 0L => c.toString case 1L => (nat, seg).toString
        case 2L => seg case _ => "*"
      }
      (lvl, cnt, key, sz)
    }.groupBy(_._1).map { case (lvl, g) =>
      (lvl, g.map(_._2).sum, g.map(_._3).distinct.length.toLong,
        g.map(_._4).min, g.map(_._4).max)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === byLvl)
  }

  test("curate_dp_release: chord-log2 geometric draw is EXACT on all 2^20 seeds") {
    // The operator's doc claims the chord log2 bins every 20-bit seed
    // into the same floor(-log2 u) bucket as true log2 (exact knots +
    // strict monotonicity). Prove it exhaustively: for every m1 in
    // [1, 2^20], the chord-computed draw equals 20 - ceil(log2(m1))
    // (with equality-at-knots handled by the bit-length identity).
    val FP = 1048576L
    def chordG(m1: Long): Long = {
      val i = 63 - java.lang.Long.numberOfLeadingZeros(m1)
      val lg = i * FP + (m1 * FP / (1L << i)) - FP
      (20L * FP - lg) / FP
    }
    var m1 = 1L
    while (m1 <= (1L << 20)) {
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(m1 - 1) // ceil(log2)
      val exact = 20L - (if (m1 == 1L) 0L else bits.toLong)
      assert(chordG(m1) == exact, s"m1=$m1 chord=${chordG(m1)} exact=$exact")
      m1 += 1
    }
  }

  test("curate_dp_release replays the md5-seeded discrete Laplace exactly") {
    val FP = 1048576L
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def geom(cell: String, salt: String): Long = {
      val m1 = java.lang.Long.parseLong(
        md5hex(s"$cell:$salt").substring(0, 5), 16) + 1L
      val i = 63 - java.lang.Long.numberOfLeadingZeros(m1)
      val lg = i * FP + (m1 * FP / (1L << i)) - FP
      (20L * FP - lg) / FP
    }
    val exp = Tables.documents(spark, sfTiny)
      .select($"lang", $"source").as[(String, String)].collect()
      .groupBy(identity).map { case ((lang, source), g) =>
        val cell = s"$lang:$source"
        val noise = geom(cell, "dp1") - geom(cell, "dp2")
        (lang, source, math.max(0L, g.length.toLong + noise))
      }.toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("curate_dp_release")(spark, sfTiny)
      .as[(String, String, Long)].collect().toSeq
    assert(got === exp)
    // the release must actually be noisy somewhere (md5 seeds vary):
    // at least one cell's released count differs from its true count
    val anyNoise = exp.sortBy(r => (r._1, r._2)).zip(
      Tables.documents(spark, sfTiny).groupBy($"lang", $"source").count()
        .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2)))
      .exists { case ((_, _, rel), (_, _, n)) => rel != n }
    assert(anyNoise, "every cell released its true count — no noise drawn")
  }
}
