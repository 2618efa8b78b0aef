package graft

import graft.pipeline.EventsPipeline
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based semantics checks (SURVEY §5): watermark monotonicity /
  * idempotence, dedup idempotence, and cast null-behavior. Generators
  * come from ScalaCheck with fixed seeds (the scalatest-scalacheck
  * bridge isn't in the offline cache, so sampling is driven directly);
  * each case runs one Spark job over a generated frame, not one per row.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int = 8)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val tsGen = Gen.chooseNum(0L, 4_000_000_000_000L) // µs, ~1970–2096

  test("watermark filter keeps exactly the rows above the watermark") {
    forSamples(Gen.zip(Gen.nonEmptyListOf(tsGen), tsGen)) { case (tss, wm) =>
      val df = tss.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "ts_us")
        .select($"id", timestamp_micros($"ts_us").as("ts"))
      val wmDf = Seq(wm).toDF("w").select(timestamp_micros($"w").as("wm"))
      val kept = df.crossJoin(broadcast(wmDf))
        .filter($"wm".isNull || $"ts" > $"wm").drop("wm")
      val expect = tss.count(_ > wm)
      assert(kept.count() === expect)
      // idempotence: filtering again changes nothing
      val again = kept.crossJoin(broadcast(wmDf))
        .filter($"wm".isNull || $"ts" > $"wm").drop("wm")
      assert(again.count() === expect)
    }
  }

  test("exact dedup is idempotent and keeps one row per distinct text") {
    val textGen = Gen.nonEmptyListOf(
      Gen.oneOf("aa bb cc", "dd ee", "ff gg hh", "ii"))
    forSamples(textGen) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = docs.groupBy(md5($"text").as("h"))
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n"))
      assert(once.count() === texts.distinct.size)
      val twice = once.groupBy($"h")
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n2"))
      assert(twice.filter($"n2" > 1).count() === 0)
    }
  }

  test("P1 casts: parseable strings convert, junk nulls, never throws") {
    val cell = Gen.oneOf(
      Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
      Gen.alphaStr.suchThat(_.nonEmpty),
      Gen.const(""))
    forSamples(Gen.nonEmptyListOf(Gen.zip(cell, cell))) { rows =>
      val df = rows.zipWithIndex
        .map { case ((a, b), i) => (i.toString, a, i.toString, "t", b) }
        .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      val out = EventsPipeline.typed(df).collect().sortBy(r => r.getAs[Long](0))
      assert(out.length === rows.length)
      val byId = out.map(r => r.getAs[Long]("event_id") -> r).toMap
      rows.zipWithIndex.foreach { case ((tsRaw, valRaw), i) =>
        val r = byId(i.toLong)
        val tsOk  = scala.util.Try(tsRaw.trim.toLong).isSuccess
        val valOk = scala.util.Try(valRaw.trim.toDouble).isSuccess
        assert(r.isNullAt(r.fieldIndex("ts")) === !tsOk,
          s"ts cast mismatch for '$tsRaw'")
        assert(r.isNullAt(r.fieldIndex("value")) === !valOk,
          s"value cast mismatch for '$valRaw'")
      }
    }
  }

  test("two-level prefix scan equals the single-window sum on random data") {
    // Curation.sourcePrefixSum decomposes the per-source running sum
    // into 256 bucketed windows + a broadcast offset table; its whole
    // correctness claim is exact equality with the naive window. Pin it
    // on random (doc_id, source, n_tokens) frames, including collisions
    // in source and sparse/degenerate bucket occupancy.
    val rowGen = Gen.zip(
      Gen.chooseNum(0L, 5000L),                       // doc_id (dups dropped)
      Gen.oneOf("a", "b", "c"),                       // source
      Gen.chooseNum(1L, 97L))                         // n_tokens >= 1
    forSamples(Gen.nonEmptyListOf(rowGen), n = 6) { rows =>
      val df = rows.distinctBy(_._1).toDF("doc_id", "source", "n_tokens")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      val naive = df.withColumn("cum", sum($"n_tokens").over(w))
        .select($"doc_id", $"cum".cast("long")).as[(Long, Long)]
        .collect().toMap
      val scanned = ops.Curation.sourcePrefixSum(df)
        .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
      assert(scanned === naive)
    }
  }

  test("stats_ks_drift equals the brute-force KS over the same bins") {
    val row = SparkEntry.queries("stats_ks_drift")(spark, sfTiny)
      .select($"na", $"nb", $"ks_bin", $"d_num", $"d_stat")
      .as[(Long, Long, Long, Double, Double)].head()
    val docs = Tables.documents(spark, sfTiny)
      .select(($"n_chars" / 10).cast("long").as("bin"),
        ($"lang" === "en").as("isA"))
      .as[(Long, Boolean)].collect()
    val na = docs.count(_._2).toLong
    val nb = docs.size - na
    // exact CDF walk in BigInt — the reference computation
    val binsSorted = docs.groupBy(_._1).toSeq.sortBy(_._1)
    var (cumA, cumB) = (BigInt(0), BigInt(0))
    var best = (BigInt(-1), Long.MaxValue)
    binsSorted.foreach { case (bin, rows) =>
      cumA += rows.count(_._2)
      cumB += rows.count(!_._2)
      val dev = (cumA * nb - cumB * na).abs
      if (dev > best._1) best = (dev, bin)
    }
    assert(row._1 === na && row._2 === nb)
    assert(row._3 === best._2, "argmax bin (smallest at max dev)")
    assert(row._4 === best._1.toDouble)
    assert(row._5 === best._1.toDouble / (na.toDouble * nb.toDouble))
    // the statistic is a genuine drift signal on this corpus: 0 ≤ D ≤ 1
    assert(row._5 >= 0.0 && row._5 <= 1.0)
  }

  test("stats_mann_whitney equals brute-force midrank U; partition identity") {
    val row = SparkEntry.queries("stats_mann_whitney")(spark, sfTiny)
      .select($"na", $"nb", $"u2_a", $"u2_b", $"auc_a")
      .as[(Long, Long, Double, Double, Double)].head()
    val docs = Tables.documents(spark, sfTiny)
      .select($"n_chars", ($"lang" === "en").as("isA"))
      .as[(Long, Boolean)].collect()
    val na = docs.count(_._2).toLong
    val nb = docs.size - na
    // classical midrank U via doubled ranks in BigInt
    var cumBefore = 0L
    var (r2a, r2b) = (BigInt(0), BigInt(0))
    docs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      val cnt = rows.size.toLong
      val dm = BigInt(2 * cumBefore + cnt + 1) // doubled midrank
      r2a += dm * rows.count(_._2)
      r2b += dm * rows.count(!_._2)
      cumBefore += cnt
    }
    val u2a = r2a - BigInt(na) * (na + 1)
    val u2b = r2b - BigInt(nb) * (nb + 1)
    assert(row._1 === na && row._2 === nb)
    assert(row._3 === u2a.toDouble && row._4 === u2b.toDouble)
    // exactness witness: 2U_a + 2U_b = 2·na·nb always
    assert(u2a + u2b === BigInt(2) * na * nb)
    assert(row._5 === u2a.toDouble / (2.0 * na.toDouble * nb.toDouble))
    assert(row._5 >= 0.0 && row._5 <= 1.0)
  }

  test("stats_auc: per-segment doubled-rank replay; AUC bounded") {
    val rows = SparkEntry.queries("stats_auc")(spark, sfTiny)
      .select($"seg", $"np", $"nn", $"u2", $"auc")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val ev = Tables.events(spark, sfTiny)
      .select(($"user_id" % 4).as("seg"), $"value",
        ($"event_type" === "click").as("isP"))
      .as[(Long, Double, Boolean)].collect()
    ev.groupBy(_._1).foreach { case (seg, es) =>
      val np = es.count(_._3).toLong
      val nn = es.size - np
      var cumBefore = 0L
      var r2p = BigInt(0)
      es.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (_, grp) =>
        val cnt = grp.size.toLong
        r2p += BigInt(2 * cumBefore + cnt + 1) * grp.count(_._3)
        cumBefore += cnt
      }
      val u2 = r2p - BigInt(np) * (np + 1)
      val (_, gnp, gnn, gu2, gauc) = rows(seg)
      assert(gnp === np && gnn === nn, s"seg $seg sizes")
      assert(gu2 === u2.toDouble, s"seg $seg U")
      assert(gauc === u2.toDouble / (2.0 * np.toDouble * nn.toDouble))
      assert(gauc >= 0.0 && gauc <= 1.0)
    }
    assert(rows.keySet === ev.map(_._1).toSet)
  }

  test("stats_calibration: bands partition the events; exact ppm and mean") {
    val rows = SparkEntry.queries("stats_calibration")(spark, sfTiny)
      .select($"band", $"n", $"n_pos", $"pos_ppm", $"mean_score")
      .as[(Long, Long, Long, Long, Double)].collect()
    val ev = Tables.events(spark, sfTiny)
      .select($"value", ($"event_type" === "click").as("isP"))
      .as[(Double, Boolean)].collect()
    assert(rows.map(_._2).sum === ev.length.toLong, "bands partition all events")
    val byBand = ev.groupBy { case (v, _) =>
      math.min(math.floor(v / 50.0).toLong, 9L)
    }
    rows.foreach { case (band, n, nPos, ppm, mean) =>
      val es = byBand(band)
      assert(n === es.size.toLong && nPos === es.count(_._2).toLong)
      assert(ppm === nPos * 1000000L / n, s"band $band ppm is exact integer")
      // DECIMAL(18,2) exact sum (HALF_UP cast, matching Spark), ONE division
      val sv = es.map(e => BigDecimal(e._1)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(mean === sv.toDouble / n.toDouble, s"band $band mean")
    }
  }

  test("stats_psi_drift equals the brute-force chord-log2 PSI; every term ≥ 0") {
    val FP = 1048576L
    def lg2fp(n: Long): Long = {
      val il = 63 - java.lang.Long.numberOfLeadingZeros(n)
      il * FP + n * FP / (1L << il) - FP
    }
    val row = SparkEntry.queries("stats_psi_drift")(spark, sfTiny)
      .select($"na", $"nb", $"n_bins", $"psi2_num", $"psi2")
      .as[(Long, Long, Long, Long, Double)].head()
    val docs = Tables.documents(spark, sfTiny)
      .select(($"n_chars" / 10).cast("long").as("bin"),
        ($"lang" === "en").as("isA"))
      .as[(Long, Boolean)].collect()
    val byBin = docs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, rs) => (b, rs.count(_._2) + 1L, rs.count(!_._2) + 1L) }
    val na = byBin.map(_._2).sum
    val nb = byBin.map(_._3).sum
    var num = BigInt(0)
    byBin.foreach { case (_, ca, cb) =>
      val term = BigInt(ca * nb - cb * na) * (lg2fp(ca * nb) - lg2fp(cb * na))
      assert(term >= 0, "PSI term must be non-negative (chord monotone)")
      num += term
    }
    assert(row._1 === na && row._2 === nb && row._3 === byBin.size.toLong)
    assert(row._4 === num.toLong)
    assert(row._5 === num.toDouble / (1048576.0 * na.toDouble * nb.toDouble))
    assert(row._5 >= 0.0)
  }

  test("stats_mutual_info: per-pair PMI and the __all MI match brute force") {
    val FP = 1048576L
    def lg2fp(n: Long): Long = {
      val il = 63 - java.lang.Long.numberOfLeadingZeros(n)
      il * FP + n * FP / (1L << il) - FP
    }
    val rows = SparkEntry.queries("stats_mutual_info")(spark, sfTiny)
      .select($"lang", $"source", $"c", $"pmi2_num", $"score")
      .as[(String, String, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sfTiny)
      .select($"lang", $"source").as[(String, String)].collect()
    val cells = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cx = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cy = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    var mi2 = BigInt(0)
    val pairRows = rows.filter(_._1 != "__all")
    assert(pairRows.length === cells.size)
    pairRows.foreach { case (x, y, c, pmi, score) =>
      assert(c === cells((x, y)), s"($x,$y) count")
      val want = lg2fp(n * c) - lg2fp(cx(x) * cy(y))
      assert(pmi === want, s"($x,$y) pmi")
      assert(score === want.toDouble / 1048576.0)
      mi2 += BigInt(c) * want
    }
    val all = rows.find(_._1 == "__all").get
    assert(all._3 === n)
    assert(all._4 === mi2.toLong)
    assert(all._5 === mi2.toDouble / (1048576.0 * n.toDouble))
  }

  test("stats_gini: exact rational replay per segment; bounds; " +
      "equal-split sanity") {
    val rows = SparkEntry.queries("stats_gini")(spark, sfTiny)
      .select($"seg", $"n", $"sum_cents", $"gini")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val cust = Tables.customer(spark, sfTiny)
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)].collect().toMap
    val rev = Tables.orders(spark, sfTiny)
      .select($"o_custkey", $"o_totalprice").as[(Long, Double)].collect()
      .groupBy(_._1)
      .map { case (k, os) =>
        (cust(k), k) ->
          os.map(o => BigDecimal(o._2).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).sum.toLongExact
      }
    rev.groupBy(_._1._1).foreach { case (seg, m) =>
      val xs = m.toSeq.map { case ((_, k), c) => (c, k) }.sortBy(identity)
      val n = xs.size.toLong
      val sum = xs.map(_._1).map(BigInt(_)).sum
      val siw = xs.zipWithIndex.map { case ((c, _), i0) =>
        BigInt(i0 + 1) * c
      }.sum
      val (_, gn, gsum, ggini) = rows(seg)
      assert(gn === n && BigInt(gsum) === sum, s"seg $seg sizes")
      val num = 2 * siw - BigInt(n + 1) * sum
      assert(ggini === num.toDouble / (BigInt(n) * sum).toDouble, s"seg $seg")
      assert(ggini >= 0.0 && ggini < 1.0)
    }
    assert(rows.keySet === rev.keySet.map(_._1))
  }

  test("stats_benford: counts partition prices; ppm floor math; " +
      "constants sum to ~1") {
    val rows = SparkEntry.queries("stats_benford")(spark, sfTiny)
      .select($"digit", $"n", $"obs_ppm", $"exp_ppm", $"dev_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === (1L to 9L))
    val prices = Tables.lineitem(spark, sfTiny)
      .select($"l_extendedprice").as[Double].collect().filter(_ > 0)
    val byDigit = prices
      .map(p => (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact.toString.head)
      .groupBy(identity).map { case (d, o) => d.toString.toLong -> o.length.toLong }
    val tot = prices.length.toLong
    rows.foreach { case (d, n, obs, exp, dev) =>
      assert(n === byDigit.getOrElse(d, 0L), s"digit $d count")
      assert(obs === n * 1000000L / tot)
      assert(dev === math.abs(obs - exp))
    }
    assert(rows.map(_._2).sum === tot, "digits partition all prices")
    // the hardcoded Benford ppm constants are floor(log10(1+1/d)·1e6)
    rows.foreach { case (d, _, _, exp, _) =>
      assert(exp === math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong,
        s"digit $d expected constant")
    }
  }

  test("stats_cohort_retention: offset-0 is the cohort size; replay at sf0.001") {
    val rows = SparkEntry.queries("stats_cohort_retention")(spark, sfTiny)
      .select($"cohort_week", $"wk_offset", $"n_active", $"n_cohort", $"ret_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // brute-force replay over collected (user, week) activity
    val act = Tables.events(spark, sfTiny)
      .select($"user_id", unix_micros($"ts"))
      .as[(Long, Long)].collect()
      .map { case (u, us) => (u, us / 86400000000L / 7L) }.distinct
    val cohort = act.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val expect = act
      .map { case (u, w) => (cohort(u), w - cohort(u), u) }
      .filter(_._2 <= 8)
      .groupBy(t => (t._1, t._2))
      .map { case ((c, o), us) => (c, o, us.map(_._3).distinct.size.toLong) }
      .toSeq
    val sizes = expect.collect { case (c, 0L, n) => c -> n }.toMap
    val full = expect.map { case (c, o, n) =>
      (c, o, n, sizes(c), n * 1000000L / sizes(c))
    }.sortBy(t => (t._1, t._2))
    assert(rows === full)
    // retention is monotone-bounded: never above the cohort size
    rows.foreach { case (_, _, na, nc, ppm) =>
      assert(na <= nc); assert(ppm <= 1000000L)
    }
  }

  test("stats_ab_test: counts partition events; z replays in the same " +
      "IEEE op order") {
    val row = SparkEntry.queries("stats_ab_test")(spark, sfTiny)
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    val ev = Tables.events(spark, sfTiny)
      .select($"user_id" % 2, ($"event_type" === "purchase"))
      .as[(Long, Boolean)].collect()
    val na = ev.count(_._1 == 0L).toLong
    val nb = ev.size - na
    val ca = ev.count(e => e._1 == 0L && e._2).toLong
    val cb = ev.count(e => e._1 == 1L && e._2).toLong
    assert((row._1, row._2, row._3, row._4) === ((na, nb, ca, cb)))
    assert(row._5 === ca * 1000000L / na && row._6 === cb * 1000000L / nb)
    // the exact pinned expression, replayed in Scala doubles
    val pp = (ca + cb).toDouble / (na + nb).toDouble
    val z = (ca.toDouble / na.toDouble - cb.toDouble / nb.toDouble) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / na.toDouble + 1.0 / nb.toDouble))
    assert(row._7 === z)
  }

  test("mine_assoc_rules: measures replay exactly on collected baskets") {
    val rows = SparkEntry.queries("mine_assoc_rules")(spark, sfTiny)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val li = Tables.lineitem(spark, sfTiny)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey")
      .as[(Long, Int, Long)].collect()
    val byOrder = li.groupBy(_._1)
    val pairs = byOrder.toSeq.flatMap { case (ok, lines) =>
      val byLn = lines.groupBy(_._2)
        .map { case (ln, ls) => ln -> ls.map(_._3).toSeq }
      byLn.toSeq.flatMap { case (ln, ps) =>
        val nxt = byLn.getOrElse(ln + 1, Seq.empty[Long])
        for (p <- ps; q <- nxt if q != p)
          yield (ok, math.min(p, q), math.max(p, q))
      }
    }.distinct
    val supAB = pairs.groupBy(t => (t._2, t._3))
      .map { case (k, o) => k -> o.size.toLong }.filter(_._2 >= 2)
    val item = li.map(t => (t._1, t._3)).distinct.groupBy(_._2)
      .map { case (p, o) => p -> o.size.toLong }
    val nOrd = li.map(_._1).distinct.size.toLong
    val expect = supAB.toSeq.map { case ((x, y), sab) =>
      (x, y, sab, item(x), item(y),
        sab * 1000000L / item(x), sab * 1000000L / item(y),
        sab * nOrd * 1000000L / (item(x) * item(y)))
    }.sortBy(t => (-t._8, t._1, t._2)).take(30)
    assert(rows === expect)
  }

  test("stats_jackknife_ci: exact Long/BigInt replay; CI covers the mean") {
    import org.apache.spark.sql.functions.col
    val xs = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey").cast("long"),
        org.apache.spark.sql.functions.expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .as[(Long, Long)].collect()
    val B = 16
    val blocks = xs.groupBy(_._1 % B).map { case (b, g) =>
      (b, g.length.toLong, g.map(_._2).sum) }.toSeq
    val n = blocks.map(_._2).sum
    val sTot = blocks.map(_._3).sum
    val mb = blocks.map { case (_, nb, sb) =>
      ((BigInt(sTot - sb) * 10) / (n - nb)).toLong } // operands positive
    val bb = blocks.length.toLong
    val sm = mb.sum; val sm2 = mb.map(m => m * m).sum
    val ssd = (BigInt(bb) * sm2 - BigInt(sm) * sm).toDouble
    val theta = ((BigInt(sTot) * 10) / n).toLong
    val se = math.sqrt(ssd * (bb - 1).toDouble) / bb.toDouble

    val r = SparkEntry.queries("stats_jackknife_ci")(spark, sfTiny).head()
    assert(r.getLong(r.fieldIndex("n")) === n)
    assert(r.getLong(r.fieldIndex("n_blocks")) === bb)
    assert(r.getLong(r.fieldIndex("theta_dc")) === theta)
    assert(r.getDouble(r.fieldIndex("ssd_scaled")) === ssd)
    assert(r.getDouble(r.fieldIndex("se_dc")) === se)
    val (lo, hi) = (r.getDouble(r.fieldIndex("ci_lo_dc")),
      r.getDouble(r.fieldIndex("ci_hi_dc")))
    assert(lo === theta.toDouble - 1.96 * se)
    assert(hi === theta.toDouble + 1.96 * se)
    // the interval is a genuine error bar: positive width containing theta
    assert(se > 0.0 && lo < theta.toDouble && theta.toDouble < hi)
  }

  test("packed_intersect_count ≡ size(array_intersect) on random distinct sets") {
    // the exact-Jaccard verify kernel (pack_sorted_strings +
    // packed_intersect_count) must count exactly what array_intersect
    // counts over DISTINCT string sets — including empty sets, disjoint
    // sets, multi-byte UTF-8, and strings that are prefixes of each other
    // (the length tie-break of the binary order)
    val tokGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("a", "ab", "abc", "café", "caf", "é", "世界", ""),
      Gen.chooseNum(0, 99).map(i => s"tok $i"))
    val setGen = Gen.listOfN(40, tokGen).map(_.distinct)
    forSamples(Gen.zip(setGen, setGen), n = 12) { case (xs, ys) =>
      val df = Seq((xs, ys)).toDF("xs", "ys")
        .select(
          expr("packed_intersect_count(pack_sorted_strings(sort_array(xs))," +
            " pack_sorted_strings(sort_array(ys)))").as("merged"),
          size(array_intersect(col("xs"), col("ys"))).as("ref"))
        .head()
      assert(df.getInt(0) === df.getInt(1),
        s"xs=$xs ys=$ys: merge=${df.getInt(0)} ref=${df.getInt(1)}")
    }
  }
}
