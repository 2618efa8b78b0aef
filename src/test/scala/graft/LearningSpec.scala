package graft

import org.apache.spark.sql.functions._

/** Learned-model operators: value-level pins independent of the DuckDB
  * oracle — the NB scorer is replayed in Scala Long fixed-point
  * arithmetic (same lg2qfp recurrence), and the kNN probe's structural
  * contract (holdout coverage, vote bounds, label provenance) is
  * asserted directly.
  */
class LearningSpec extends SparkSpec {
  import spark.implicits._

  private val FP = 1048576L

  /** Scala replay of IntMath.lg2qfp (quadratic-corrected chord log2). */
  private def lg2q(n: Long): Long = {
    require(n > 0, s"lg2q domain: $n")
    val i = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val f = n * FP / (1L << i) - FP
    i * FP + f + f * (FP - f) / 3044646L
  }

  test("ml_naive_bayes replays exactly in Long fixed point at sf0.001") {
    val docs = Tables.documents(spark, sfTiny)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    val train = docs.filter(_._1 % 5 != 0)
    val hold = docs.filter(_._1 % 5 == 0)

    // model
    val t = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    val pri = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val vocab = scala.collection.mutable.Set.empty[String]
    for ((_, lang, text) <- train) {
      pri(lang) += 1
      for (w <- text.split(" ")) { t((lang, w)) += 1; vocab += w }
    }
    val classes = pri.keys.toSeq.sorted
    val tt = classes.map(c =>
      c -> t.collect { case ((`c`, _), n) => n }.sum).toMap
    val nTrain = train.length.toLong
    val v = vocab.size.toLong

    val exp = hold.sortBy(_._1).map { case (id, actual, text) =>
      val ws = text.split(" ").groupBy(identity).map { case (w, g) =>
        w -> g.length.toLong }
      val ntok = ws.values.sum
      val scored = classes.map { c =>
        val prior = lg2q(pri(c)) - lg2q(nTrain)
        val matched = ws.map { case (w, n) =>
          val cnt = t((c, w))
          if (cnt > 0) n * lg2q(cnt + 1) else 0L
        }.sum
        c -> (prior + matched - ntok * lg2q(tt(c) + v))
      }
      val (pred, score) = scored.minBy { case (c, s) => (-s, c) }
      (id, actual, pred, score)
    }

    val got = SparkEntry.queries("ml_naive_bayes")(spark, sfTiny)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === exp.toSeq)
  }

  test("ml_decision_stump replays the exact split search at sf0.001") {
    val docs = Tables.documents(spark, sfTiny)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    val stop = Set("the", "a", "of", "and")
    def fv(text: String): Seq[(String, Long)] = {
      val toks = text.split(" ")
      Seq("n_tok" -> toks.length.toLong,
        "n_distinct" -> toks.distinct.length.toLong,
        "n_stop" -> toks.count(stop).toLong)
    }
    val train = docs.filter(_._1 % 5 != 0)
    val hold = docs.filter(_._1 % 5 == 0)
    // exact search over the (feature, value) domain
    val cands = for {
      feat <- Seq("n_tok", "n_distinct", "n_stop")
      rows = train.map { case (_, lang, text) =>
        (fv(text).toMap.apply(feat), if (lang == "en") 1L else 0L) }
      totN = rows.length.toLong
      totP = rows.map(_._2).sum
      v <- rows.map(_._1).distinct.sorted
    } yield {
      val cumN = rows.count(_._1 <= v).toLong
      val cumP = rows.filter(_._1 <= v).map(_._2).sum
      val errLe = (cumN - cumP) + (totP - cumP)
      val errGt = cumP + ((totN - cumN) - (totP - cumP))
      (math.min(errLe, errGt), feat, v, errLe <= errGt, totN, totP)
    }
    val (err, feat, v, enLeft, totN, totP) =
      cands.minBy { case (e, f, vv, _, _, _) => (e, f, vv) }
    // the stump can never be worse than majority prediction
    assert(err <= math.min(totP, totN - totP))
    val holdRows = hold.map { case (_, lang, text) =>
      (fv(text).toMap.apply(feat), if (lang == "en") 1L else 0L) }
    val holdErr = holdRows.count { case (hv, y) =>
      val pred = if (enLeft) (if (hv <= v) 1L else 0L)
                 else (if (hv > v) 1L else 0L)
      pred != y
    }.toLong
    val row = SparkEntry.queries("ml_decision_stump")(spark, sfTiny).head()
    assert(row.getString(row.fieldIndex("feature")) === feat)
    assert(row.getLong(row.fieldIndex("threshold")) === v)
    assert(row.getBoolean(row.fieldIndex("en_on_left")) === enLeft)
    assert(row.getLong(row.fieldIndex("train_err")) === err)
    assert(row.getLong(row.fieldIndex("holdout_err")) === holdErr)
  }

  test("ml_logreg replays exactly in Long fixed point; holdout beats majority") {
    // Full Scala replay of the gradient protocol (the NB-replay pattern):
    // identical integer features, the single softsign IEEE division on
    // the same doubles, exact integer gradient sums, Math.floorDiv
    // updates — the query's weights, stats, and holdout metrics must be
    // BIT-IDENTICAL. Then the sanity bar: holdout accuracy must beat
    // predicting the majority class.
    val stopEn = Set("the", "a", "of", "and", "to")
    val S20 = 1048576L
    def feats(text: String): (Array[Long], Long) = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val nt = toks.length.toLong
      val x1 = math.min(nt, 1000L)
      val x2 = if (nt == 0) 0L else 1000L * toks.count(stopEn) / nt
      val txt = text
      val x3 = if (txt.isEmpty) 0L
        else 1000L * txt.replaceAll("[^a-zA-Z]", "").length / txt.length
      val x4 = if (nt < 2) 0L else {
        val bg = toks.sliding(2).map(_.mkString(" ")).toSeq
        1000L * (bg.length - bg.distinct.length) / bg.length
      }
      val y = if (nt < 20 || x2 < 20 || x3 < 810 || x4 > 80) 0L else 1L
      (Array(x1, x2, x3, x4), y)
    }
    val docs = Tables.documents(spark, sfTiny)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) => val (x, y) = feats(text); (id, x, y) }
    val train = docs.filter(_._1 % 5 != 0)
    val hold = docs.filter(_._1 % 5 == 0)
    val n = train.length.toLong
    val mu = (0 to 3).map(j => train.map(_._2(j)).sum / n)
    val mad = (0 to 3).map(j =>
      math.max(1L, train.map(r => math.abs(r._2(j) - mu(j))).sum / n))
    def f(x: Array[Long]): Array[Long] =
      1000L +: Array.tabulate(4) { j =>
        val v = math.floor((1000L * (x(j) - mu(j))).toDouble / mad(j)).toLong
        math.max(-10000L, math.min(10000L, v))
      }
    val W = Array.fill(5)(0L)
    (1 to 4).foreach { _ =>
      val g = Array.fill(5)(0L)
      train.foreach { case (_, x, y) =>
        val ff = f(x)
        val zfp = (0 to 4).map(j => W(j) * ff(j)).sum
        val z = zfp.toDouble / 16777216.0
        val sg = math.floor((0.5 + 0.5 * (z / (1.0 + math.abs(z)))) * 1048576.0).toLong
        val res = sg - y * S20
        (0 to 4).foreach(j => g(j) += res * ff(j))
      }
      (0 to 4).foreach(j => W(j) -= Math.floorDiv(16L * g(j), n * S20))
    }
    val holdErr = hold.count { case (_, x, y) =>
      val ff = f(x)
      val zfp = (0 to 4).map(j => W(j) * ff(j)).sum
      (if (zfp > 0) 1L else 0L) != y
    }.toLong

    val rows = SparkEntry.queries("ml_logreg")(spark, sfTiny)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 5)
    rows.foreach { case (j, wfp, muQ, madQ, nHold, errQ) =>
      assert(wfp === W(j.toInt), s"weight $j diverged")
      if (j == 0) { assert(muQ === 0L); assert(madQ === 1L) }
      else { assert(muQ === mu(j.toInt - 1)); assert(madQ === mad(j.toInt - 1)) }
      assert(nHold === hold.length.toLong)
      assert(errQ === holdErr)
    }
    // the optimizer must have LEARNED something: beat the majority class
    val keepShare = hold.count(_._3 == 1L)
    val majority = math.max(keepShare, hold.length - keepShare)
    assert(hold.length.toLong - holdErr > majority,
      s"holdout accuracy ${hold.length - holdErr}/${hold.length} does not " +
        s"beat the majority baseline $majority/${hold.length}")
  }

  test("ml_perceptron replays exactly in pure Long arithmetic; vote beats majority") {
    // The averaged perceptron's whole claim is ZERO floating point: the
    // replay below is pure Long (floorDiv features, floorDiv updates,
    // integer dot-product sign) and must match the query bit-for-bit —
    // there is no IEEE step to agree on, unlike the logreg replay.
    val stopEn = Set("the", "a", "of", "and", "to")
    def feats(text: String): (Array[Long], Long) = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val nt = toks.length.toLong
      val x1 = math.min(nt, 1000L)
      val x2 = if (nt == 0) 0L else 1000L * toks.count(stopEn) / nt
      val x3 = if (text.isEmpty) 0L
        else 1000L * text.replaceAll("[^a-zA-Z]", "").length / text.length
      val x4 = if (nt < 2) 0L else {
        val bg = toks.sliding(2).map(_.mkString(" ")).toSeq
        1000L * (bg.length - bg.distinct.length) / bg.length
      }
      val y = if (nt < 20 || x2 < 20 || x3 < 810 || x4 > 80) 0L else 1L
      (Array(x1, x2, x3, x4), y)
    }
    val docs = Tables.documents(spark, sfTiny)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) => val (x, y) = feats(text); (id, x, y) }
    val train = docs.filter(_._1 % 5 != 0)
    val hold = docs.filter(_._1 % 5 == 0)
    val n = train.length.toLong
    val mu = (0 to 3).map(j => train.map(_._2(j)).sum / n)
    val mad = (0 to 3).map(j =>
      math.max(1L, train.map(r => math.abs(r._2(j) - mu(j))).sum / n))
    def f(x: Array[Long]): Array[Long] =
      1000L +: Array.tabulate(4) { j =>
        val v = Math.floorDiv(1000L * (x(j) - mu(j)), mad(j))
        math.max(-10000L, math.min(10000L, v))
      }
    val W = Array.fill(5)(0L)
    val A = Array.fill(5)(0L)
    (1 to 4).foreach { _ =>
      val g = Array.fill(5)(0L)
      train.foreach { case (_, x, y) =>
        val ff = f(x)
        val z = (0 to 4).map(j => W(j) * ff(j)).sum
        val d = y - (if (z > 0) 1L else 0L)
        if (d != 0) (0 to 4).foreach(j => g(j) += d * ff(j))
      }
      (0 to 4).foreach { j => W(j) += Math.floorDiv(g(j), n); A(j) += W(j) }
    }
    def predict(x: Array[Long]): Long = {
      val ff = f(x)
      if ((0 to 4).map(j => A(j) * ff(j)).sum > 0) 1L else 0L
    }
    val trainErr = train.count { case (_, x, y) => predict(x) != y }.toLong
    val holdErr = hold.count { case (_, x, y) => predict(x) != y }.toLong

    val rows = SparkEntry.queries("ml_perceptron")(spark, sfTiny)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length === 5)
    rows.foreach { case (j, aV, wL, muQ, madQ, nTr, trE, nHo, hoE) =>
      assert(aV === A(j.toInt), s"vote accumulator $j diverged")
      assert(wL === W(j.toInt), s"final weight $j diverged")
      if (j == 0) { assert(muQ === 0L); assert(madQ === 1L) }
      else { assert(muQ === mu(j.toInt - 1)); assert(madQ === mad(j.toInt - 1)) }
      assert(nTr === n)
      assert(trE === trainErr)
      assert(nHo === hold.length.toLong)
      assert(hoE === holdErr)
    }
    val keepShare = hold.count(_._3 == 1L)
    val majority = math.max(keepShare, hold.length - keepShare)
    assert(hold.length.toLong - holdErr > majority,
      s"holdout accuracy ${hold.length - holdErr}/${hold.length} does not " +
        s"beat the majority baseline $majority/${hold.length}")
  }

  test("ml_ridge replays the exact BigInt Cramer solve; fit beats zero") {
    // Closed-form twin of the gradient replays: identical integer
    // features, exact Long moment sums, the same /n floor-normalized
    // 3x3 system, BigInt Cramer determinants, floor-division weights —
    // weights, stats, and SSE metrics must be BIT-IDENTICAL. No IEEE
    // operation exists anywhere (the perceptron's discipline).
    val stopEn = Set("the", "a", "of", "and", "to")
    val S20 = 1048576L
    def feats(text: String): (Long, Long, Long) = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val nt = toks.length.toLong
      val x2 = if (nt == 0) 0L else 1000L * toks.count(stopEn) / nt
      val x3 = if (text.isEmpty) 0L
        else 1000L * text.replaceAll("[^a-zA-Z]", "").length / text.length
      val x4 = if (nt < 2) 0L else {
        val bg = toks.sliding(2).map(_.mkString(" ")).toSeq
        1000L * (bg.length - bg.distinct.length) / bg.length
      }
      (x2, x3, x4)
    }
    val docs = Tables.documents(spark, sfTiny)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) => val (x2, x3, t) = feats(text); (id, x2, x3, t) }
    val train = docs.filter(_._1 % 5 != 0)
    val hold = docs.filter(_._1 % 5 == 0)
    val n = train.length.toLong
    val mu2 = train.map(_._2).sum / n
    val mu3 = train.map(_._3).sum / n
    val mad2 = math.max(1L, train.map(r => math.abs(r._2 - mu2)).sum / n)
    val mad3 = math.max(1L, train.map(r => math.abs(r._3 - mu3)).sum / n)
    def f(x2: Long, x3: Long): Array[Long] = Array(1000L,
      math.max(-10000L, math.min(10000L,
        Math.floorDiv(1000L * (x2 - mu2), mad2))),
      math.max(-10000L, math.min(10000L,
        Math.floorDiv(1000L * (x3 - mu3), mad3))))
    // moments
    val mm = Array.fill(9)(0L)
    train.foreach { case (_, x2, x3, t) =>
      val ff = f(x2, x3)
      mm(0) += ff(0) * ff(0); mm(1) += ff(0) * ff(1); mm(2) += ff(0) * ff(2)
      mm(3) += ff(1) * ff(1); mm(4) += ff(1) * ff(2); mm(5) += ff(2) * ff(2)
      mm(6) += ff(0) * t; mm(7) += ff(1) * t; mm(8) += ff(2) * t
    }
    def fd(i: Int): BigInt = BigInt(Math.floorDiv(mm(i), n))
    val A = Array(
      Array(fd(0), fd(1), fd(2)),
      Array(fd(1), fd(3) + 10000L, fd(4)),
      Array(fd(2), fd(4), fd(5) + 10000L))
    val c = Array(fd(6), fd(7), fd(8))
    def det(x: Array[Array[BigInt]]): BigInt =
      x(0)(0) * (x(1)(1) * x(2)(2) - x(1)(2) * x(2)(1)) -
        x(0)(1) * (x(1)(0) * x(2)(2) - x(1)(2) * x(2)(0)) +
        x(0)(2) * (x(1)(0) * x(2)(1) - x(1)(1) * x(2)(0))
    def floorDivB(num: BigInt, den: BigInt): BigInt = {
      val q = num / den
      if (num % den != 0 && num.signum != den.signum) q - 1 else q
    }
    val dA = det(A)
    assert(dA > 0, "ridge-regularized system must be positive definite")
    val W = (0 to 2).map { j =>
      val Aj = Array.tabulate(3, 3)((r, cc) => if (cc == j) c(r) else A(r)(cc))
      floorDivB(det(Aj) * S20, dA)
        .max(BigInt(-1000000000000L)).min(BigInt(1000000000000L)).toLong
    }
    def pred(x2: Long, x3: Long): Long = {
      val ff = f(x2, x3)
      val num = (0 to 2).map(j => W(j) * ff(j)).sum
      math.max(-1000000L, math.min(1000000L, Math.floorDiv(num, S20)))
    }
    val sseTrain = train.map { case (_, x2, x3, t) =>
      val r = t - pred(x2, x3); r * r }.sum
    val sseHold = hold.map { case (_, x2, x3, t) =>
      val r = t - pred(x2, x3); r * r }.sum

    val rows = SparkEntry.queries("ml_ridge")(spark, sfTiny)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length === 3)
    rows.foreach { case (j, wfp, muQ, madQ, nTr, sseT, nHo, sseH) =>
      assert(wfp === W(j.toInt), s"weight $j diverged")
      if (j == 0) { assert(muQ === 0L); assert(madQ === 1L) }
      else if (j == 1) { assert(muQ === mu2); assert(madQ === mad2) }
      else { assert(muQ === mu3); assert(madQ === mad3) }
      assert(nTr === n)
      assert(sseT === sseTrain)
      assert(nHo === hold.length.toLong)
      assert(sseH === sseHold)
    }
    // the solve must have FIT something: beat the zero predictor, and
    // use at least one non-intercept feature
    val sseZero = train.map { case (_, _, _, t) => t * t }.sum
    assert(sseTrain < sseZero, "learned fit does not beat pred=0")
    assert(W(1) != 0L || W(2) != 0L, "no non-intercept signal learned")
  }

  test("ml_knn_classifier: holdout-only rows, bounded votes, trained labels") {
    val got = SparkEntry.queries("ml_knn_classifier")(spark, sfTiny)
      .as[(Long, Int, Int, Long, Boolean)].collect()
    assert(got.nonEmpty, "no holdout vector found any LSH candidate")
    assert(got.map(_._1).distinct.length === got.length, "one row per query")
    assert(got.forall(_._1 % 7 == 0), "only vec_id % 7 = 0 is holdout")
    assert(got.forall(r => r._4 >= 1 && r._4 <= 5), "votes in [1, 5]")
    assert(got.forall(r => (r._2 == r._3) === r._5), "correct flag consistent")
    val trainLabels = Tables.embeddings(spark, sfTiny)
      .filter($"vec_id" % 7 =!= 0)
      .select($"label").distinct().as[Int].collect().toSet
    assert(got.forall(r => trainLabels(r._3)),
      "every prediction is a label some train vector carries")
  }

  test("ml_gbt_stumps replays the exact boosting loop; staged fit improves") {
    // Long/BigInt twin of the engine's stage-wise loop: identical
    // integer features, the same (reduction DESC, feature, value)
    // argmax over every candidate split, sign-split floor-division
    // leaves, power-of-two shrinkage — rules and per-round mean squared
    // residuals must be BIT-IDENTICAL, and the staging must actually
    // fit (train MSE strictly decreasing, round 1 beats the zero
    // model).
    val stopEn = Set("the", "a", "of", "and", "to")
    val S = 1048576L
    def feats(text: String): (Long, Long, Long, Long) = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val nt = toks.length.toLong
      val x1 = math.min(nt, 1000L)
      val x2 = if (nt == 0) 0L else 1000L * toks.count(stopEn) / nt
      val x3 = if (text.isEmpty) 0L
        else 1000L * text.replaceAll("[^a-zA-Z]", "").length / text.length
      val x4 = if (nt < 2) 0L else {
        val bg = toks.sliding(2).map(_.mkString(" ")).toSeq
        1000L * (bg.length - bg.distinct.length) / bg.length
      }
      (x1, x2, x3, x4)
    }
    val docs = Tables.documents(spark, sfTiny)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val (x1, x2, x3, x4) = feats(t); (id, x1, x2, x3, x4) }
    val train = docs.filter(_._1 % 5 != 0)
    val hold = docs.filter(_._1 % 5 == 0)
    assert(train.nonEmpty && hold.nonEmpty)
    def fv(feat: Int)(d: (Long, Long, Long, Long, Long)): Long =
      feat match { case 1 => d._2; case 2 => d._3; case _ => d._4 }
    var rTr = train.map(_._5 * S)
    var rHo = hold.map(_._5 * S)
    def mse(rs: Array[Long]): Long =
      (rs.map(r => BigInt(r) * r).sum / rs.length).toLong
    val mse0 = mse(rTr)
    var rules = Vector.empty[(Int, Long, Long, Long)]
    var mseT = Vector.empty[Long]
    var mseH = Vector.empty[Long]
    for (_ <- 1 to 3) {
      var best: Option[(BigInt, Int, Long, Long, Long)] = None
      for (feat <- 1 to 3) {
        val groups = train.zip(rTr).groupBy { case (d, _) => fv(feat)(d) }
        val ct = train.length.toLong
        val srt = rTr.sum
        var cl = 0L; var srl = 0L
        for (v <- groups.keys.toSeq.sorted) {
          val g = groups(v)
          cl += g.length; srl += g.map(_._2).sum
          if (ct > cl) {
            val muL = Math.floorDiv(srl, cl)
            val muR = Math.floorDiv(srt - srl, ct - cl)
            val red = BigInt(2) * muL * srl - BigInt(cl) * muL * muL +
              BigInt(2) * muR * (srt - srl) - BigInt(ct - cl) * muR * muR
            val c = (red, feat, v, muL, muR)
            best = Some(best.fold(c)(b =>
              if (c._1 > b._1 || (c._1 == b._1 &&
                (c._2 < b._2 || (c._2 == b._2 && c._3 < b._3)))) c else b))
          }
        }
      }
      val b = best.get
      rules :+= ((b._2, b._3, b._4, b._5))
      val cL = Math.floorDiv(b._4, 2); val cR = Math.floorDiv(b._5, 2)
      def upd(d: (Long, Long, Long, Long, Long), r: Long): Long =
        r - (if (fv(b._2)(d) <= b._3) cL else cR)
      rTr = train.zip(rTr).map { case (d, r) => upd(d, r) }
      rHo = hold.zip(rHo).map { case (d, r) => upd(d, r) }
      mseT :+= mse(rTr); mseH :+= mse(rHo)
    }
    val got = SparkEntry.queries("ml_gbt_stumps")(spark, sfTiny)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.length === 3)
    got.foreach { case (round, feat, v, muL, muR, tm, hm) =>
      val k = round.toInt - 1
      assert(feat === rules(k)._1.toLong, s"round $round feature diverged")
      assert(v === rules(k)._2, s"round $round threshold diverged")
      assert(muL === rules(k)._3, s"round $round mu_left diverged")
      assert(muR === rules(k)._4, s"round $round mu_right diverged")
      assert(tm === mseT(k), s"round $round train MSE diverged")
      assert(hm === mseH(k), s"round $round holdout MSE diverged")
    }
    assert(mseT(0) < mse0, "round 1 does not beat the zero model")
    assert(mseT(1) < mseT(0) && mseT(2) < mseT(1),
      "staged train MSE must strictly decrease on this corpus")
  }
}
