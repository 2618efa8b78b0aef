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
}
