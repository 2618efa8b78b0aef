package graft

import org.apache.spark.sql.functions._

/** Language-ID / token-stat / tf-idf semantics on crafted documents with
  * known answers.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = scratchDir("text")
    val docs = Seq(
      (0L, "the cat sat on the mat and looked a bit bored", "en", "s", 45L),
      (1L, "der hund und die katze sind freunde und das ist gut", "de", "s", 51L),
      (2L, "el perro y la gata son amigos y los dos duermen que bien", "es", "s", 56L),
      (3L, "le chien et les chats dorment dans une maison", "fr", "s", 45L),
      (4L, "data data data pipeline pipeline spark", "en", "s", 38L),
      // degenerate documents: empty and whitespace-only — zero tokens,
      // the ANSI divide-by-zero / NULL-divergence regression case
      (5L, "", "en", "s", 0L),
      (6L, "   ", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("text_lang_id predicts the dominant stopword profile") {
    val pred = SparkEntry.queries("text_lang_id")(spark, dir)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(pred(0L) === "en")
    assert(pred(1L) === "de")
    assert(pred(2L) === "es")
    assert(pred(3L) === "fr")
  }

  test("text_token_stats counts whitespace tokens and distinct tokens") {
    val row = SparkEntry.queries("text_token_stats")(spark, dir)
      .filter(col("doc_id") === 4L).collect().head
    assert(row.getAs[Long]("n_tokens") === 6L)
    assert(row.getAs[Long]("n_distinct") === 3L)
    assert(row.getAs[Long]("n_chars") === 38L)
    assert(row.getAs[Long]("est_bpe_tokens") === (38L + 3) / 4)
  }

  test("text_tfidf ranks repeated rare terms first") {
    val top = SparkEntry.queries("text_tfidf")(spark, dir)
      .filter(col("doc_id") === 4L && col("rnk") === 1).collect().head
    assert(top.getAs[String]("tok") === "data")
    assert(top.getAs[Long]("tf") === 3L)
  }

  test("text_quality ratios are exact rationals in [0, 1]") {
    val rows = SparkEntry.queries("text_quality")(spark, dir)
      .filter(col("n_tokens") > 0).collect()
    rows.foreach { r =>
      val sw = r.getAs[Double]("stopword_ratio")
      val al = r.getAs[Double]("alpha_ratio")
      assert(sw >= 0.0 && sw <= 1.0)
      assert(al >= 0.0 && al <= 1.0)
    }
    // doc 0: "the" ×2 + "a" ×1 + "and" ×1 of 11 tokens
    val d0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(d0.getAs[Double]("stopword_ratio") === 4.0 / 11.0)
  }

  test("empty / whitespace-only documents yield NULL ratios, no divide error") {
    val q = SparkEntry.queries("text_quality")(spark, dir)
      .filter(col("doc_id") >= 5L).collect()
    assert(q.length === 2)
    q.foreach { r =>
      assert(r.getAs[Long]("n_tokens") === 0L)
      assert(r.isNullAt(r.fieldIndex("stopword_ratio")))
      assert(r.isNullAt(r.fieldIndex("distinct_ratio")))
      assert(r.isNullAt(r.fieldIndex("quality_score")))
    }
    // alpha_ratio: NULL only when the text itself is zero-length
    val byId = q.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(5L).isNullAt(byId(5L).fieldIndex("alpha_ratio")))
    assert(byId(6L).getAs[Double]("alpha_ratio") === 0.0)
    val ts = SparkEntry.queries("text_token_stats")(spark, dir)
      .filter(col("doc_id") >= 5L).collect()
    ts.foreach(r => assert(r.isNullAt(r.fieldIndex("avg_token_len"))))
  }

  test("text_pii_scrub redacts planted emails and phone numbers") {
    val d = scratchDir("textpii")
    Seq(
      (0L, "contact alice.smith+x@example.org or call 555-123-4567 today", "en", "s", 60L),
      (1L, "no pii in this one just words", "en", "s", 29L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("text_pii_scrub")(spark, d)
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .as[(Long, Long, Long, String)].collect()
      .map { case (k, e, p, r) => k -> ((e, p, r)) }.toMap
    assert(rows(0L)._1 === 1L && rows(0L)._2 === 1L)
    assert(rows(0L)._3 === "contact <EMAIL> or call <PHONE> today")
    assert(rows(1L) === ((0L, 0L, "no pii in this one just words")))
  }

  test("text_fingerprint: equal texts get equal fingerprints") {
    val d = scratchDir("textfp")
    Seq(
      (0L, "same text here", "en", "s", 14L),
      (1L, "same text here", "en", "s", 14L),
      (2L, "other text here", "en", "s", 15L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val fp = SparkEntry.queries("text_fingerprint")(spark, d)
      .select("doc_id", "content_md5", "simhash")
      .as[(Long, String, String)].collect()
      .map { case (id, m, s) => id -> ((m, s)) }.toMap
    assert(fp(0L) === fp(1L))
    assert(fp(0L)._1 !== fp(2L)._1)
  }

  test("text_normalize composes NFD to NFC, lowercases, collapses whitespace") {
    val d = scratchDir("text_norm")
    val nfdCafe = "cafe\u0301"   // e + COMBINING ACUTE (decomposed)
    val nfcCafe = "caf\u00e9"    // precomposed
    Seq(
      (0L, s"  CAFE   du   $nfdCafe ", "fr", "s", 20L),
      (1L, s"cafe du $nfcCafe", "fr", "s", 11L),
      (2L, "ASCII Stays  As IS", "en", "s", 18L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("text_normalize")(spark, d)
      .select("doc_id", "norm_text", "norm_md5")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // the decomposed, mixed-case, ragged-whitespace doc 0 canonicalizes
    // to exactly doc 1's bytes — same text, same md5, so downstream
    // exact dedup collapses them
    assert(out(0L)._1 === s"cafe du $nfcCafe")
    assert(out(0L) === out(1L))
    assert(out(2L)._1 === "ascii stays as is")
  }

  test("text_repetition scores planted bigram repetition exactly") {
    import org.apache.spark.sql.functions.lit
    val d = scratchDir("text_rep")
    Seq(
      (0L, "a b a b a b", "en", "s"),         // 5 bigrams, 2 distinct
      (1L, "u v w x y z", "en", "s"),         // all distinct
      (2L, "solo", "en", "s")                 // no bigrams
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", lit(10L))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("text_repetition")(spark, d)
      .select("doc_id", "n_bigrams", "n_dup_bigrams", "dup_bigram_frac",
        "dup_trigram_frac", "top_bigram", "top_bigram_cnt")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r0 = out(0L)
    assert(r0.getLong(1) === 5L && r0.getLong(2) === 3L)
    assert(r0.getDouble(3) === 0.6)
    assert(r0.getDouble(4) === 0.5)            // 4 trigrams, 2 distinct
    assert(r0.getString(5) === "a b" && r0.getLong(6) === 3L)
    val r1 = out(1L)
    assert(r1.getLong(2) === 0L && r1.getDouble(3) === 0.0)
    // "z y" > ... > "u v" on count ties the DESC gram order picks "y z"
    assert(r1.getString(5) === "y z")
    val r2 = out(2L)
    assert(r2.getLong(1) === 0L && r2.isNullAt(3) && r2.isNullAt(5))
  }

  test("nfc_normalize expression: interpreted and codegen agree with Normalizer") {
    // reference = java.text.Normalizer computed driver-side; the column
    // runs through whole-stage codegen (defineCodeGen path)
    val samples = Seq("cafe\u0301", "caf\u00e9", "A\u030a", "\u00c5",
      "plain ascii", "", "ffi \ufb03")
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), expr("nfc_normalize(t)").as("n"))
    val got = df.as[(Long, String)].collect().toMap
    samples.zipWithIndex.foreach { case (t, i) =>
      val expect = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      assert(got(i.toLong) === expect, s"sample $i")
    }
    // null propagates
    val nulls = Seq((0L, null: String)).toDF("id", "t")
      .select(expr("nfc_normalize(t)")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("text_bm25: fused score is the fixed-order sum; ranking is sorted and positive") {
    val rows = SparkEntry.queries("text_bm25")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (id, sj, sf, sg, total) =>
      assert(total == sj + sf + sg, s"doc $id fused sum drifted")
      assert(total > 0.0 && sj >= 0.0 && sf >= 0.0 && sg >= 0.0)
    }
    // descending by fused score, doc_id tie-break
    val keys = rows.map { case (id, _, _, _, t) => (-t, id) }
    assert(keys.sameElements(keys.sorted), "not ranked by (bm25 desc, doc_id)")
  }

  test("bm25 tf-saturation: more hits score higher, with diminishing gain") {
    import spark.implicits._
    // same document length, rising tf of 'join': score must rise but
    // the marginal gain must shrink (the k1 saturation BM25 exists for)
    val d = scratchDir("bm25")
    val docs = Seq(
      (1L, "join pad pad pad pad pad pad pad", "en", "s", 10L),
      (2L, "join join pad pad pad pad pad pad", "en", "s", 10L),
      (3L, "join join join pad pad pad pad pad", "en", "s", 10L),
      (4L, "filter group pad pad pad pad pad pad", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val byDoc = SparkEntry.queries("text_bm25")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (s1, s2, s3) = (byDoc(1L), byDoc(2L), byDoc(3L))
    assert(s1 < s2 && s2 < s3, s"tf-monotonicity broken: $s1 $s2 $s3")
    assert(s3 - s2 < s2 - s1, "no tf saturation — k1 term lost")
  }

  test("text_html_strip recovers the exact pre-markup text of every doc") {
    val got = SparkEntry.queries("text_html_strip")(spark, sfTiny)
      .select($"doc_id", $"n_tags", $"clean", $"n_chars_clean")
      .as[(Long, Long, String, Long)].collect()
    val raw = Tables.documents(spark, sfTiny)
      .select($"doc_id", $"text", $"lang", $"source")
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.length === raw.size)
    got.foreach { case (id, nTags, clean, nChars) =>
      val (_, text, lang, source) = raw(id)
      // the envelope wraps with exactly 6 tags; tag-free source text
      // means the stripper must find exactly those
      assert(nTags === 6L, s"doc $id: $nTags tags")
      // brute-force the wrap → strip → unescape → collapse pipeline
      val expected = s"$source & $lang ${text.trim}"
        .replaceAll(" +", " ").trim
      assert(clean === expected, s"doc $id")
      assert(nChars === expected.length.toLong)
    }
  }

  test("text_perplexity equals brute-force fixed-point bigram NLL; chord bound holds") {
    val FP = 1048576L
    def lg2fp(n: Long): Long = {
      val il = 63 - java.lang.Long.numberOfLeadingZeros(n)
      il * FP + n * FP / (1L << il) - FP
    }
    val got = SparkEntry.queries("text_perplexity")(spark, sfTiny)
      .select($"doc_id", $"n_bigrams", $"nll2_fp", $"bits_per_bigram")
      .as[(Long, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sfTiny)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val pairs = docs.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      if (ws.length < 2) Array.empty[(Long, String, String)]
      else ws.sliding(2).map(p => (id, p(0), p(1))).toArray
    }
    val cb = pairs.groupBy(p => (p._2, p._3)).view.mapValues(_.length.toLong).toMap
    val cp = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val v = docs.flatMap(_._2.split(" ", -1)).distinct.length.toLong
    val want = pairs.groupBy(_._1).map { case (id, ps) =>
      val nll = ps.map(p => lg2fp(cp(p._2) + v) - lg2fp(cb((p._2, p._3)) + 1)).sum
      id -> (ps.length.toLong, nll)
    }
    assert(got.length === want.size)
    got.foreach { case (id, nb, nll, bits) =>
      val (wNb, wNll) = want(id)
      assert(nb === wNb, s"doc $id n_bigrams")
      assert(nll === wNll, s"doc $id nll2_fp")
      assert(bits === wNll.toDouble / (1048576.0 * wNb.toDouble), s"doc $id")
      // each chord term under-reads log2 by gap(x) ∈ [0, 0.086] bits
      // (exact at power-of-2 knots, concavity between); an NLL term is
      // a DIFFERENCE of two chords, so its error is two-sided but
      // bounded by one gap: |fp − true| ≤ 0.086 per bigram. Positivity
      // holds because the chord is monotone and cp+v ≥ cb+1.
      val trueNll = pairs.filter(_._1 == id).map(p =>
        math.log(cp(p._2) + v.toDouble) / math.log(2) -
          math.log(cb((p._2, p._3)) + 1.0) / math.log(2)).sum
      val fpBits = nll.toDouble / FP
      assert(fpBits >= 0.0, s"doc $id negative NLL")
      assert(math.abs(trueNll - fpBits) <= 0.086 * nb + 1e-9,
        s"doc $id chord error: fp $fpBits vs true $trueNll over $nb terms")
    }
  }

  test("text_entropy equals brute-force chord entropy; 0 ≤ H ≤ lg2(n)") {
    val FP = 1048576L
    def lg2fp(n: Long): Long = {
      val il = 63 - java.lang.Long.numberOfLeadingZeros(n)
      il * FP + n * FP / (1L << il) - FP
    }
    val got = SparkEntry.queries("text_entropy")(spark, sfTiny)
      .select($"doc_id", $"n_tokens", $"h2_num", $"bits_per_token")
      .as[(Long, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sfTiny)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(got.length === docs.length)
    val byId = docs.toMap
    got.foreach { case (id, n, h2, bits) =>
      val counts = byId(id).split(" ", -1).groupBy(identity)
        .map(_._2.length.toLong)
      val wantN = counts.sum
      val wantH2 = wantN * lg2fp(wantN) - counts.map(c => c * lg2fp(c)).sum
      assert(n === wantN, s"doc $id n_tokens")
      assert(h2 === wantH2, s"doc $id h2_num")
      assert(bits === wantH2.toDouble / (1048576.0 * wantN.toDouble))
      // Σ c·chord(c) ≤ chord(n)·Σc gives H ≥ 0; H ≤ lg2(n) since the
      // uniform-all-distinct case maxes at chord(n)/FP ≤ log2(n)
      assert(bits >= 0.0, s"doc $id negative entropy")
      assert(bits <= math.log(wantN.toDouble) / math.log(2) + 1e-9,
        s"doc $id entropy above lg2(n)")
    }
  }

  test("text_zipf_slope: a perfect Zipf(1) corpus reads exactly 1.0 at every anchor") {
    val d = scratchDir("zipf")
    // ranks 1/2/4/8/16 get frequencies 64/32/16/8/4 — anchor frequencies
    // all sit AT power-of-two chord knots, where the chord log2 is exact,
    // so slope_fp must be exactly 2^20 (slope 1.0) for every j. Filler
    // ranks between anchors stay strictly inside the ordering.
    val freqs = Seq(
      "r01" -> 64, "r02" -> 32, "r03" -> 20, "r04" -> 16,
      "r05" -> 10, "r06" -> 10, "r07" -> 10, "r08" -> 8,
      "r09" -> 5, "r10" -> 5, "r11" -> 5, "r12" -> 5,
      "r13" -> 5, "r14" -> 5, "r15" -> 5, "r16" -> 4)
    val text = freqs.flatMap { case (t, c) => Seq.fill(c)(t) }.mkString(" ")
    Seq((0L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("text_zipf_slope")(spark, d)
      .select("j", "rnk", "freq", "slope_fp", "slope")
      .as[(Long, Int, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 2, 32L, 1048576L, 1.0),
      (2L, 4, 16L, 1048576L, 1.0),
      (3L, 8, 8L, 1048576L, 1.0),
      (4L, 16, 4L, 1048576L, 1.0)))
  }

  test("text_bpe_merges: left-to-right non-overlap; merged symbols chain") {
    val d = scratchDir("bpe")
    // doc 0: "x x x x" has THREE (x,x) pairs but the greedy fold merges
    // two non-overlapping occurrences ([x¦x, x¦x], never overlapping);
    // doc 1 seeds round 2, and round 3's winner is a pair of MERGED
    // symbols — the vocabulary chaining real BPE depends on.
    Seq(
      (0L, "x x x x", "en", "s", 7L),
      (1L, "p q p q", "en", "s", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("text_bpe_merges")(spark, d)
      .select("r", "left_tok", "right_tok", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1, "x", "x", 3L),       // raw pair count is 3 (overlaps counted)...
      (2, "p", "q", 2L),       // ...but after the fold doc 0 is [x¦x, x¦x]
      (3, "p¦q", "p¦q", 1L))) // round 3: a pair of round-2 MERGES wins
  }

  test("text_bpe_encode: applies all learned merges; pins the segmentation") {
    val d = scratchDir("bpe_enc")
    def h(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // same fixture as the trainer: merges are (x,x) then (p,q) then
    // (p¦q,p¦q) — doc 0 compresses 4→2 under round 1 only, doc 1
    // chains through rounds 2 AND 3 down to a single symbol.
    Seq(
      (0L, "x x x x", "en", "s", 7L),
      (1L, "p q p q", "en", "s", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("text_bpe_encode")(spark, d)
      .as[(Long, Int, Int, Long, String)].collect().toSeq
    assert(got === Seq(
      (0L, 4, 2, 500000L, h("x¦x x¦x")),
      (1L, 4, 1, 750000L, h("p¦q¦p¦q"))))
  }

  test("text_keywords: RAKE degree/freq scores, runs split on stopwords") {
    val d = scratchDir("rake")
    // doc 0 runs: [fast hash join] ×2, [slow scan]
    // doc 1 runs: [fast scan], [hash join]; doc 2 is all stopwords
    Seq(
      (0L, "fast hash join a fast hash join the slow scan", "en", "s", 46L),
      (1L, "fast scan the hash join", "en", "s", 23L),
      (2L, "a the a", "en", "s", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("text_keywords")(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    // word scores (degree·1e6 div freq): fast/hash/join = 8e6 div 3 =
    // 2666666; slow = 2e6 div 1; scan = 4e6 div 2 = 2000000
    assert(got === Seq(
      ("fast hash join", 2L, 3L * 2666666L),
      ("hash join", 1L, 2L * 2666666L),
      ("fast scan", 1L, 2666666L + 2000000L),
      ("slow scan", 1L, 4000000L)))
  }
}
