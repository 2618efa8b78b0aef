package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Empty-input robustness: at cluster scale empty partitions and empty
  * tables are routine (a fresh source, an over-eager filter, a skewed
  * split), so every corpus operator must return an empty result — never
  * throw — on zero rows. This sweep runs the full dedup / text /
  * curation / similarity families against empty (but correctly-typed)
  * documents and embeddings tables.
  */
class DegenerateInputSpec extends SparkSpec {

  private lazy val dir = {
    val d = scratchDir("degenerate")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("label", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    val evSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], docSchema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], embSchema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], evSchema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private val docQueries = Seq(
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash", "dedup_simhash",
    "dedup_levenshtein", "dedup_clusters", "dedup_substring",
    "text_token_stats", "text_lang_id", "text_quality", "text_tfidf",
    "text_fingerprint", "text_ngram_top", "text_pii_scrub", "text_normalize",
    "text_repetition", "text_bigram_familiarity", "text_domain_classifier",
    "curate_stratified_sample", "curate_token_budget", "curate_contamination",
    "curate_domain_mix", "curate_shard_plan", "curate_quality_gate",
    "curate_pipeline_e2e", "curate_pack_sequences",
    "mm_binary_meta", "mm_decode_features", "mm_frame_sample", "mm_modality_stats",
    "mm_decode_real",
    "curate_split", "curate_global_index", "curate_importance_sample",
    "text_chunk_windows", "text_collocations", "stats_chisq_sources",
    "text_search_chunks",
    // the full corpus build: an all-dropped gate (an empty curated
    // corpus) must land a schema-bearing empty sink, not crash the
    // read-back — hit for real on the 40× ScaleGen corpus, where every
    // unsuffixed replica falls in the eval split and the stopword rule
    // drops all suffixed train docs
    "curate_corpus_build",
    // round-8 additions: tokenizer loop, RAKE, and the real-decode pair
    // (their staged asset dirs are empty, so the binaryFile scan itself
    // must tolerate zero files)
    "text_keywords", "text_bpe_merges", "text_bpe_encode",
    "mm_phash", "mm_audio_frames",
    // wave 12: learned NB has no holdout rows on an empty corpus; URL
    // canonicalization dedups an empty frontier
    "ml_naive_bayes", "curate_url_canonical",
    // wave 17: no content groups -> no overlap rows
    "curate_source_overlap",
    // wave 18: no train rows -> no candidate rule -> empty artifact
    "ml_decision_stump",
    // round-11 second half: no cells -> no DP release rows; zero staged
    // assets -> the binaryFile scan itself must tolerate zero files
    "curate_dp_release", "mm_image_resize")

  private val embQueries = Seq(
    "dedup_embedding_nn", "dedup_semantic", "sim_knn_per_label",
    "sim_ann_lsh", "sim_ann_ivf", "sim_topk_cosine",
    "sim_quantize_int8", "sim_matryoshka_topk", "sim_ann_recall_gate",
    "sim_range_search", "ml_knn_classifier")

  // events-keyed operators: empty stream = routine (a fresh tenant)
  private val evQueries = Seq(
    "win_attribution", "ts_interpolate", "ts_seasonal_profile",
    "stats_cohort_retention", "stats_ab_test", "ts_autocorr",
    "ts_decompose", "stats_iqr_outliers",
    // round-11 second half: no user reaches 9 observations -> no row
    "ts_forecast_holt")

  for (name <- docQueries ++ embQueries ++ evQueries)
    test(s"$name returns an empty result on an empty table, never throws") {
      assert(SparkEntry.queries(name)(spark, dir).count() === 0L)
    }

  test("dedup_savings on an empty corpus reports a zero card, never throws") {
    val row = SparkEntry.queries("dedup_savings")(spark, dir).head()
    assert(row.getLong(row.fieldIndex("n_docs")) === 0L)
    assert(row.getLong(row.fieldIndex("n_removable")) === 0L)
    assert(row.getLong(row.fieldIndex("chars_removed")) === 0L)
    assert(row.isNullAt(row.fieldIndex("savings_ppm")))
  }

  test("dedup_minhash_eval on an empty corpus reports zero counts and NULL ratios") {
    val row = SparkEntry.queries("dedup_minhash_eval")(spark, dir).head()
    assert(row.getLong(row.fieldIndex("n_truth")) === 0L)
    assert(row.getLong(row.fieldIndex("n_cand")) === 0L)
    assert(row.isNullAt(row.fieldIndex("recall_ppm")))
    assert(row.isNullAt(row.fieldIndex("cand_precision_ppm")))
  }

  test("ts_forecast_snaive on an empty stream reports both baselines at zero points") {
    val rows = SparkEntry.queries("ts_forecast_snaive")(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_points")) === 0L)
      assert(r.isNullAt(r.fieldIndex("mae_ppm")))
    }
  }

  test("curate_filter_attrition on an empty corpus reports a zero funnel, never throws") {
    // the funnel always has its 4 stage rows (global-agg semantics);
    // counts are zero and the DIV-0 survival ratio is an honest NULL
    val rows = SparkEntry.queries("curate_filter_attrition")(spark, dir)
      .collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_in")) === 0L)
      assert(r.isNullAt(r.fieldIndex("cum_survival_ppm")))
    }
  }

  test("curate_dataset_card on an empty corpus reports zero counts, never throws") {
    // global aggregates return ONE row on empty input by SQL semantics;
    // the ppm ratios hit DIV 0 and must surface as NULL (honest
    // undefined), not an exception
    val row = SparkEntry.queries("curate_dataset_card")(spark, dir).head()
    assert(row.getLong(row.fieldIndex("n_docs")) === 0L)
    assert(row.isNullAt(row.fieldIndex("en_ppm")))
  }

  test("text_tfidf honors spark.graft.tfidf.minDf (vocabulary cutoff knob)") {
    import org.apache.spark.sql.functions.{col, min}
    // conf changes the plan shape — drop frames cached under the default
    spark.catalog.clearCache()
    try {
      spark.conf.set("spark.graft.tfidf.minDf", "2")
      val out = SparkEntry.queries("text_tfidf")(spark, sfTiny)
      assert(out.count() > 0L)
      // every surviving token cleared the document-frequency floor
      assert(out.agg(min(col("df"))).head.getLong(0) >= 2L)
    } finally {
      spark.conf.unset("spark.graft.tfidf.minDf")
      spark.catalog.clearCache()
    }
  }

  test("text_tfidf rejects a junk minDf value instead of silently ignoring it") {
    try {
      spark.conf.set("spark.graft.tfidf.minDf", "lots")
      intercept[RuntimeException] {
        SparkEntry.queries("text_tfidf")(spark, sfTiny)
      }
      spark.conf.set("spark.graft.tfidf.minDf", "0")
      intercept[IllegalArgumentException] {
        SparkEntry.queries("text_tfidf")(spark, sfTiny)
      }
    } finally spark.conf.unset("spark.graft.tfidf.minDf")
  }
}
