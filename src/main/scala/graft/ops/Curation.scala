package graft.ops

import graft.{GraftQuery, Materialize, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators over `documents` — the selection side of a
  * training-data pipeline (SURVEY.md §2.8): deterministic stratified
  * sampling, per-source token-budget packing, and eval-set contamination
  * detection. These are the operations that turn a cleaned corpus into a
  * training MIX: which documents, from which sources, under which budget,
  * excluding anything that leaks the benchmark.
  *
  * Determinism rules: sampling order is md5 of the doc id (bit-identical
  * hex in Spark and DuckDB — no engine RNG anywhere), budgets are integer
  * window sums, contamination is exact n-gram set intersection. Every
  * query is value-level oracle-twinnable.
  *
  * Scale notes (100 TB):
  *  - Stratified sampling is one shuffle on the stratum key + a
  *    per-partition top-k (rank <= k after a window sort). Hot strata
  *    sort only their own partition; k rows per stratum survive.
  *  - Budget packing is the same shape: one shuffle per source, one
  *    ordered scan per group, running integer sum — state is one
  *    accumulator per group, the streaming-friendly formulation.
  *  - Contamination joins train 8-gram postings against the DISTINCT
  *    eval gram set. Eval sets are small by nature but the join is a
  *    plain shuffled equi-join on the gram (no broadcast hint, per the
  *    engine's corpus-side broadcast policy); AQE broadcasts it at
  *    runtime when it measures small.
  */
object Curation extends QueryModule {

  /** Word n-grams per document as (doc_id, gram) — distinct within doc. */
  private def grams(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks)-$n), i -> " +
          s"array_join(slice(toks, i + 1, $n), ' '))")).as("gram"))
      .distinct()

  private def gramsSql(src: String, n: Int): String = s"""
    SELECT doc_id, gram FROM (
      SELECT doc_id, UNNEST(list_transform(
        generate_series(1, len(string_split(text, ' ')) - ${n - 1}),
        i -> array_to_string(string_split(text, ' ')[i:i+${n - 1}], ' ')
      )) AS gram
      FROM $src)
    GROUP BY doc_id, gram"""

  override def queries: Seq[GraftQuery] = Seq(

    // ───── deterministic stratified sample: k docs per language ─────
    // The sampling key is md5(doc_id) — a fixed uniform hash, so the
    // sample is reproducible across runs/engines and adding documents
    // never reshuffles the order of existing ones (stable curation).
    GraftQuery(
      "curate_stratified_sample",
      (s, d) => {
        val k = 50
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("smp"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            md5(col("doc_id").cast("string")).as("smp"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= k)
          .select(col("doc_id"), col("lang"), col("rk"))
          .orderBy(col("lang"), col("rk"))
      },
      Some("""
        SELECT doc_id, lang, rk FROM (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents) t
        WHERE rk <= 50
        ORDER BY lang, rk
      """)),

    // ───── token-budget packing: best docs per source under a budget ─────
    // Greedy fill: per source, documents ordered by lexical diversity
    // (distinct-token count, an integer — bit-stable ordering) take
    // their whitespace-token counts out of a shared budget; a document
    // is kept while the running total stays within budget. One window
    // pass; per-group state is a single accumulator.
    GraftQuery(
      "curate_token_budget",
      (s, d) => {
        val budget = 2000L
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            expr("size(filter(split(text, ' '), t -> t <> ''))")
              .cast("long").as("n_tokens"),
            expr("size(array_distinct(filter(split(text, ' '), t -> t <> '')))")
              .cast("long").as("n_distinct"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_distinct").desc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        toks
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .filter(col("cum_tokens") <= budget)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
          .orderBy(col("source"), col("cum_tokens"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_distinct
          FROM documents)
        SELECT doc_id, source, n_tokens, cum_tokens FROM (
          SELECT doc_id, source, n_tokens,
                 CAST(SUM(n_tokens) OVER (PARTITION BY source
                   ORDER BY n_distinct DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          FROM toks) t
        WHERE cum_tokens <= 2000
        ORDER BY source, cum_tokens
      """)),

    // ───── eval-set contamination: train docs sharing an 8-gram ─────
    // The "benchmark" is every 20th document (a stand-in for an eval
    // suite); any OTHER document sharing at least one word-8-gram with
    // it is flagged with its shared-gram count. Exact set intersection —
    // the membrane a training mix must enforce before release.
    GraftQuery(
      "curate_contamination",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val train = grams(docs.filter(col("doc_id") % 20 =!= 0), 8)
        val eval8 = grams(docs.filter(col("doc_id") % 20 === 0), 8)
          .select(col("gram").as("eg")).distinct()
        train.join(eval8, col("gram") === col("eg"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shared_grams"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH train AS (${gramsSql("(SELECT * FROM documents WHERE doc_id % 20 <> 0)", 8)}),
        ev AS (SELECT DISTINCT gram
               FROM (${gramsSql("(SELECT * FROM documents WHERE doc_id % 20 = 0)", 8)}) g)
        SELECT doc_id, COUNT(*) AS n_shared_grams
        FROM train JOIN ev USING (gram)
        GROUP BY doc_id
        ORDER BY doc_id
      """)),

    // ───── domain-mix rebalancing: cap dominant sources ─────
    // A training mix must not let one crawl source drown the rest: each
    // source keeps at most n_tot/(2·n_sources) documents (all-integer
    // math — no float shares, so the cut is bit-identical across
    // engines), chosen by the same deterministic md5 order as the
    // stratified sample. Sources under the cap keep everything; the
    // dominant source is downsampled to it. One shuffle on the source
    // key for the window; per-source counts join back as a tiny
    // aggregate (no broadcast hint — AQE broadcasts it at runtime);
    // the two corpus totals ride a broadcast 1-row frame.
    GraftQuery(
      "curate_domain_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bySrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
        val tot = docs.agg(count(lit(1)).as("n_tot"),
          count_distinct(col("source")).as("n_sources"))
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs.select(col("doc_id"), col("source"))
          .withColumn("rk", row_number().over(w))
          .join(bySrc, "source")
          .crossJoin(broadcast(tot))
          .withColumn("src_cap",
            // floor of 1: with many tiny sources (a per-domain crawl)
            // n_tot/(2·n_sources) rounds to 0 and would silently drop
            // the whole corpus; every source always keeps >= 1 doc
            least(col("n_src"),
              greatest(lit(1L), expr("n_tot div (2 * n_sources)"))))
          .filter(col("rk") <= col("src_cap"))
          .select(col("doc_id"), col("source"), col("rk"), col("src_cap"))
          .orderBy(col("source"), col("rk"))
      },
      Some("""
        WITH ranked AS (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents),
        by_src AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
        tot AS (SELECT COUNT(*) AS n_tot, COUNT(DISTINCT source) AS n_sources
                FROM documents)
        SELECT doc_id, source, rk,
               LEAST(n_src, GREATEST(1, n_tot // (2 * n_sources))) AS src_cap
        FROM ranked JOIN by_src USING (source) CROSS JOIN tot
        WHERE rk <= LEAST(n_src, GREATEST(1, n_tot // (2 * n_sources)))
        ORDER BY source, rk
      """)),

    // ───── shard planning: pack every doc into fixed-budget shards ─────
    // The write-side twin of curate_token_budget: instead of truncating
    // at one budget, EVERY document is assigned to a training shard of
    // ~2000 estimated tokens — the unit a data loader streams. Shard
    // membership is a pure function of the running token sum over the
    // md5-deterministic order, so a re-run (or a different engine)
    // produces byte-identical shard manifests. One shuffle on the
    // source key; within a source the window scan is a single ordered
    // pass — shards for different sources pack in parallel, and no
    // shard ever spans a source (the layout that lets loaders sample
    // sources independently).
    GraftQuery(
      "curate_shard_plan",
      (s, d) =>
        shardPlan(Tables.documents(s, d)
          .select(col("doc_id"), col("source"), tokenEstimate.as("n_tokens"))),
      Some(shardSql(s"""(SELECT doc_id, source, $tokenEstimateSql AS n_tokens
                FROM documents) t0"""))),

    // ───── sequence packing: concat-and-chunk into context windows ─────
    // The GPT-style pretraining step downstream of sharding: documents
    // are concatenated per source in the md5-deterministic order and the
    // token stream is cut every `packLen` tokens; each doc maps to the
    // training sequences it lands in (first sequence, offset inside it,
    // last sequence — a doc may straddle window boundaries, unlike shard
    // planning, which never splits a doc). Everything derives from the
    // per-source running token sum.
    //
    // Scale shape (100 TB): the per-source running sum is the shared
    // two-level distributed scan (`sourcePrefixSum` — see its scaladoc;
    // also the engine under curate_shard_plan), so no source ever
    // serializes into a single task and the result still equals the
    // plain window sum the DuckDB oracle computes, row for row.
    GraftQuery(
      "curate_pack_sequences",
      (s, d) =>
        sourcePrefixSum(Tables.documents(s, d)
          .select(col("doc_id"), col("source"), tokenEstimate.as("n_tokens")))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            expr(s"(cum - n_tokens) div $packLen").cast("long").as("seq_first"),
            expr(s"(cum - n_tokens) % $packLen").cast("long").as("seq_off"),
            expr(s"(cum - 1) div $packLen").cast("long").as("seq_last"),
            col("cum"))
          .orderBy(col("source"), col("cum"), col("doc_id")),
      Some(s"""
        WITH toks AS (
          SELECT doc_id, source, $tokenEstimateSql AS n_tokens,
                 MD5(CAST(doc_id AS VARCHAR)) AS k
          FROM documents),
        c AS (
          SELECT doc_id, source, n_tokens,
                 CAST(SUM(n_tokens) OVER (PARTITION BY source
                   ORDER BY k, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum
          FROM toks)
        SELECT doc_id, source, n_tokens,
               (cum - n_tokens) // $packLen AS seq_first,
               (cum - n_tokens) % $packLen AS seq_off,
               (cum - 1) // $packLen AS seq_last,
               cum
        FROM c ORDER BY source, cum, doc_id
      """)),

    // ───── C4/Gopher-style quality gate: rule stack → keep/drop ─────
    // The decision layer real pretraining pipelines put on top of the
    // quality primitives: a fixed rule ladder (length, stopword ratio,
    // alphabetic ratio, bigram repetition) where the FIRST failing rule
    // names the drop reason. One narrow per-row projection — no joins,
    // no shuffle beyond the output sort; at 100 TB this runs at scan
    // speed, which is exactly why production filters are rule ladders
    // and not models for the first pass. Every ratio is a single IEEE
    // division of exact ints (cross-engine bit-exact); NULL ratios
    // (NULL-text/empty/1-token docs) are all pre-caught by the length
    // rule's IS NULL arm, so the CASE ladder never evaluates a NULL
    // comparison differently
    // across engines. Thresholds are tuned to the synthetic corpus so
    // every rule fires (DegenerateInputSpec covers the empty corpus);
    // production values are corpus-specific knobs by nature.
    GraftQuery(
      "curate_quality_gate",
      (s, d) =>
        withGateReason(Tables.documents(s, d))
          .select(col("doc_id"), col("n_tokens"), col("swr"), col("ar"),
            col("dup_bg"), col("reason"),
            (col("reason") === "keep").as("keep"))
          .orderBy(col("doc_id")),
      Some(s"""
        WITH $gateCtes
        SELECT doc_id, n_tokens, swr, ar, dup_bg, reason,
               reason = 'keep' AS keep
        FROM g
        ORDER BY doc_id
      """)),

    // ───── the whole curation pipeline, one oracle-matched query ─────
    // gate → exact dedup → shard plan: what a user actually runs. The
    // rule ladder and the shard-window definition are SHARED with their
    // standalone queries (withGateReason/gateCtes, shardPlan/shardSql —
    // both engines' sides), so composed and standalone results can't
    // drift there; the two-line canonical-min dedup mirrors
    // dedup_exact's min-doc_id-per-md5(text) contract. The chain stays
    // bit-exact end to end: the manifest the Spark engine emits for a
    // corpus is byte-identical to the oracle's. Plan shape: one narrow
    // gate projection, one shuffle on the body HASH (dedup), one
    // shuffle on the source (shard window) — nothing quadratic, no
    // corpus broadcast, and document bodies never leave the scan
    // stage: only (doc_id, source, text_hash, n_tokens, reason) is
    // persisted and shuffled.
    GraftQuery(
      "curate_pipeline_e2e",
      (s, d) => {
        // repartition BEFORE the gate (the one-file corpus scan is a
        // single input partition), and persist the gate PROJECTION
        // before filtering on it: a filter on the computed `reason`
        // would otherwise be pushed below the repartition and evaluate
        // the whole inlined ladder per row on the single scan task,
        // with none of the projection-level subexpression elimination —
        // measured 13 s single-core vs ~1 s for the staged projection.
        // The barrier also stops both window stages re-substituting the
        // ladder (projection collapse re-evaluates it per consumer).
        val gated = graft.Materialize.stage(
          withGateReason(Tables.documents(s, d)
              .repartition(s.sparkContext.defaultParallelism, col("doc_id")))
            .select(col("doc_id"), col("source"),
              md5(col("text")).as("text_hash"),
              tokenEstimate.as("n_tokens"), col("reason")))
        val survivors = gated
          .filter(col("reason") === "keep")
          .withColumn("canon_id", min(col("doc_id")).over(
            Window.partitionBy(col("text_hash"))))
          .filter(col("doc_id") === col("canon_id"))
        shardPlan(survivors.select(col("doc_id"), col("source"),
          col("n_tokens")))
      },
      Some(s"""
        WITH $gateCtes,
        kept AS (
          SELECT d.doc_id, d.source, MD5(d.text) AS text_hash,
                 $tokenEstimateSql AS n_tokens
          FROM documents d JOIN g ON d.doc_id = g.doc_id
          WHERE g.reason = 'keep'),
        canon AS (
          SELECT doc_id, source, n_tokens FROM (
            SELECT doc_id, source, n_tokens,
                   MIN(doc_id) OVER (PARTITION BY text_hash) AS canon_id
            FROM kept) c
          WHERE doc_id = canon_id)
        ${shardSql("canon")}
      """)),

    // ───── bloom-pruned decontamination: the 100 TB membrane shape ─────
    // Same semantics as curate_contamination (train docs sharing an
    // 8-gram with the eval suite), different physical shape: the eval
    // grams aggregate into a BLOOM FILTER (graft.functions
    // .BloomFilterBuildAgg over xxhash64 of the gram) delivered as a
    // scalar subquery, and the train-side posting stream is filtered
    // AGAINST THE SCAN before the exact-verify join — so the join's
    // left side carries ~contaminated grams only, not every 8-gram of
    // a 100 TB corpus (the join_bloom_prune pattern applied to the
    // decontamination membrane). False positives fall to the exact
    // join; false negatives are impossible (property-tested in
    // SketchSpec) — so the result, and the oracle, are bit-identical
    // to the exact operator's.
    GraftQuery(
      "curate_contamination_bloom",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val train = grams(docs.filter(col("doc_id") % 20 =!= 0), 8)
        val eval8 = grams(docs.filter(col("doc_id") % 20 === 0), 8)
          .select(col("gram").as("eg")).distinct()
        val view = s"graft_decon_eval_${math.abs(d.hashCode)}"
        eval8.select(xxhash64(col("eg")).as("g")).createOrReplaceTempView(view)
        val pruned = train.filter(expr(
          s"bloom_probe((SELECT bloom_build(g, 1048576, 6) FROM $view), xxhash64(gram))"))
        pruned.join(eval8, col("gram") === col("eg"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shared_grams"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH train AS (${gramsSql("(SELECT * FROM documents WHERE doc_id % 20 <> 0)", 8)}),
        ev AS (SELECT DISTINCT gram
               FROM (${gramsSql("(SELECT * FROM documents WHERE doc_id % 20 = 0)", 8)}) g)
        SELECT doc_id, COUNT(*) AS n_shared_grams
        FROM train JOIN ev USING (gram)
        GROUP BY doc_id
        ORDER BY doc_id
      """)),

    // ───── epoch mixture: data-constrained repeat schedule ─────
    // When the token budget exceeds a source's size, training repeats
    // the source for multiple epochs — with diminishing returns that
    // cap useful repetition around 4 epochs (Muennighoff et al. 2023,
    // "Scaling Data-Constrained Language Models"). This operator emits
    // the REPEAT SCHEDULE: every source gets an equal share of a
    // budget of 2× the corpus's total tokens; a source covers its
    // share in ceil(share / its tokens) epochs, capped at 4; each doc
    // row is emitted once per epoch. All-integer math (ceil-div as
    // (a + b − 1) div b), so the schedule is bit-identical across
    // engines and re-runs. One token-sum shuffle on the source key;
    // the per-source totals and the corpus total ride back as tiny
    // broadcast aggregates; the epoch expansion is a narrow explode.
    GraftQuery(
      "curate_mixture_epochs",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), tokenEstimate.as("n_tokens"))
        val bySrc = toks.groupBy(col("source"))
          .agg(sum(col("n_tokens")).as("t_src"))
        val tot = toks.agg(sum(col("n_tokens")).as("t_tot"),
          count_distinct(col("source")).as("n_sources"))
        toks
          .join(bySrc, "source")
          .crossJoin(broadcast(tot))
          .withColumn("share", expr("(2 * t_tot) div n_sources"))
          .withColumn("n_epochs",
            least(lit(4L), expr("(share + t_src - 1) div t_src")))
          .select(col("doc_id"), col("source"), col("n_epochs"),
            explode(expr("sequence(1L, n_epochs)")).as("epoch"))
          .orderBy(col("source"), col("doc_id"), col("epoch"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, source, $tokenEstimateSql AS n_tokens
          FROM documents),
        by_src AS (SELECT source, SUM(n_tokens) AS t_src
                   FROM toks GROUP BY source),
        tot AS (SELECT SUM(n_tokens) AS t_tot,
                       COUNT(DISTINCT source) AS n_sources
                FROM toks),
        sched AS (
          SELECT t.doc_id, t.source,
                 CAST(LEAST(4, ((2 * tot.t_tot) // tot.n_sources + b.t_src - 1)
                   // b.t_src) AS BIGINT) AS n_epochs
          FROM toks t JOIN by_src b USING (source) CROSS JOIN tot)
        SELECT doc_id, source, n_epochs,
               UNNEST(generate_series(1, n_epochs)) AS epoch
        FROM sched
        ORDER BY source, doc_id, epoch
      """)),

    // ───── epoch-salted global shuffle: the training order itself ─────
    // Composes with the epoch schedule above: every (doc, epoch) row
    // gets shuffle key md5(doc_id ':' epoch) and the corpus is globally
    // ORDERED by it — a reproducible pseudo-random training order where
    // each epoch reshuffles independently (the epoch is the salt), no
    // engine RNG anywhere. Physically this is a RANGE sort (sampled
    // range partitioner, fully parallel — the ref_sort_full shape), not
    // a single-task rank window: the data loader consumes position by
    // file/row order, so no materialized global row number is needed —
    // at 100 TB a global row_number would serialize through one task,
    // the ORDER BY does not.
    GraftQuery(
      "curate_global_shuffle",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), tokenEstimate.as("n_tokens"))
        val bySrc = toks.groupBy(col("source"))
          .agg(sum(col("n_tokens")).as("t_src"))
        val tot = toks.agg(sum(col("n_tokens")).as("t_tot"),
          count_distinct(col("source")).as("n_sources"))
        toks
          .join(bySrc, "source")
          .crossJoin(broadcast(tot))
          .withColumn("n_epochs",
            least(lit(4L), expr(
              "((2 * t_tot) div n_sources + t_src - 1) div t_src")))
          .select(col("doc_id"), col("source"),
            explode(expr("sequence(1L, n_epochs)")).as("epoch"))
          .withColumn("shuffle_key",
            md5(concat_ws(":", col("doc_id"), col("epoch"))))
          .select(col("shuffle_key"), col("doc_id"), col("source"),
            col("epoch"))
          .orderBy(col("shuffle_key"), col("doc_id"), col("epoch"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, source, $tokenEstimateSql AS n_tokens
          FROM documents),
        by_src AS (SELECT source, SUM(n_tokens) AS t_src
                   FROM toks GROUP BY source),
        tot AS (SELECT SUM(n_tokens) AS t_tot,
                       COUNT(DISTINCT source) AS n_sources
                FROM toks),
        sched AS (
          SELECT t.doc_id, t.source,
                 CAST(LEAST(4, ((2 * tot.t_tot) // tot.n_sources + b.t_src - 1)
                   // b.t_src) AS BIGINT) AS n_epochs
          FROM toks t JOIN by_src b USING (source) CROSS JOIN tot),
        expanded AS (
          SELECT doc_id, source,
                 UNNEST(generate_series(1, n_epochs)) AS epoch
          FROM sched)
        SELECT md5(doc_id::VARCHAR || ':' || epoch::VARCHAR) AS shuffle_key,
               doc_id, source, CAST(epoch AS BIGINT) AS epoch
        FROM expanded
        ORDER BY shuffle_key, doc_id, epoch
      """)),

    // ───── the FULL corpus build: the training-data product, hash-pinned ─────
    // curate_pipeline_e2e stops at the shard manifest; this is the whole
    // thing a pretraining run consumes, one oracle row set: quality gate
    // → exact dedup (train split only, doc_id % 20 <> 0) → bloom-membrane
    // DECONTAMINATION against the eval suite (% 20 = 0) → per-source
    // epoch repeat schedule → epoch-salted global shuffle key → PHYSICAL
    // sharded write (one dir per leading shuffle-key hex digit) → read
    // back THROUGH the layout. Every stage reuses its standalone query's
    // exact definition (withGateReason/gateCtes, the dedup canon-min,
    // grams/gramsSql, the mixture-epoch integer schedule, the md5 salt),
    // so composed and standalone can never drift; the final ORDER BY
    // shuffle_key is the actual training order. The shard column read
    // back from DIRECTORY NAMES proves the physical layout encodes the
    // plan. Plan shape at 100 TB: narrow gate, one hash shuffle (dedup),
    // the bloom membrane filters posting rows AT THE SCAN before the
    // exact-verify join, one token-sum shuffle (schedule), a narrow
    // explode, and the sharded write's own partition shuffle — document
    // bodies are scanned twice (gate, grams) and shuffled never.
    GraftQuery(
      "curate_corpus_build",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val gated = graft.Materialize.stage(
          withGateReason(docs
              .repartition(s.sparkContext.defaultParallelism, col("doc_id")))
            .select(col("doc_id"), col("source"),
              md5(col("text")).as("text_hash"),
              tokenEstimate.as("n_tokens"), col("reason")))
        val survivors = gated
          .filter(col("reason") === "keep" && col("doc_id") % 20 =!= 0)
          .withColumn("canon_id", min(col("doc_id")).over(
            Window.partitionBy(col("text_hash"))))
          .filter(col("doc_id") === col("canon_id"))
          .select(col("doc_id"), col("source"), col("n_tokens"))
        // decontamination membrane over the SURVIVORS' bodies only
        val eval8 = grams(docs.filter(col("doc_id") % 20 === 0), 8)
          .select(col("gram").as("eg")).distinct()
        val view = s"graft_build_eval_${math.abs(d.hashCode)}"
        eval8.select(xxhash64(col("eg")).as("g")).createOrReplaceTempView(view)
        val survGrams = grams(
          docs.select(col("doc_id"), col("text"))
            .join(survivors.select(col("doc_id")), Seq("doc_id")), 8)
        val contaminated = survGrams.filter(expr(
            s"bloom_probe((SELECT bloom_build(g, 1048576, 6) FROM $view), xxhash64(gram))"))
          .join(eval8, col("gram") === col("eg"))
          .select(col("doc_id")).distinct()
        val clean = survivors.join(contaminated, Seq("doc_id"), "left_anti")
        // per-source epoch schedule over the clean corpus (the
        // curate_mixture_epochs math, budget 2× the CLEAN token total)
        val bySrc = clean.groupBy(col("source"))
          .agg(sum(col("n_tokens")).as("t_src"))
        val tot = clean.agg(sum(col("n_tokens")).as("t_tot"),
          count_distinct(col("source")).as("n_sources"))
        val expanded = clean
          .join(bySrc, "source")
          .crossJoin(broadcast(tot))
          .withColumn("n_epochs",
            least(lit(4L), expr(
              "((2 * t_tot) div n_sources + t_src - 1) div t_src")))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            explode(expr("sequence(1L, n_epochs)")).as("epoch"))
          .withColumn("shuffle_key",
            md5(concat_ws(":", col("doc_id"), col("epoch"))))
          .withColumn("shard", substring(col("shuffle_key"), 1, 1))
        val tmp = graft.pipeline.Sources.scratch(d, "corpus_")
        // P3 empty-write guard, sink-shaped: partitionBy writes NO files
        // for zero rows, which leaves the read-back unable to infer a
        // schema (hit in practice: a corpus whose every doc fails the
        // gate). Stage once, gate on emptiness, and land a zero-row
        // schema-bearing file instead — the empty curated corpus is a
        // legitimate result, not a crash.
        val staged = graft.Materialize.stage(expanded)
        if (staged.isEmpty)
          staged.limit(0).write.mode("overwrite").parquet(tmp)
        else
          staged.repartition(col("shard"))
            .write.mode("overwrite").partitionBy("shard").parquet(tmp)
        s.read.parquet(tmp)
          .select(col("shard").cast("string").as("shard"),
            col("shuffle_key"), col("doc_id"), col("source"),
            col("epoch"), col("n_tokens"))
          .orderBy(col("shuffle_key"), col("doc_id"), col("epoch"))
      },
      Some(s"""
        WITH $gateCtes,
        kept AS (
          SELECT d.doc_id, d.source, MD5(d.text) AS text_hash,
                 $tokenEstimateSql AS n_tokens
          FROM documents d JOIN g ON d.doc_id = g.doc_id
          WHERE g.reason = 'keep' AND d.doc_id % 20 <> 0),
        canon AS (
          SELECT doc_id, source, n_tokens FROM (
            SELECT doc_id, source, n_tokens,
                   MIN(doc_id) OVER (PARTITION BY text_hash) AS canon_id
            FROM kept) c
          WHERE doc_id = canon_id),
        ev AS (SELECT DISTINCT gram FROM
               (${gramsSql("(SELECT * FROM documents WHERE doc_id % 20 = 0)", 8)}) g2),
        surv_txt AS (
          SELECT d.doc_id, d.text
          FROM documents d JOIN canon c ON d.doc_id = c.doc_id),
        contaminated AS (
          SELECT DISTINCT t.doc_id
          FROM (${gramsSql("surv_txt", 8)}) t JOIN ev USING (gram)),
        clean AS (
          SELECT c.doc_id, c.source, c.n_tokens
          FROM canon c LEFT JOIN contaminated x ON c.doc_id = x.doc_id
          WHERE x.doc_id IS NULL),
        by_src AS (SELECT source, SUM(n_tokens) AS t_src
                   FROM clean GROUP BY source),
        tot AS (SELECT SUM(n_tokens) AS t_tot,
                       COUNT(DISTINCT source) AS n_sources
                FROM clean),
        sched AS (
          SELECT c.doc_id, c.source, c.n_tokens,
                 CAST(LEAST(4, ((2 * tot.t_tot) // tot.n_sources + b.t_src - 1)
                   // b.t_src) AS BIGINT) AS n_epochs
          FROM clean c JOIN by_src b USING (source) CROSS JOIN tot),
        expanded AS (
          SELECT doc_id, source, n_tokens,
                 UNNEST(generate_series(1, n_epochs)) AS epoch
          FROM sched)
        SELECT substr(md5(doc_id::VARCHAR || ':' || epoch::VARCHAR), 1, 1) AS shard,
               md5(doc_id::VARCHAR || ':' || epoch::VARCHAR) AS shuffle_key,
               doc_id, source, CAST(epoch AS BIGINT) AS epoch, n_tokens
        FROM expanded
        ORDER BY shuffle_key, doc_id, epoch
      """)),

    // ───── temperature-scaled language mix (p_i ∝ n_i^0.5 reweight) ─────
    // The multilingual-pretraining standard: sampling a corpus by raw
    // frequency drowns low-resource languages, so the mix draws language i
    // with probability proportional to n_i^α (α = 0.5 here) — high-resource
    // languages are down-weighted, the tail up-weighted. Exactness: the
    // weight is floor(sqrt(n_i)·1e6) — IEEE-754 sqrt is correctly rounded
    // in both engines and n_i is exactly representable below 2^53, so the
    // BIGINT weight is bit-identical; the per-language quota is
    // floor(T·w_i/Σw) via three IEEE double ops written in the same shape
    // on both sides (deterministic; exact while T·w < 2^53, i.e. to ~10^9
    // docs per language — past that the quota stays deterministic but may
    // sit ±1 doc from the true floor). Selection inside a language is
    // rank-by-md5(doc_id) — a deterministic pseudo-shuffle, no engine RNG.
    //
    // Scale shape: the count/weight/quota frames are |languages| rows
    // (broadcast); selection is one shuffle on lang + a per-language
    // ordered rank. At 100 TB the rank sort admits a pre-filter — keep
    // only h < 2·quota_i/n_i of the hash space before ranking, which
    // bounds the sort input to ~2·quota rows per language — noted here,
    // not needed at bench scale.
    GraftQuery(
      "curate_temperature_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        val weighted = counts.select(col("lang"), col("n_docs"),
          floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0))
            .cast("long").as("w"))
        val tot = weighted.agg(sum(col("w")).as("sw"),
          expr("CAST(sum(n_docs) div 4 AS BIGINT)").as("t"))
        val quotas = weighted.crossJoin(broadcast(tot))
          .select(col("lang"), col("n_docs"), col("w"),
            floor((col("t").cast("double") * col("w").cast("double")) /
              col("sw").cast("double")).cast("long").as("quota"))
        val ranked = docs.select(col("doc_id"), col("lang"),
          row_number().over(Window.partitionBy(col("lang"))
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
            .cast("long").as("rk"))
        ranked.join(broadcast(quotas.select(col("lang"), col("quota"))),
            Seq("lang"))
          .filter(col("rk") <= col("quota"))
          .select(col("doc_id"), col("lang"), col("rk"), col("quota"))
          .orderBy(col("lang"), col("rk"))
      },
      Some("""
        WITH c AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1),
        w AS (
          SELECT lang, n_docs,
                 CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
          FROM c),
        t AS (
          SELECT CAST(SUM(w) AS BIGINT) AS sw,
                 CAST(SUM(n_docs) AS BIGINT) // 4 AS t
          FROM w),
        q AS (
          SELECT lang,
                 CAST(FLOOR((CAST(t AS DOUBLE) * CAST(w AS DOUBLE)) /
                   CAST(sw AS DOUBLE)) AS BIGINT) AS quota
          FROM w CROSS JOIN t),
        r AS (
          SELECT doc_id, lang,
                 CAST(ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
          FROM documents)
        SELECT r.doc_id, r.lang, r.rk, q.quota
        FROM r JOIN q USING (lang)
        WHERE r.rk <= q.quota
        ORDER BY r.lang, r.rk
      """)),

    // ───── crawl-URL canonicalization + frontier dedup ─────
    // The first operator of any web-crawl pipeline: collapse the many
    // spellings of one resource (host case, default port, fragment,
    // tracking parameters, parameter order) into a canonical key, then
    // dedup the frontier on it. The corpus carries no URL column, so the
    // messy URLs are SYNTHESIZED deterministically inside the query —
    // two variant shapes per parity of doc_id, engineered so distinct
    // spellings canonicalize to the same key — and the canonicalizer is
    // the part under test. Spelled with codegen'd string/HOF builtins
    // (regexp_extract, filter, array_sort) rather than parse_url so the
    // DuckDB twin shares the exact extraction semantics; patterns use
    // [?]/[#] character classes to avoid cross-engine escape rules.
    //
    // Scale shape: canonicalization is a NARROW projection (no shuffle);
    // dedup is one exchange on the canonical key with map-side partial
    // aggregation. The canonical-key groupBy is the crawl-frontier
    // membrane — at 100 TB it replaces body-level dedup for the ~30% of
    // re-crawls that are URL-identical, at (url, count) shuffle width.
    GraftQuery(
      "curate_url_canonical",
      (s, d) => {
        val url = """
          CASE WHEN doc_id % 2 = 0 THEN
            'https://www.' || source || '.example.com/articles/'
              || CAST(doc_id % 5 AS STRING) || '?id='
              || CAST(doc_id % 3 AS STRING) || '&ref=' || lang
          ELSE
            'HTTPS://WWW.' || source || '.EXAMPLE.COM:443/articles/'
              || CAST(doc_id % 5 AS STRING) || '?utm_source=feed&id='
              || CAST(doc_id % 3 AS STRING) || '&utm_campaign=promo#top'
          END"""
        val docs = Tables.documents(s, d).withColumn("url", expr(url))
        val canon = docs.select(col("doc_id"), col("url"),
          lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/:?#]+)", 1))
            .as("host"),
          regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+(/[^?#]*)", 1)
            .as("path"),
          expr("""array_join(array_sort(filter(
                    split(regexp_extract(url, '[?]([^#]*)', 1), '&'),
                    p -> p != '' AND substr(p, 1, 4) != 'utm_'
                         AND substr(p, 1, 4) != 'ref=')), '&')""")
            .as("q"))
          .select(col("doc_id"),
            concat(lit("https://"), col("host"), col("path"),
              when(col("q") === "", lit("")).otherwise(
                concat(lit("?"), col("q")))).as("canonical_url"))
        canon.groupBy(col("canonical_url"))
          .agg(count(lit(1)).as("n_variants"),
            min(col("doc_id")).as("keeper_doc"))
          .orderBy(col("canonical_url"))
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
            CASE WHEN doc_id % 2 = 0 THEN
              'https://www.' || source || '.example.com/articles/'
                || CAST(doc_id % 5 AS VARCHAR) || '?id='
                || CAST(doc_id % 3 AS VARCHAR) || '&ref=' || lang
            ELSE
              'HTTPS://WWW.' || source || '.EXAMPLE.COM:443/articles/'
                || CAST(doc_id % 5 AS VARCHAR) || '?utm_source=feed&id='
                || CAST(doc_id % 3 AS VARCHAR) || '&utm_campaign=promo#top'
            END AS url
          FROM documents),
        c AS (
          SELECT doc_id,
                 lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1))
                   AS host,
                 regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1)
                   AS path,
                 array_to_string(list_sort(list_filter(
                   string_split(regexp_extract(url, '[?]([^#]*)', 1), '&'),
                   p -> p != '' AND substr(p, 1, 4) != 'utm_'
                        AND substr(p, 1, 4) != 'ref=')), '&') AS q
          FROM u),
        k AS (
          SELECT doc_id,
                 'https://' || host || path ||
                 CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url
          FROM c)
        SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_variants,
               MIN(doc_id) AS keeper_doc
        FROM k GROUP BY canonical_url
        ORDER BY canonical_url
      """)),

    // ───── quality-filter attrition funnel (the C4/RefinedWeb table) ─────
    // Every published pretraining corpus ships this artifact: how many
    // documents each cleaning rule removes, applied AS A CASCADE (each
    // stage sees only the previous stage's survivors — marginal rates
    // depend on rule order, so the order is part of the contract). Four
    // rules over cheap per-doc integer signals: minimum length, lexical
    // diversity (distinct/total tokens ≥ 30%, cross-multiplied — no
    // float shares), mean token length in [3, 9] (total token chars =
    // length(text) − (n−1) separators — the corpus is single-space
    // joined), and a stopword-presence gate. Survival ratios are ppm
    // floor divisions.
    //
    // Scale shape: ONE corpus scan; every rule folds to per-doc booleans
    // computed in the projection, and the funnel is a single partial-agg
    // combined 1-row aggregate — at 100 TB this costs exactly one pass,
    // which is why production pipelines always report it. The 4-row
    // unpivot joins the 1-row frame to a VALUES stage table (broadcast).
    GraftQuery(
      "curate_filter_attrition",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"),
            length(col("text")).as("chars"))
          .select(
            size(col("toks")).cast("long").as("n"),
            size(array_distinct(col("toks"))).cast("long").as("nd"),
            col("chars").cast("long").as("chars"),
            array_contains(col("toks"), "the").as("has_stop"))
          .select(
            (col("n") >= 30).as("r1"),
            (col("nd") * 10 >= col("n") * 3).as("r2"),
            (col("chars") - col("n") + 1 >= col("n") * 3 &&
              col("chars") - col("n") + 1 <= col("n") * 9).as("r3"),
            col("has_stop").as("r4"))
        val agg = docs.agg(
          count(lit(1)).as("c0"),
          count(when(col("r1"), 1)).as("c1"),
          count(when(col("r1") && col("r2"), 1)).as("c2"),
          count(when(col("r1") && col("r2") && col("r3"), 1)).as("c3"),
          count(when(col("r1") && col("r2") && col("r3") && col("r4"), 1))
            .as("c4"))
        agg.select(expr("""explode(array(
            struct(1 AS stage_id, 'min_len_30' AS stage, c0 AS n_in, c1 AS n_out),
            struct(2 AS stage_id, 'lex_diversity_30pct' AS stage, c1 AS n_in, c2 AS n_out),
            struct(3 AS stage_id, 'mean_tok_len_3_9' AS stage, c2 AS n_in, c3 AS n_out),
            struct(4 AS stage_id, 'has_stopword' AS stage, c3 AS n_in, c4 AS n_out)))""")
            .as("s"),
            col("c0"))
          .select(col("s.stage_id").as("stage_id"), col("s.stage").as("stage"),
            col("s.n_in").as("n_in"), col("s.n_out").as("n_out"),
            (col("s.n_in") - col("s.n_out")).as("dropped"),
            // empty corpus: 0-doc funnel rows are honest, the ratio is not
            expr("if(c0 = 0, null, s.n_out * 1000000L div c0)")
              .as("cum_survival_ppm"))
          .orderBy(col("stage_id"))
      },
      Some("""
        WITH f AS (
          SELECT len(string_split(text, ' ')) AS n,
                 len(list_distinct(string_split(text, ' '))) AS nd,
                 CAST(length(text) AS BIGINT) AS chars,
                 list_contains(string_split(text, ' '), 'the') AS has_stop
          FROM documents),
        r AS (
          SELECT n >= 30 AS r1,
                 nd * 10 >= n * 3 AS r2,
                 chars - n + 1 >= n * 3 AND chars - n + 1 <= n * 9 AS r3,
                 has_stop AS r4
          FROM f),
        a AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS c0,
                 CAST(COUNT(*) FILTER (WHERE r1) AS BIGINT) AS c1,
                 CAST(COUNT(*) FILTER (WHERE r1 AND r2) AS BIGINT) AS c2,
                 CAST(COUNT(*) FILTER (WHERE r1 AND r2 AND r3) AS BIGINT) AS c3,
                 CAST(COUNT(*) FILTER (WHERE r1 AND r2 AND r3 AND r4) AS BIGINT) AS c4
          FROM r)
        SELECT s.stage_id, s.stage,
               CASE s.stage_id WHEN 1 THEN c0 WHEN 2 THEN c1
                               WHEN 3 THEN c2 ELSE c3 END AS n_in,
               CASE s.stage_id WHEN 1 THEN c1 WHEN 2 THEN c2
                               WHEN 3 THEN c3 ELSE c4 END AS n_out,
               CASE s.stage_id WHEN 1 THEN c0 - c1 WHEN 2 THEN c1 - c2
                               WHEN 3 THEN c2 - c3 ELSE c3 - c4 END AS dropped,
               CASE WHEN c0 = 0 THEN NULL ELSE
                 CASE s.stage_id WHEN 1 THEN c1 WHEN 2 THEN c2
                                 WHEN 3 THEN c3 ELSE c4 END * 1000000 // c0
               END AS cum_survival_ppm
        FROM a CROSS JOIN (VALUES (1, 'min_len_30'),
                                  (2, 'lex_diversity_30pct'),
                                  (3, 'mean_tok_len_3_9'),
                                  (4, 'has_stopword')) AS s(stage_id, stage)
        ORDER BY s.stage_id
      """)),

    // ───── cross-source duplication matrix — the provenance diagnostic ─────
    // Which crawl sources copy from which: the verified near-dup pairs
    // (Dedup.minhashPairs — banded LSH candidates, exact-Jaccard
    // verified at ≥ 0.8) attributed to their (source, source) cell,
    // unordered (least/greatest), diagonal = within-source duplication.
    // The dataset-card number that decides whether two sources should
    // be ingested as one (mirrors), and the numerator for "dedup will
    // save X% because source A mirrors B". The first cut grouped EXACT
    // body digests instead — vacuous on this corpus (zero exact dups at
    // sf0.01; duplication here is near-dup-shaped, as in real crawls),
    // which is itself the diagnostic's point: the matrix must sit on
    // the same near-dup relation the dedup pass actually uses.
    //
    // Scale shape: inherits dedup_minhash's ladder (§9) — banding keeps
    // pair volume linear; what this adds is one join of the O(pairs)
    // frame against the (doc_id, source) projection (twice) and a
    // ≤ |sources|² aggregate.
    GraftQuery(
      "curate_source_overlap",
      (s, d) => {
        val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
        Dedup.minhashPairs(s, d)
          .join(src.select(col("doc_id").as("doc_a"),
            col("source").as("sa")), Seq("doc_a"))
          .join(src.select(col("doc_id").as("doc_b"),
            col("source").as("sb")), Seq("doc_b"))
          .select(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_dup_pairs"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some(s"""
        WITH ${Dedup.minhashPairsSql},
        attributed AS (
          SELECT LEAST(da.source, db.source) AS source_a,
                 GREATEST(da.source, db.source) AS source_b
          FROM pairs p
          JOIN documents da ON da.doc_id = p.doc_a
          JOIN documents db ON db.doc_id = p.doc_b)
        SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
        FROM attributed
        GROUP BY source_a, source_b
        ORDER BY source_a, source_b
      """)),

    // ───── k-anonymity audit: generalization-lattice re-identification ─────
    // The governance check a dataset release needs BEYOND span-level PII
    // scrubbing (text_pii_scrub removes identifiers; this measures whether
    // the remaining quasi-identifiers still single people out): every
    // record must be indistinguishable from >= K-1 others on its
    // quasi-identifier tuple (Sweeney/Samarati k-anonymity). The lattice
    // generalizes customer's QI tuple one attribute at a time —
    //   L0 (nation, segment, balance-band-4000) ⊂ L1 (nation, segment)
    //   ⊂ L2 (segment) ⊂ L3 (fully suppressed)
    // — and each record reports the FINEST level whose equivalence class
    // already holds >= K members (nesting makes that well-defined, and
    // constant per L0 class). Output: per level, how many records land
    // there, how many distinct classes anonymize them, and the class-size
    // range — the release-review table ("x% publishable at full
    // granularity, y% need the balance generalized away, ...").
    //
    // Determinism: the band is floor(acctbal / 4000) — ONE shared IEEE
    // division+floor on the same double in both engines; everything after
    // is exact integer counts. Class keys only feed a COUNT(DISTINCT) so
    // they need injectivity per engine, not identical formatting.
    //
    // Scale shape (100 TB): ONE corpus-wide aggregate builds the finest
    // (L0) class-size frame — map-side combined, output bounded by
    // |nations|·|segments|·|bands|, metadata-sized. Every coarser level
    // ROLLS UP from that frame, never re-touching the corpus: g1/g2/tot
    // are aggregates OVER L0's rows, the joins and the final per-level
    // aggregate run on class frames. Records never shuffle at all — the
    // per-record answer is implied by its L0 class, so n_records is
    // SUM(n0), not a second corpus pass.
    GraftQuery(
      "curate_k_anonymity",
      (s, d) => {
        val K = 8
        val g0 = Materialize.stage(Tables.customer(s, d)
          .groupBy(col("c_nationkey").cast("long").as("nat"),
            col("c_mktsegment").as("seg"),
            expr("CAST(floor(c_acctbal / 4000) AS BIGINT)").as("band"))
          .agg(count(lit(1)).as("n0")))
        val g1 = g0.groupBy(col("nat"), col("seg"))
          .agg(sum(col("n0")).as("n1"))
        val g2 = g0.groupBy(col("seg")).agg(sum(col("n0")).as("n2"))
        val tot = g0.agg(sum(col("n0")).as("n3"))
        g0.join(g1, Seq("nat", "seg")).join(g2, Seq("seg"))
          .crossJoin(broadcast(tot))
          .withColumn("lvl", expr(s"CAST(CASE WHEN n0 >= $K THEN 0 " +
            s"WHEN n1 >= $K THEN 1 WHEN n2 >= $K THEN 2 ELSE 3 END AS BIGINT)"))
          .withColumn("class_key", expr("CASE lvl " +
            "WHEN 0 THEN concat(CAST(nat AS STRING), '|', seg, '|', " +
            "CAST(band AS STRING)) " +
            "WHEN 1 THEN concat(CAST(nat AS STRING), '|', seg) " +
            "WHEN 2 THEN seg ELSE '*' END"))
          .withColumn("sz", expr("CASE lvl WHEN 0 THEN n0 WHEN 1 THEN n1 " +
            "WHEN 2 THEN n2 ELSE n3 END"))
          .groupBy(col("lvl"))
          .agg(sum(col("n0")).cast("long").as("n_records"),
            count_distinct(col("class_key")).as("n_classes"),
            min(col("sz")).cast("long").as("min_class"),
            max(col("sz")).cast("long").as("max_class"))
          .orderBy(col("lvl"))
      },
      Some("""
        WITH g0 AS (
          SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
                 CAST(floor(c_acctbal / 4000) AS BIGINT) AS band,
                 CAST(COUNT(*) AS BIGINT) AS n0
          FROM customer GROUP BY 1, 2, 3),
        g1 AS (SELECT nat, seg, CAST(SUM(n0) AS BIGINT) AS n1
               FROM g0 GROUP BY 1, 2),
        g2 AS (SELECT seg, CAST(SUM(n0) AS BIGINT) AS n2 FROM g0 GROUP BY 1),
        tot AS (SELECT CAST(SUM(n0) AS BIGINT) AS n3 FROM g0),
        cls AS (
          SELECT g0.*, g1.n1, g2.n2, tot.n3,
                 CAST(CASE WHEN n0 >= 8 THEN 0 WHEN n1 >= 8 THEN 1
                      WHEN n2 >= 8 THEN 2 ELSE 3 END AS BIGINT) AS lvl
          FROM g0 JOIN g1 USING (nat, seg) JOIN g2 USING (seg)
          CROSS JOIN tot),
        keyed AS (
          SELECT lvl, n0,
                 CASE lvl WHEN 0 THEN CAST(nat AS VARCHAR) || '|' || seg
                            || '|' || CAST(band AS VARCHAR)
                          WHEN 1 THEN CAST(nat AS VARCHAR) || '|' || seg
                          WHEN 2 THEN seg ELSE '*' END AS class_key,
                 CASE lvl WHEN 0 THEN n0 WHEN 1 THEN n1
                          WHEN 2 THEN n2 ELSE n3 END AS sz
          FROM cls)
        SELECT lvl, CAST(SUM(n0) AS BIGINT) AS n_records,
               CAST(COUNT(DISTINCT class_key) AS BIGINT) AS n_classes,
               MIN(sz) AS min_class, MAX(sz) AS max_class
        FROM keyed GROUP BY lvl ORDER BY lvl
      """)),

    // ───── differentially-private histogram release (ε = ln 2) ─────
    // The release step after `curate_k_anonymity`'s audit: publish the
    // corpus composition histogram (docs per (lang, source) cell) under
    // the discrete Laplace mechanism at sensitivity 1 — the mechanism
    // every DP aggregate release (SQL DP engines, census tables) builds
    // on. Noise = G₁ − G₂ with G ~ Geometric(1/2) iid, whose difference
    // IS the two-sided geometric P(k) ∝ 2^(−|k|), i.e. ε = ln 2 ("one
    // bit of budget"); released = max(0, n + noise) (post-processing —
    // clamping never spends budget).
    //
    // Why the geometric draw is EXACT integer arithmetic here: with
    // α = 1/2 the inverse CDF is G = ⌊−log₂ u⌋, and for u = m/2²⁰ the
    // floor boundaries sit exactly at the powers of two where the chord
    // log2 (IntMath.lg2fp) is EXACT; strict monotonicity between knots
    // means the chord bins every m into the same ⌊−log₂⌋ bucket as true
    // log2 — so the sampled G is the exact geometric inverse-CDF value,
    // not an approximation (truncated at G = 20 by the 20-bit u, a
    // 2⁻²⁰ tail event). No libm, no floats, bit-identical both engines.
    //
    // Honesty note (the mechanism is real, the entropy source is not):
    // u derives from md5(cell∥salt) so the oracle gate can twin the
    // draw value-for-value — a production release swaps the md5 for a
    // cryptographic RNG and publishes ONCE (fixed seeds allow averaging
    // attacks; and a released table must enumerate a PUBLIC domain, not
    // the observed cells, or absence itself leaks — both documented
    // deployment deltas, neither changes the plan shape).
    //
    // Scale shape (100 TB): one map-side-combined groupBy collapses the
    // corpus to |langs|·|sources| metadata-sized cells; the two draws
    // are scalar expressions ON those cells — zero extra exchanges,
    // corpus bytes never move twice.
    GraftQuery(
      "curate_dp_release",
      (s, d) => {
        val FP = IntMath.FP
        def geom(salt: String): String = {
          val m1 = s"(CAST(conv(substring(md5(concat(lang, ':', source, " +
            s"':$salt')), 1, 5), 16, 10) AS BIGINT) + 1)"
          s"((20 * ${FP}L - (${IntMath.lg2fp(m1)})) div ${FP}L)"
        }
        Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).cast("long").as("n"))
          .withColumn("released", expr(
            s"GREATEST(CAST(0 AS BIGINT), n + ${geom("dp1")} - ${geom("dp2")})"))
          .select(col("lang"), col("source"), col("released"))
          .orderBy(col("lang"), col("source"))
      },
      Some({
        def geomD(salt: String): String = {
          val m1 = s"(('0x' || substr(md5(lang || ':' || source || " +
            s"':$salt'), 1, 5))::BIGINT + 1)"
          s"((20 * ${IntMath.FP} - (${IntMath.lg2fpDuck(m1)})) // ${IntMath.FP})"
        }
        s"""
        WITH cells AS (
          SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
          FROM documents GROUP BY lang, source)
        SELECT lang, source,
               GREATEST(CAST(0 AS BIGINT),
                 n + ${geomD("dp1")} - ${geomD("dp2")}) AS released
        FROM cells ORDER BY lang, source
      """
      }))
  )

  /** Token estimate: ceil(chars/4) floored at 1 — the floor means an
    * empty doc still occupies a slot, and a strictly increasing running
    * sum keeps (source, cum_tokens) a TOTAL order (ties would let the
    * two engines emit tied rows in different order and break the hash
    * gate). Shared by `curate_shard_plan` and `curate_pipeline_e2e`.
    */
  private[graft] def tokenEstimate =
    greatest(lit(1L), expr("(length(text) + 3) div 4").cast("long"))

  private[graft] val tokenEstimateSql =
    "GREATEST(1, CAST((length(text) + 3) // 4 AS BIGINT))"

  /** Context-window length for `curate_pack_sequences` (tokens per
    * training sequence). A plan literal on both engines.
    */
  private[graft] val packLen = 512

  /** Per-source running token sum in md5(doc_id) order, as a TWO-LEVEL
    * distributed scan (the textbook parallel-prefix decomposition): a
    * single `Window.partitionBy(source)` would serialize each source's
    * entire row set into one task — the straggler shape this engine
    * rejects elsewhere. Instead docs bucket by their md5 key's first
    * 2 hex chars (256 ordered ranges per source), within-bucket prefix
    * sums run in parallel tasks, and each bucket adds a global offset
    * from a 256-rows-per-source totals table (broadcast — bounded by
    * 256 × sources, never corpus-sized). The bucket id is a PREFIX of
    * the ordering key, so bucket-major order IS md5 order and the
    * two-level sum equals the single-window sum exactly — every
    * consumer's DuckDB oracle computes the plain window, pinning that
    * equality per row. Shared by `curate_shard_plan`,
    * `curate_pack_sequences`, and `curate_pipeline_e2e`.
    *
    * Input: (doc_id, source, n_tokens, …); output adds `cum` (strictly
    * increasing per source because n_tokens ≥ 1).
    */
  private[graft] def sourcePrefixSum(toks: org.apache.spark.sql.DataFrame) = {
    val keyed = toks
      .withColumn("k", md5(col("doc_id").cast("string")))
      .withColumn("bkt", expr("conv(substring(k, 1, 2), 16, 10)").cast("int"))
    val wIn = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("k"), col("doc_id"))
    val within = keyed.withColumn("cum_in", sum(col("n_tokens")).over(wIn))
    val wBkt = Window.partitionBy(col("source")).orderBy(col("bkt"))
    val offsets = within.groupBy(col("source"), col("bkt"))
      .agg(sum(col("n_tokens")).as("tot"))
      .withColumn("off", sum(col("tot")).over(wBkt) - col("tot"))
      .select(col("source").as("src2"), col("bkt").as("bkt2"), col("off"))
    within
      .join(broadcast(offsets),
        col("source") === col("src2") && col("bkt") === col("bkt2"))
      .withColumn("cum", (col("off") + col("cum_in")).cast("long"))
      .drop("k", "bkt", "cum_in", "src2", "bkt2", "off", "tot")
  }

  /** Shard assignment over (doc_id, source, n_tokens): per-source
    * md5-deterministic order, running token sum, ~2000-token shards.
    * Shared by `curate_shard_plan` and `curate_pipeline_e2e` (with
    * [[shardSql]] as its DuckDB twin) so the manifests can't drift.
    */
  private[graft] def shardPlan(toks: org.apache.spark.sql.DataFrame) =
    sourcePrefixSum(toks)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum").as("cum_tokens"),
        expr("(cum - 1) div 2000").cast("long").as("shard_id"))
      .orderBy(col("source"), col("cum_tokens"), col("doc_id"))

  /** DuckDB twin of [[shardPlan]]; `tokSrc` must yield
    * (doc_id, source, n_tokens).
    */
  private[graft] def shardSql(tokSrc: String): String = s"""
        SELECT doc_id, source, n_tokens, cum_tokens,
               (cum_tokens - 1) // 2000 AS shard_id
        FROM (
          SELECT doc_id, source, n_tokens,
                 CAST(SUM(n_tokens) OVER (PARTITION BY source
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
          FROM $tokSrc) t1
        ORDER BY source, cum_tokens, doc_id"""


  /** The quality-gate rule ladder as added columns (`n_tokens`, `swr`,
    * `ar`, `dup_bg`, `reason`) — shared by `curate_quality_gate` and the
    * composed `curate_pipeline_e2e` so the two can never disagree. See
    * the gate query's comment for the cross-engine determinism rules.
    */
  private[graft] def withGateReason(df: org.apache.spark.sql.DataFrame) =
    df
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("swr",
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(expr(
            s"size(filter(toks, t -> t IN ${TextAnalysis.inList(TextAnalysis.stop("en"))}))")
            .cast("double") / col("n_tokens")))
      .withColumn("ar",
        when(length(col("text")) === 0, lit(null).cast("double"))
          .otherwise(length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
            .cast("double") / length(col("text"))))
      .withColumn("bg",
        when(size(col("toks")) >= 2, expr(
          "transform(sequence(0, size(toks)-2), i -> " +
            "concat(toks[i], ' ', toks[i+1]))"))
          .otherwise(expr("array()")))
      .withColumn("dup_bg",
        when(size(col("bg")) === 0, lit(null).cast("double"))
          .otherwise((size(col("bg")) - size(array_distinct(col("bg"))))
            .cast("double") / size(col("bg"))))
      .withColumn("reason",
        // isNull arm: a NULL text yields NULL n_tokens (not 0), which
        // would skip every comparison and fall through to "keep" —
        // junk must land in too_short, and the ratio rules below then
        // never see a NULL the length rule didn't already catch
        when(col("n_tokens").isNull || col("n_tokens") < 20, "too_short")
          .when(col("swr") < 0.02, "low_stopword")
          .when(col("ar") < 0.81, "low_alpha")
          .when(col("dup_bg") > 0.08, "repetitive")
          .otherwise("keep"))

  /** DuckDB twin of [[withGateReason]]: CTEs `t/m/r/g`, with `g` ending
    * at (doc_id, n_tokens, swr, ar, dup_bg, reason).
    */
  private def gateCtes: String = s"""
        t AS (
          SELECT doc_id, text,
                 list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CASE WHEN len(toks) = 0 THEN NULL
                      ELSE CAST(len(list_filter(toks,
                             t -> t IN ${TextAnalysis.inList(TextAnalysis.stop("en"))})) AS DOUBLE)
                           / len(toks) END AS swr,
                 CASE WHEN length(text) = 0 THEN NULL
                      ELSE CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                           / length(text) END AS ar,
                 CASE WHEN len(toks) >= 2
                      THEN list_transform(generate_series(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i + 1])
                      ELSE [] END AS bg
          FROM t),
        r AS (
          SELECT doc_id, n_tokens, swr, ar,
                 CASE WHEN len(bg) = 0 THEN NULL
                      ELSE CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
                           / len(bg) END AS dup_bg
          FROM m),
        g AS (
          SELECT doc_id, n_tokens, swr, ar, dup_bg,
                 CASE WHEN n_tokens IS NULL OR n_tokens < 20 THEN 'too_short'
                      WHEN swr < 0.02 THEN 'low_stopword'
                      WHEN ar < 0.81 THEN 'low_alpha'
                      WHEN dup_bg > 0.08 THEN 'repetitive'
                      ELSE 'keep' END AS reason
          FROM r)"""
}
