package graft.ops

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data SELECTION operators — the decisions between a curated
  * corpus and an actual training run: which docs land in train/val/test,
  * in what global order they stream, which docs an importance sampler
  * keeps, how long docs chunk into retrieval windows, which collocations
  * the corpus is made of, and how embeddings compress for serving.
  *
  * Determinism rules (same contract as Curation): no engine RNG anywhere —
  * "random" is md5 of a stable id; all scores are integer or
  * single-division doubles over exact integers, so every query here is
  * value-level oracle-twinnable and hash-matches DuckDB bit-for-bit.
  *
  * Scale notes (100 TB) are per-query below; the common theme is that
  * shuffles carry (doc_id, token) or (doc_id, counters) pairs — document
  * bodies move at most once, in the narrow projection that explodes them.
  */
object Selection extends QueryModule {

  /** Retrieval chunk geometry: window of 32 tokens, stride 24 (8-token
    * overlap so a fact straddling a boundary appears whole in one side).
    * Plan literals on both engines.
    */
  private[ops] val ChunkW = 32
  private[ops] val ChunkS = 24

  /** Curation's token-estimate expression, inlined for the card's SQL. */
  private val tokenEstimateSqlInline = Curation.tokenEstimateSql

  /** The chunk projection itself, shared verbatim by the registered
    * query and the STREAMING splitter (`StreamingPipeline.chunkedDocs`)
    * — a narrow stateless explode, so the exact same expression tree
    * runs in both execution modes and stream/batch chunk boundaries
    * cannot drift. Input needs (doc_id, text) plus any carried columns;
    * output adds (chunk_id, chunk_start, n_chunk_toks, chunk_text).
    */
  private[graft] def chunked(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("k", explode(expr(
        s"sequence(0L, if(n <= $ChunkW, 0L, (n - $ChunkW + ${ChunkS - 1}) div $ChunkS))")))
      .withColumn("chunk_id", col("k").cast("long"))
      .withColumn("chunk_start", (col("k") * ChunkS).cast("long"))
      .withColumn("n_chunk_toks",
        least(lit(ChunkW.toLong), col("n") - col("k") * ChunkS).cast("long"))
      .withColumn("chunk_text",
        expr(s"array_join(slice(toks, int(k * $ChunkS) + 1, $ChunkW), ' ')"))
      .drop("toks", "n", "k")

  override def queries: Seq[GraftQuery] = Seq(

    // ───── deterministic train/val/test split ─────
    // Split membership is a pure function of the DOCUMENT ID (md5 hex
    // compared against fixed hex-fraction boundaries: 'c' = 12/16 →
    // 75% train, 'e' = 14/16 → 12.5% val, rest test), so it is stable
    // under repartitioning, re-ingestion, engine swap, and corpus
    // growth — a doc never migrates between splits, the property that
    // keeps eval sets uncontaminated across dataset versions. Zero
    // shuffle: a narrow codegen'd projection at scan speed (the final
    // orderBy exists for the oracle compare only).
    GraftQuery(
      "curate_split",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            md5(col("doc_id").cast("string")).as("h"))
          .select(col("doc_id"), col("source"),
            when(col("h") < "c", "train")
              .when(col("h") < "e", "val")
              .otherwise("test").as("split"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id, source,
               CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'c' THEN 'train'
                    WHEN md5(CAST(doc_id AS VARCHAR)) < 'e' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents ORDER BY doc_id
      """)),

    // ───── contiguous global training index ─────
    // Every doc gets a stable, gap-free 0-based position in the
    // deterministic global shuffle order (md5 of the id — the same
    // order curate_global_shuffle materializes physically). Contiguity
    // is what checkpoint-resume needs: "restart at sample 1_234_567"
    // only means something if indexes have no holes. A naive global
    // ROW_NUMBER() is a single-task sort at 100 TB; here the order is
    // split into 256 uniform md5-prefix buckets — per-bucket counts
    // (256-row aggregate) become broadcast cumulative offsets, and each
    // bucket numbers its own rows in parallel (a window per bucket, 256
    // concurrent groups), so index = bucket offset + in-bucket rank.
    // The same two-level scan Curation.sourcePrefixSum uses for token
    // offsets, applied to ordinal position.
    GraftQuery(
      "curate_global_index",
      (s, d) => {
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("bkt", substring(col("h"), 1, 2))
        val offsets = keyed.groupBy(col("bkt"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("off",
            coalesce(sum(col("cnt")).over(
              Window.orderBy(col("bkt"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bkt"), col("off"))
        val w = Window.partitionBy(col("bkt"))
          .orderBy(col("h"), col("doc_id"))
        keyed
          .withColumn("rn", row_number().over(w))
          .join(broadcast(offsets), Seq("bkt"))
          .select(col("doc_id"),
            (col("off") + col("rn") - lit(1L)).cast("long").as("train_idx"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
                 AS BIGINT) AS train_idx
        FROM documents ORDER BY doc_id
      """)),

    // ───── DSIR-shaped importance selection ─────
    // Data Selection via Importance Resampling (Xie et al. 2023): score
    // each corpus doc by how target-like its token distribution is —
    // here the target is the English subset — and keep the top slice.
    // Feature weights are add-one-smoothed count ratios in fixed-point
    // integer arithmetic, w(t) = 1e6·(target_count+1) DIV (corpus_count
    // +1), a doc's score the sum over its token OCCURRENCES, length-
    // normalized by integer division; every step is exact, so the
    // selection is engine-independent. The 1e6·(tc+1) intermediate
    // rides 128-bit (DECIMAL(38,0) / DuckDB's native HUGEINT sums):
    // int64 would overflow once a token's target count passes ~9.2e12,
    // inside the 100 TB regime. The quotient itself is ≤ 1e6 (tc ≤ sc
    // always), so w and the per-doc score (≤ 1e6·doc_len ≈ 1e15 even
    // for a 1e9-token doc) stay comfortably int64. (Production DSIR hashes features
    // into a fixed-width table to bound memory on a single machine; on
    // Spark the token shuffle IS the feature table, so exact word
    // features cost nothing extra and the dataflow is identical.)
    // Scale: one explode to (doc_id, token) — the only pass over
    // bodies; one token-key aggregation for the weight table; one
    // shuffled equi-join probe (AQE broadcasts the weight side when it
    // measures small); one doc-key sum; TakeOrdered top-200 heap.
    GraftQuery(
      "curate_importance_sample",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            (col("lang") === "en").as("is_tgt"),
            explode(split(col("text"), " ")).as("tok"))
        val weights = toks.groupBy(col("tok"))
          .agg(count(lit(1)).as("sc"),
            sum(col("is_tgt").cast("long")).as("tc"))
          .select(col("tok"),
            expr("(1000000L * CAST(tc + 1 AS DECIMAL(38,0))) DIV (sc + 1)")
              .as("w"))
        toks.join(weights, Seq("tok"))
          .groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("score"))
          .select(col("doc_id"), col("source"), col("n_toks"),
            expr("score DIV n_toks").as("imp"))
          .orderBy(col("imp").desc, col("doc_id").asc)
          .limit(200)
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source, lang = 'en' AS is_tgt,
                 UNNEST(string_split(text, ' ')) AS tok
          FROM documents),
        weights AS (
          SELECT tok,
                 (1000000 * (CAST(SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END)
                               AS HUGEINT) + 1))
                   // (COUNT(*) + 1) AS w
          FROM toks GROUP BY tok)
        SELECT doc_id, source, COUNT(*) AS n_toks,
               CAST(SUM(w) // COUNT(*) AS BIGINT) AS imp
        FROM toks JOIN weights USING (tok)
        GROUP BY doc_id, source
        ORDER BY imp DESC, doc_id ASC
        LIMIT 200
      """)),

    // ───── fixed-window chunking with overlap (the RAG splitter) ─────
    // Docs cut into 32-token windows every 24 tokens (chunks overlap by
    // 8 so boundary-straddling facts survive whole in one chunk); the
    // final window is allowed short, and a doc shorter than one window
    // is its own single chunk. Chunk count is exact integer math —
    // 1 + ceil((n−W)/S) via the (n−W+S−1) DIV S identity — and the
    // slice bounds are identical 1-based arithmetic on both engines.
    // Scale: a narrow explode (the per-doc fanout is n/S chunks); no
    // shuffle at all until the oracle-only sort — at 100 TB this runs
    // at scan speed and feeds the embedding stage downstream.
    GraftQuery(
      "text_chunk_windows",
      (s, d) =>
        chunked(Tables.documents(s, d).select(col("doc_id"), col("text")))
          .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
            col("n_chunk_toks"), col("chunk_text"))
          .orderBy(col("doc_id"), col("chunk_id")),
      Some(s"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n
          FROM documents),
        c AS (
          SELECT doc_id, toks, n,
                 UNNEST(generate_series(0, CASE WHEN n <= $ChunkW THEN 0
                   ELSE (n - $ChunkW + ${ChunkS - 1}) // $ChunkS END)) AS k
          FROM t)
        SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
               CAST(k * $ChunkS AS BIGINT) AS chunk_start,
               CAST(LEAST($ChunkW, n - k * $ChunkS) AS BIGINT) AS n_chunk_toks,
               array_to_string(
                 toks[k * $ChunkS + 1 : k * $ChunkS + $ChunkW], ' ')
                 AS chunk_text
        FROM c ORDER BY doc_id, chunk_id
      """)),

    // ───── corpus collocations by lift (the PMI ranking, log-free) ─────
    // Top adjacent-pair collocations ranked by lift = N·c(xy) /
    // (c(x)·c(y)) — the monotone argument of PMI (PMI = log lift), kept
    // rational so both engines agree bit-for-bit: the numerator and
    // denominator are exact int64 products (N ≈ corpus tokens, c ≤ N →
    // products ≤ ~1e13 at sf0.1, far inside int64), and the one double
    // division is the same two operands in the same order. A min-count
    // floor (c(xy) ≥ 5) applies the standard collocation guard against
    // one-off pairs with tiny denominators. Scale: token and pair
    // counts are two partial-agg shuffles over (token) / (pair) keys;
    // the unigram probe joins are key-equi (AQE broadcasts when small);
    // top-30 is a TakeOrdered heap, never a global sort.
    GraftQuery(
      "text_collocations",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(split(col("text"), " ").as("toks"))
        val uni = docs.select(explode(col("toks")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val tot = uni.agg(sum(col("c")).as("n")) // 1 row, broadcast
        val pairs = docs.filter(size(col("toks")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(toks)-2), i -> struct(toks[i] as x, toks[i+1] as y))"))
            .as("p"))
          .select(col("p.x").as("x"), col("p.y").as("y"))
          .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
          .filter(col("cxy") >= 5)
        pairs
          .join(uni.select(col("tok").as("x"), col("c").as("cx")), Seq("x"))
          .join(uni.select(col("tok").as("y"), col("c").as("cy")), Seq("y"))
          .crossJoin(broadcast(tot))
          .select(col("x"), col("y"), col("cxy"), col("cx"), col("cy"),
            ((col("n") * col("cxy")).cast("double") /
              (col("cx") * col("cy")).cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("x").asc, col("y").asc)
          .limit(30)
      },
      Some("""
        WITH docs AS (
          SELECT string_split(text, ' ') AS toks FROM documents),
        uni AS (
          SELECT tok, COUNT(*) AS c
          FROM (SELECT UNNEST(toks) AS tok FROM docs) GROUP BY tok),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
        pairs AS (
          SELECT x, y, COUNT(*) AS cxy FROM (
            SELECT toks[i] AS x, toks[i + 1] AS y
            FROM (SELECT toks, UNNEST(generate_series(1, len(toks) - 1)) AS i
                  FROM docs WHERE len(toks) >= 2))
          GROUP BY x, y HAVING COUNT(*) >= 5)
        SELECT x, y, cxy, cx, cy,
               CAST(n * cxy AS DOUBLE) / CAST(cx * cy AS DOUBLE) AS lift
        FROM pairs
        JOIN (SELECT tok AS x, c AS cx FROM uni) USING (x)
        JOIN (SELECT tok AS y, c AS cy FROM uni) USING (y)
        CROSS JOIN tot
        ORDER BY lift DESC, x ASC, y ASC
        LIMIT 30
      """)),

    // ───── vocabulary coverage: the tokenizer-budget curve ─────
    // The question a tokenizer design answers first: how much of the
    // corpus do the top-V token types cover? Top-200 types by
    // occurrence count with cumulative coverage in integer ppm — the
    // elbow of this curve sets the vocab budget, and OOV rate at any V
    // reads off as 1e6 − cum_ppm. Exact integer math throughout (the
    // running sum rides the ordered ≤200-row frame, not the corpus).
    // Scale: one token-count shuffle with map-side combine, a
    // TakeOrdered top-200 heap, a broadcast 1-row total; the window
    // runs over 200 rows regardless of corpus size.
    GraftQuery(
      "text_vocab_coverage",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val tot = counts.agg(sum(col("c")).as("t")) // 1 row
        val top = counts
          .orderBy(col("c").desc, col("tok").asc).limit(200)
        val w = Window.orderBy(col("c").desc, col("tok").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        top.crossJoin(broadcast(tot))
          .withColumn("rank",
            row_number().over(Window.orderBy(col("c").desc, col("tok").asc))
              .cast("long"))
          .withColumn("cum", sum(col("c")).over(w))
          .select(col("rank"), col("tok"), col("c"),
            expr("cum * 1000000L DIV t").as("cum_ppm"))
          .orderBy(col("rank"))
      },
      Some("""
        WITH counts AS (
          SELECT tok, COUNT(*) AS c FROM (
            SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY tok),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM counts),
        top AS (
          SELECT tok, c FROM counts ORDER BY c DESC, tok ASC LIMIT 200)
        SELECT CAST(ROW_NUMBER() OVER ord AS BIGINT) AS rank, tok, c,
               CAST(SUM(c) OVER (ORDER BY c DESC, tok ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1000000 // t AS BIGINT) AS cum_ppm
        FROM top CROSS JOIN tot
        WINDOW ord AS (ORDER BY c DESC, tok ASC)
        ORDER BY rank
      """)),

    // ───── the dataset card: one-row corpus summary ─────
    // The summary block a dataset release ships (HF dataset-card
    // numbers): corpus size, source/language breadth, token volume,
    // English share, and the exact-duplicate rate — in ONE aggregation
    // pass (multiple COUNT DISTINCTs expand the scan like
    // stats_profile; each partial is a counter). All-integer outputs
    // (shares in ppm by integer division), so the card is bit-stable
    // across engines and runs — a reproducibility statement, not just
    // a convenience.
    GraftQuery(
      "curate_dataset_card",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"), Curation.tokenEstimate.as("n_toks"),
            md5(col("text")).as("body"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("n_toks")).as("est_tokens"),
            sum(col("n_chars")).as("n_chars"),
            sum((col("lang") === "en").cast("long")).as("n_en"),
            countDistinct(col("body")).as("n_unique_bodies"))
          .select(col("n_docs"), col("n_sources"), col("n_langs"),
            col("est_tokens"), col("n_chars"),
            expr("if(n_docs = 0, null, (n_en * 1000000L) DIV n_docs)")
              .as("en_ppm"),
            (col("n_docs") - col("n_unique_bodies")).as("n_exact_dups"),
            expr("""if(n_docs = 0, null,
                    ((n_docs - n_unique_bodies) * 1000000L) DIV n_docs)""")
              .as("dup_ppm")),
      Some(s"""
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT source) AS n_sources,
               COUNT(DISTINCT lang) AS n_langs,
               CAST(SUM($tokenEstimateSqlInline) AS BIGINT) AS est_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CAST(CASE WHEN COUNT(*) = 0 THEN NULL ELSE
                 (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000)
                 // COUNT(*) END AS BIGINT) AS en_ppm,
               COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups,
               CAST(CASE WHEN COUNT(*) = 0 THEN NULL ELSE
                 ((COUNT(*) - COUNT(DISTINCT md5(text))) * 1000000)
                 // COUNT(*) END AS BIGINT) AS dup_ppm
        FROM documents
      """)),

    // ───── int8 scalar quantization of embeddings ─────
    // Per-vector symmetric scalar quantization: scale by 127/max|x| and
    // floor to int8-range codes — 4× smaller vectors for ANN serving
    // (and the scalar sibling of sim_ann_pq's product quantization,
    // which trades more accuracy for 64×). floor() — not round, whose
    // half-way rule differs across engines — keeps the code exact IEEE
    // on both sides; the reported distortion is the MAX absolute
    // reconstruction error (order-independent, unlike a float sum), its
    // per-element expression evaluated in the same operation order on
    // both engines. All-zero vectors quantize to all-zero codes, scale
    // 0. Zero shuffle: a narrow per-row transform at scan speed.
    GraftQuery(
      "sim_quantize_int8",
      (s, d) =>
        Tables.embeddings(s, d)
          .withColumn("mx", expr(
            "array_max(transform(embedding, v -> abs(cast(v as double))))"))
          .select(col("vec_id"), col("mx"),
            // codes travel as a CSV string in the VERIFY projection only
            // (value-level compare across engines needs a scalar); the
            // real storage form is the int array the expression folds
            expr("""array_join(transform(embedding, v -> if(mx = 0d, 0,
                    cast(floor(cast(v as double) * 127.0 / mx) as int))), ',')""")
              .as("codes"),
            expr("""if(mx = 0d, 0d, array_max(transform(embedding, v ->
                    abs(cast(v as double) -
                        floor(cast(v as double) * 127.0 / mx) * mx / 127.0))))""")
              .as("max_err"))
          .orderBy(col("vec_id")),
      Some("""
        WITH m AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                   v -> abs(CAST(v AS DOUBLE)))) AS mx
          FROM embeddings)
        SELECT vec_id, mx,
               array_to_string(
                 list_transform(embedding, v -> CASE WHEN mx = 0 THEN 0
                   ELSE CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / mx) AS INTEGER)
                   END), ',') AS codes,
               CASE WHEN mx = 0 THEN 0.0 ELSE
                 list_max(list_transform(embedding, v ->
                   abs(CAST(v AS DOUBLE) -
                       FLOOR(CAST(v AS DOUBLE) * 127.0 / mx) * mx / 127.0)))
                 END AS max_err
        FROM m ORDER BY vec_id
      """))
  )
}
