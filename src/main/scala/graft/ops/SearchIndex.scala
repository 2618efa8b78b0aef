package graft.ops

import graft.{GraftQuery, QueryModule, Tables}
import graft.pipeline.{SnapshotStore, Sources}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted index with BM25 probe — full-text retrieval as a
  * lake table (SURVEY.md §2.8 text-analysis family, productionized the
  * same way `VectorIndex` productionizes `sim_ann_ivf`).
  *
  * `text_bm25` recomputes its posting lists per query; a serving corpus
  * keeps them. Structure:
  *
  *  - postings rows `(term, doc_id, tf, dl)` live in a `SnapshotStore`
  *    whose bucket id is `hash(term) % shards` (`bucketCol`): a term's
  *    whole posting list is co-located in one shard dir, so a probe
  *    reads ≤ |query terms| shard dirs — IO independent of corpus
  *    size. `dl` (the doc's token count) is DENORMALIZED onto each
  *    posting — the Lucene-norms trick — so scoring needs no doc-table
  *    join; `df(term)` is simply the probed posting list's length. The
  *    store key `term \\u0001 doc_id` makes re-ingest of a doc's
  *    postings a keyed upsert.
  *  - corpus-wide scalars (`n` docs, `tot` tokens — BM25's other
  *    inputs) ride a 2-row stats store at `dir/_stats`, incrementally
  *    maintained: each ingest ADDS the batch's counts (never rescans),
  *    committed at the same version as the postings so the pair moves
  *    in lockstep and replays no-op together.
  *
  * Scale shape (100 TB of text): build is the one full pass (tokenize →
  * one (doc, term) partial-agg shuffle); ingest is O(new docs' tokens +
  * touched shards); probe is O(matched posting lists) with exact BM25 —
  * the integer-cleared single-division formulation shared with
  * `text_bm25`, so scores are bit-identical across engines. Stop-word
  * class terms make a shard hot: the same cap/salting treatment as the
  * ANN cells applies, and real deployments also drop stop-words at
  * build (both documented, neither needed at test SF where the gate
  * must stay exact).
  *
  * Contract: `ingest` indexes NEW or re-sent documents; a re-sent doc
  * whose text LOST a term leaves that term's old posting behind (the
  * merge only sees the delta's buckets). Re-indexing changed docs needs
  * the tombstone path (`opCol`) with the old term set — the standard
  * delete-then-add of every incremental search engine.
  *
  * The registered query proves the lifecycle under the value-level
  * oracle: build from the 3/4 base corpus → ingest the held-out quarter
  * → probe three terms; the DuckDB twin is the full-corpus BM25
  * statement (identical to `text_bm25`'s oracle), so the hash gate pins
  * build + ingest + probe ≡ scoring the final corpus directly.
  */
object SearchIndex extends QueryModule {

  /** Term-shard count. At corpus scale this is the posting-list
    * placement unit (a few thousand); 16 keeps test stores inspectable.
    */
  private[graft] val shards = 16

  private def statsDir(dir: String) = s"$dir/_stats"

  /** (doc_id, tok) token stream — whitespace model shared with
    * `text_bm25` (same tokens → same tf/dl/df → same scores).
    */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")

  /** Postings for a doc batch: `(pkey, term, doc_id, tf, dl, shard)`.
    * One (doc, term) partial-agg shuffle; dl denormalized per posting.
    */
  private def postings(docs: DataFrame): DataFrame = {
    val t = tokens(docs)
    val tf = t.groupBy(col("doc_id"), col("tok").as("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    tf.join(dl, "doc_id")
      .select(
        concat_ws("", col("term"), col("doc_id")).as("pkey"),
        col("term"), col("doc_id"), col("tf"), col("dl"),
        pmod(hash(col("term")), lit(shards)).as("shard"))
  }

  /** One exactly-once index commit for a doc batch that may mix adds
    * and deletes (`opCol`: rows with `'d'` remove, anything else adds;
    * None = all adds). Deletes tombstone every posting of the doc —
    * delete-by-reindex: the caller supplies the doc's LAST-INDEXED
    * text, so the term set is exact. The stats sidecar moves by the
    * SIGNED batch totals (2 tiny rows, adjusted in the plan — no
    * driver arithmetic) at the same version id, so a replayed batch
    * no-ops on BOTH stores' markers and the pair stays in lockstep.
    */
  private def commit(s: SparkSession, docs: DataFrame, dir: String,
                     version: Long, opCol: Option[String] = None): Unit = {
    val sign = opCol match {
      case Some(op) => when(col(op) === "d", lit(-1L)).otherwise(lit(1L))
      case None     => lit(1L)
    }
    val ops = docs.select(col("doc_id"), sign.as("_sign"))
    val p = postings(docs.select(col("doc_id"), col("text")))
      .join(ops, "doc_id")
      .withColumn("_op", when(col("_sign") < 0, lit("d")).otherwise(lit("u")))
      .drop("_sign")
    SnapshotStore.upsertVersion(s, p, key = "pkey",
      seqCol = None, dir = dir, version = version,
      opCol = Some("_op"), bucketCol = Some("shard"),
      numBuckets = Some(shards))
    val prev = SnapshotStore.read(s, statsDir(dir)).getOrElse(
      s.range(0).select(lit("").as("stat"), lit(0L).as("value")))
    val prevW = prev.groupBy().pivot("stat", Seq("n", "tot")).sum("value")
      .select(coalesce(col("n"), lit(0L)).as("pn"),
        coalesce(col("tot"), lit(0L)).as("ptot"))
    // left join: a token-less doc still counts toward n (dl = 0)
    val dls = tokens(docs.select(col("doc_id"), col("text")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val delta = ops.join(dls, Seq("doc_id"), "left")
      .agg(coalesce(sum(col("_sign")), lit(0L)).as("n"),
        coalesce(sum(col("_sign") * coalesce(col("dl"), lit(0L))),
          lit(0L)).as("tot"))
    val next = delta.crossJoin(broadcast(prevW))
      .select(explode(map(
        lit("n"), col("pn") + col("n"),
        lit("tot"), col("ptot") + col("tot"))).as(Seq("stat", "value")))
    SnapshotStore.upsertVersion(s, next, key = "stat", seqCol = None,
      dir = statsDir(dir), version = version, numBuckets = Some(1))
  }

  /** Create the index from a base corpus (version 0). */
  def build(s: SparkSession, docs: DataFrame, dir: String): Unit =
    commit(s, docs, dir, 0L)

  /** Incrementally index a batch of new documents. */
  def ingest(s: SparkSession, docs: DataFrame, dir: String): Unit =
    commit(s, docs, dir,
      SnapshotStore.latestTxn(s, dir).map(_ + 1).getOrElse(0L))

  /** Remove documents from the index. `docs` must carry each doc's
    * LAST-INDEXED text (delete-by-reindex): its postings tombstone out
    * of their shards and the stats sidecar decrements — the index
    * converges to what a fresh build without those docs produces.
    * To UPDATE a changed doc: `remove` the old text, `ingest` the new.
    */
  def remove(s: SparkSession, docs: DataFrame, dir: String): Unit = {
    val tagged = docs.withColumn("_docop", lit("d"))
    commit(s, tagged, dir,
      SnapshotStore.latestTxn(s, dir).map(_ + 1).getOrElse(0L),
      opCol = Some("_docop"))
  }

  /** `commit` with an explicit version — the exactly-once seam for the
    * streaming maintainer (version = batchId + 1; replays no-op).
    */
  private[graft] def commitVersion(s: SparkSession, docs: DataFrame,
                                   dir: String, version: Long,
                                   opCol: Option[String]): Unit =
    commit(s, docs, dir, version, opCol)

  /** BM25 top-`limit` docs for `terms`, reading ONLY the terms' shard
    * dirs. Scoring is `text_bm25`'s integer-cleared exact formulation
    * (k1 = 6/5, b = 3/4): per-term scores pivot to fixed columns summed
    * in the caller's term order, so the fold order — and the IEEE
    * result — is deterministic on any engine.
    */
  def probe(s: SparkSession, dir: String, terms: Seq[String],
            limit: Int = 20): DataFrame = {
    require(terms.nonEmpty, "probe needs at least one term")
    // route terms through the writer's own shard expression (1-row
    // local eval per term — driver metadata, no data touched)
    import s.implicits._
    val shardIds = terms.toDF("term")
      .select(pmod(hash(col("term")), lit(shards)))
      .collect().map(_.getInt(0)).toSet
    val posts = SnapshotStore.readBuckets(s, dir, shardIds)
      .getOrElse(sys.error(s"no committed index at $dir"))
      .filter(col("term").isin(terms: _*))
    val stats = SnapshotStore.read(s, statsDir(dir))
      .getOrElse(sys.error(s"no committed stats at ${statsDir(dir)}"))
      .groupBy().pivot("stat", Seq("n", "tot")).sum("value")
    val dfq = posts.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val score =
      (lit(44L) * col("tf") * col("n") * col("tot")).cast("double") /
        (col("df") * (lit(20L) * col("tf") * col("tot") +
          lit(6L) * col("tot") +
          lit(18L) * col("dl") * col("n"))).cast("double")
    val scored = posts.join(dfq, "term")
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
    def termCol(t: String) = coalesce(
      max(when(col("term") === t, col("score"))), lit(0.0))
    val pivoted = scored.groupBy(col("doc_id"))
      .agg(termCol(terms.head).as(s"s_${terms.head}"),
        terms.tail.map(t => termCol(t).as(s"s_$t")): _*)
    pivoted
      .withColumn("bm25",
        terms.map(t => col(s"s_$t")).reduceLeft(_ + _))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(limit)
  }

  override def queries: Seq[GraftQuery] = Seq(

    // ───── persistent inverted index: build → ingest → BM25 probe ─────
    GraftQuery(
      "text_search_index",
      (s, d) => {
        val dir = Sources.scratch(d, "searchidx_")
        new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(new Path(dir), true)
        val docs = Tables.documents(s, d)
        build(s, docs.filter(pmod(col("doc_id"), lit(4)) =!= 3), dir)
        ingest(s, docs.filter(pmod(col("doc_id"), lit(4)) === 3), dir)
        probe(s, dir, Seq("join", "filter", "group"))
      },
      // full-corpus BM25 (shared statement with text_bm25): the index
      // must answer exactly what direct scoring answers
      Some("""
        WITH t1 AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
            FROM documents) u
          WHERE tok <> ''),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM t1
          WHERE tok IN ('join', 'filter', 'group')
          GROUP BY doc_id, tok),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM t1 GROUP BY doc_id),
        tot AS (SELECT COUNT(*) AS tot FROM t1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        scored AS (
          SELECT f.doc_id, f.tok,
                 (44 * f.tf * n.n * tot.tot)::DOUBLE /
                   (d.df * (20 * f.tf * tot.tot + 6 * tot.tot
                     + 18 * l.dl * n.n))::DOUBLE AS score
          FROM tf f JOIN dfq d USING (tok) JOIN dl l USING (doc_id)
          CROSS JOIN n CROSS JOIN tot),
        piv AS (
          SELECT doc_id,
                 COALESCE(MAX(CASE WHEN tok = 'join' THEN score END), 0.0)
                   AS s_join,
                 COALESCE(MAX(CASE WHEN tok = 'filter' THEN score END), 0.0)
                   AS s_filter,
                 COALESCE(MAX(CASE WHEN tok = 'group' THEN score END), 0.0)
                   AS s_group
          FROM scored GROUP BY doc_id)
        SELECT doc_id, s_join, s_filter, s_group,
               s_join + s_filter + s_group AS bm25
        FROM piv
        ORDER BY bm25 DESC, doc_id ASC LIMIT 20
      """)),

    // ───── chunk-level retrieval: the RAG index under the hash gate ─────
    // The full retrieval composition — docs → 32/24 chunk windows
    // (Selection.chunked, the SAME expression tree the streaming
    // splitter runs) → inverted index keyed by chunk → BM25 probe —
    // value-pinned end to end: the oracle is the direct BM25 statement
    // over the chunk SET derived in SQL, so index build + probe must
    // answer exactly what direct chunk scoring answers. Chunk-level
    // stats (N = chunks, dl = chunk length) change every BM25 term vs
    // the doc-level index, so this is a distinct semantics, not a rerun.
    // Scale shape identical to text_search_index: the (chunk, term)
    // shuffle is the linear build cost; probes read ≤ |query terms|
    // term shards at any corpus size.
    GraftQuery(
      "text_search_chunks",
      (s, d) => {
        val dir = Sources.scratch(d, "chunkidx_")
        new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(new Path(dir), true)
        val chunks = graft.ops.Selection.chunked(
            Tables.documents(s, d).select(col("doc_id"), col("text")))
          .select((col("doc_id") * lit(1000000L) + col("chunk_id")).as("doc_id"),
            col("chunk_text").as("text"))
        build(s, chunks, dir)
        probe(s, dir, Seq("join", "filter", "group"))
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n
          FROM documents),
        chunks AS (
          SELECT doc_id * 1000000 + k AS doc_id,
                 array_to_string(toks[k * ${Selection.ChunkS} + 1 : k * ${Selection.ChunkS} + ${Selection.ChunkW}], ' ') AS text
          FROM (
            SELECT doc_id, toks, n,
                   UNNEST(generate_series(0, CASE WHEN n <= ${Selection.ChunkW} THEN 0
                     ELSE (n - ${Selection.ChunkW} + ${Selection.ChunkS - 1}) // ${Selection.ChunkS} END)) AS k
            FROM base) c),
        t1 AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
            FROM chunks) u
          WHERE tok <> ''),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM t1
          WHERE tok IN ('join', 'filter', 'group')
          GROUP BY doc_id, tok),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM t1 GROUP BY doc_id),
        tot AS (SELECT COUNT(*) AS tot FROM t1),
        n AS (SELECT COUNT(*) AS n FROM chunks),
        dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        scored AS (
          SELECT f.doc_id, f.tok,
                 (44 * f.tf * n.n * tot.tot)::DOUBLE /
                   (d.df * (20 * f.tf * tot.tot + 6 * tot.tot
                     + 18 * l.dl * n.n))::DOUBLE AS score
          FROM tf f JOIN dfq d USING (tok) JOIN dl l USING (doc_id)
          CROSS JOIN n CROSS JOIN tot),
        piv AS (
          SELECT doc_id,
                 COALESCE(MAX(CASE WHEN tok = 'join' THEN score END), 0.0)
                   AS s_join,
                 COALESCE(MAX(CASE WHEN tok = 'filter' THEN score END), 0.0)
                   AS s_filter,
                 COALESCE(MAX(CASE WHEN tok = 'group' THEN score END), 0.0)
                   AS s_group
          FROM scored GROUP BY doc_id)
        SELECT doc_id, s_join, s_filter, s_group,
               s_join + s_filter + s_group AS bm25
        FROM piv
        ORDER BY bm25 DESC, doc_id ASC LIMIT 20
      """))
  )
}
