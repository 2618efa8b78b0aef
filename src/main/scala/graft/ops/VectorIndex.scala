package graft.ops

import graft.{GraftQuery, QueryModule, Tables}
import graft.pipeline.{SnapshotStore, Sources}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF vector index — the "vector database on a lake" shape
  * (SURVEY.md §2.8 similarity-search scale path, productionized).
  *
  * `sim_ann_ivf` rebuilds its inverted file on every query; a serving
  * corpus can't. This module makes the IVF structure a TABLE:
  *
  *  - the coarse quantizer (K md5-ordered seed vectors, exactly
  *    `sim_ann_ivf`'s oracle-pinned default, dense-numbered 0..K-1) is
  *    FROZEN at build time into `dir/_centroids` — assignment is a pure
  *    function of (embedding, centroids), so every writer and reader
  *    agrees on placement forever;
  *  - vector rows live in a `SnapshotStore` whose bucket id IS the IVF
  *    cell (`upsertVersion(bucketCol = "cell", numBuckets = K)`):
  *    bucket dirs are posting lists, and the store's versioned manifest
  *    gives the index exactly-once incremental ingest, time travel,
  *    CDC deletes, and crash safety for free;
  *  - a query assigns its vectors to their `nprobe` nearest cells
  *    (broadcast K centroids — a narrow map) and reads ONLY those
  *    cells' bucket dirs (`SnapshotStore.readBuckets`): probe IO is
  *    nprobe/K of the index at ANY corpus size, the property that makes
  *    the structure an index rather than a scan. The only driver-side
  *    action is the ≤K-int probed-cell set (same metadata class as the
  *    store's touched-bucket collect).
  *
  * Scale shape (100 TB of embeddings): ingest is O(delta + touched
  * cells) — new vectors append to their cell's bucket, nothing else
  * moves; the in-cell exact search is bounded by the per-cell cap
  * (`Similarity.defaultIvfCellCap` — same Σ cell² skew bound as the
  * ephemeral operator, identically oracle-twinned); K scales as
  * n/targetCellSize with the same recall/nprobe tradeoff measured in
  * SCALE.md. Lloyd's-k-means centroids (`Similarity.kmeansCentroids`)
  * drop into `build(seeds = …)` unchanged — frozen thereafter, which is
  * the standard production contract (re-training the quantizer is a
  * reindex by design, never a silent drift).
  *
  * The registered query proves the WHOLE lifecycle under the value-level
  * oracle: build from a 3/4 base corpus → incrementally ingest the
  * remaining 1/4 → probe every vector for its nearest neighbor. The
  * DuckDB twin states the same math declaratively (seeds from the base
  * subset, assignment over the union), so the hash gate pins that
  * build + ingest + probe ≡ one-shot index of the final corpus.
  */
object VectorIndex extends QueryModule {

  private def centroidsDir(dir: String) = s"$dir/_centroids"

  /** Embeddings with the shared bit-stable L2 norm. */
  private def normed(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"), col("embedding"),
      expr("sqrt(vec_dot(embedding, embedding))").as("nrm"))

  /** The frozen coarse quantizer: K seed vectors in md5(vec_id) order
    * (the `sim_ann_ivf` oracle default), dense-numbered `cell` 0..K-1.
    * `sid` is retained because the assignment tie-break (equal cosine →
    * lowest sid) must match the oracle's. A learned codebook
    * (`Similarity.kmeansCentroids`) can be passed to `build` instead —
    * same schema, same downstream plans.
    */
  private[graft] def seedCentroids(vecs: DataFrame, k: Int): DataFrame =
    vecs
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id").as("sid"), col("embedding").as("semb"),
        col("nrm").as("snrm"))
      // K rows: the single-partition window is over the seed set only
      .withColumn("cell", (row_number().over(
        Window.orderBy(md5(col("sid").cast("string")).asc, col("sid").asc))
        - 1).cast("int"))

  /** Assign each vector its `nprobe` nearest cells (rank in `rn`).
    * Broadcast K centroids → narrow map: no shuffle of `vecs`; ties
    * break on lowest sid, mirroring the oracle.
    */
  private def assign(vecs: DataFrame, cents: DataFrame,
                     nprobe: Int): DataFrame = {
    val aw = Window.partitionBy(col("vec_id"))
      .orderBy(col("c").desc, col("sid").asc)
    vecs.crossJoin(broadcast(cents))
      .select(vecs.columns.map(col) :+ col("sid") :+ col("cell") :+
        (expr("vec_dot(embedding, semb)") / (col("nrm") * col("snrm")))
          .as("c"): _*)
      .withColumn("rn", row_number().over(aw))
      .filter(col("rn") <= nprobe)
      .drop("sid", "c")
  }

  /** Create the index: freeze the quantizer, commit the base corpus as
    * version 1. `seeds` defaults to the md5-ordered seed quantizer over
    * `vecs`; pass a k-means codebook for learned cells.
    */
  def build(s: SparkSession, vecs: DataFrame, dir: String, k: Int,
            seeds: Option[DataFrame] = None): Unit = {
    val cents = seeds.getOrElse(seedCentroids(vecs, k))
    cents.repartition(1).write.mode("errorifexists")
      .parquet(centroidsDir(dir))
    ingest(s, vecs, dir)
  }

  private def readCentroids(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(centroidsDir(dir))

  /** Incrementally add (or re-embed: same vec_id upserts) vectors.
    * O(delta + touched cells): assignment is a narrow broadcast map and
    * the store rewrites only the cells the delta lands in.
    */
  def ingest(s: SparkSession, vecs: DataFrame, dir: String): Unit =
    ingestVersion(s, vecs, dir,
      SnapshotStore.latestVersion(s, dir).map(_ + 1).getOrElse(0L))

  /** `ingest` with an explicit version — the exactly-once seam for a
    * streaming writer (version = batchId; replays no-op on the marker).
    */
  def ingestVersion(s: SparkSession, vecs: DataFrame, dir: String,
                    version: Long): Unit = {
    val cents = readCentroids(s, dir)
    val k = cents.count().toInt
    SnapshotStore.upsertVersion(s,
      assign(vecs, cents, nprobe = 1).drop("rn"),
      key = "vec_id", seqCol = None, dir = dir, version = version,
      bucketCol = Some("cell"), numBuckets = Some(k))
  }

  /** Nearest indexed neighbor (top-1, self excluded) for each query
    * vector: assign queries to their `nprobe` nearest cells, read ONLY
    * those cells' bucket dirs, exact-search within (corpus side capped
    * per cell — the same skew bound, rank rule, and default as
    * `sim_ann_ivf`).
    */
  def query(s: SparkSession, queries: DataFrame, dir: String,
            nprobe: Int = 1,
            cellCap: Int = Similarity.defaultIvfCellCap): DataFrame = {
    val cents = readCentroids(s, dir)
    val qa = assign(queries, cents, nprobe).drop("rn")
      .select(col("vec_id").as("va"), col("cell"),
        col("embedding").as("ea"), col("nrm").as("na"))
    // ≤K ints — metadata-class driver action, not a data collect
    val probed = qa.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    val corpus = SnapshotStore.readBuckets(s, dir, probed).getOrElse(
      sys.error(s"no committed index at $dir"))
    val b = corpus
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("vec_id").asc)))
      .filter(col("crn") <= cellCap)
      .select(col("vec_id").as("vb"), col("cell").as("cell2"),
        col("embedding").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("va"))
      .orderBy(col("cosine").desc, col("vb").asc)
    qa.join(b, col("cell") === col("cell2") && col("va") =!= col("vb"))
      .select(col("va"), col("vb"),
        (expr("vec_dot(ea, eb)") / (col("na") * col("nb"))).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("va").as("vec_id"), col("vb").as("ann_id"), col("cosine"))
      .orderBy(col("vec_id"))
  }

  override def queries: Seq[GraftQuery] = Seq(

    // ───── persistent ANN index: build → incremental ingest → probe ─────
    // Base corpus (vec_id % 4 <> 3) builds the index and freezes the
    // quantizer; the held-out quarter ingests as a later version; every
    // vector then probes for its top-1 neighbor. The oracle computes the
    // same structure declaratively: seeds from the BASE subset only
    // (frozen before the delta existed), assignment of the full corpus
    // to those seeds, capped in-cell exact search.
    GraftQuery(
      "sim_ann_index",
      (s, d) => {
        val dir = Sources.scratch(d, "annidx_")
        // versioned store: a re-run in the same JVM would collide below
        // the committed head — start fresh (cheap local scratch)
        new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(new Path(dir), true)
        val e = normed(s, d)
        val base  = e.filter(pmod(col("vec_id"), lit(4)) =!= 3)
        val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)
        // K honors the same conf knob as sim_ann_ivf so scale runs can
        // exercise the K ∝ n reindex contract; the oracle pins the
        // default and Verify refuses to run with the knob set
        val k = s.conf.get("spark.graft.ann.ivfCells", "").trim match {
          case "" => Similarity.defaultIvfCells
          case raw => raw.toIntOption.filter(_ >= 1).getOrElse(sys.error(
            s"spark.graft.ann.ivfCells must be a positive int, got '$raw'"))
        }
        build(s, base, dir, k)
        ingest(s, delta, dir)
        query(s, e, dir)
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, embedding,
                 sqrt(list_reduce(list_transform(embedding,
                   x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y)) AS nrm
          FROM embeddings),
        seeds AS (
          SELECT vec_id AS sid, embedding AS semb, nrm AS snrm
          FROM e WHERE vec_id % 4 <> 3
          ORDER BY md5(vec_id::VARCHAR) ASC, vec_id ASC
          LIMIT ${Similarity.defaultIvfCells}),
        assign AS (
          SELECT vec_id, sid AS cell FROM (
            SELECT e.vec_id, s.sid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                     (list_reduce(list_transform(generate_series(1, 64),
                        i -> e.embedding[i]::DOUBLE * s.semb[i]::DOUBLE),
                        (x, y) -> x + y) / (e.nrm * s.snrm)) DESC,
                     s.sid ASC) AS rn
            FROM e CROSS JOIN seeds s) t
          WHERE rn = 1),
        cells AS (
          SELECT e.vec_id, e.embedding, e.nrm, assign.cell
          FROM e JOIN assign ON e.vec_id = assign.vec_id),
        cells_capped AS (
          SELECT vec_id, embedding, nrm, cell FROM (
            SELECT vec_id, embedding, nrm, cell,
                   ROW_NUMBER() OVER (PARTITION BY cell
                                      ORDER BY vec_id ASC) AS crn
            FROM cells) t
          WHERE crn <= ${Similarity.defaultIvfCellCap}),
        scored AS (
          SELECT a.vec_id AS va, b.vec_id AS vb,
                 list_reduce(list_transform(generate_series(1, 64),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE),
                   (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
          FROM cells a JOIN cells_capped b
            ON a.cell = b.cell AND a.vec_id <> b.vec_id)
        SELECT va AS vec_id, vb AS ann_id, cosine FROM (
          SELECT va, vb, cosine,
                 ROW_NUMBER() OVER (PARTITION BY va
                                    ORDER BY cosine DESC, vb ASC) AS rn
          FROM scored) t
        WHERE rn = 1
        ORDER BY vec_id
      """))
  )
}
