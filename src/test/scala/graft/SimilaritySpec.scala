package graft

import org.apache.spark.sql.functions._

/** Similarity-search tests on a crafted embeddings fixture with known
  * geometry: orthogonal basis directions plus one planted near-duplicate
  * of vector 0, so exact answers are hand-checkable and LSH behavior is
  * deterministic (md5 hyperplanes).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def unit(axis: Int, eps: Double = 0.0): Array[Float] = {
    val v = Array.fill(dim)(0.0f)
    v(axis) = 1.0f
    if (eps != 0.0) v((axis + 1) % dim) = eps.toFloat
    v
  }

  private lazy val dir = {
    val d = scratchDir("sim")
    val rnd = new scala.util.Random(7)
    def noisy(axis: Int): Array[Float] = {
      val v = Array.tabulate(dim)(_ => (rnd.nextDouble() * 0.05).toFloat)
      v(axis) = 1.0f
      v
    }
    val vecs = Seq(
      (0L, unit(0), 0),
      (1L, unit(0, eps = 0.02), 0), // near-duplicate of 0 (cos ≈ 0.9998)
      (2L, unit(1), 0),
      (3L, unit(2), 1),
      (4L, noisy(3), 1),
      (5L, noisy(4), 1),
      (6L, unit(5), 2),
      (7L, noisy(5), 2)
    ).toDF("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("sim_topk_cosine: planted near-dup of the query vector ranks first") {
    val top = SparkEntry.queries("sim_topk_cosine")(spark, dir).collect()
    assert(top.head.getAs[Long]("vec_id") === 1L)
    assert(top.head.getAs[Double]("cosine") > 0.999)
  }

  test("sim_range_search: exactly the rows within tau, bit-equal cosines") {
    val got = SparkEntry.queries("sim_range_search")(spark, sfTiny)
      .select($"q_id", $"vec_id", $"cosine")
      .as[(Long, Long, Double)].collect().toSeq
    val e = Tables.embeddings(spark, sfTiny)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    val nrm = e.map { case (k, v) => k -> math.sqrt(dot(v, v)) }
    val expect = (for {
      q <- e.keys.filter(_ < 3).toSeq
      v <- e.keys.filter(_ >= 3).toSeq
      c = dot(e(q), e(v)) / (nrm(q) * nrm(v))
      if c >= 0.2
    } yield (q, v, c)).sortBy(t => (t._1, t._2))
    assert(got === expect)
    assert(got.nonEmpty, "threshold admits at least one neighbor")
  }

  test("sim_ann_range_index: subset of brute-force range with bit-equal " +
      "cosines; planted near-dup surfaces from its own cell") {
    val pruned = SparkEntry.queries("sim_ann_range_index")(spark, sfTiny)
      .select($"vec_id", $"match_id", $"cosine")
      .as[(Long, Long, Double)].collect().toSeq
    val brute = SparkEntry.queries("sim_range_search")(spark, sfTiny)
      .select($"q_id", $"vec_id", $"cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    assert(pruned.nonEmpty, "threshold admits at least one in-cell match")
    pruned.foreach { case (q, m, c) =>
      assert(c >= 0.2)
      // pruning only DROPS candidates (other cells); whatever survives
      // must carry the exact brute-force cosine... except matches the
      // brute query EXCLUDES by its corpus filter (vec_id >= 3): the
      // index probes the full corpus, so query-to-query matches are
      // legitimately extra
      if (m >= 3) {
        assert(brute.contains((q, m)), s"($q,$m) not in brute-force range")
        assert(brute((q, m)) == c, s"cosine drift for ($q,$m)")
      }
    }
    // the planted fixture pairs a near-dup with query 0: at K=2 (the
    // K ≥ n degenerate regime pinned away, as in the sim_ann_ivf test)
    // they share the argmax centroid, so the pruned range MUST surface it
    spark.conf.set("spark.graft.ann.ivfCells", "2")
    try {
      val planted = SparkEntry.queries("sim_ann_range_index")(spark, dir)
        .select($"vec_id", $"match_id", $"cosine")
        .as[(Long, Long, Double)].collect()
      assert(planted.exists { case (q, m, c) =>
        q == 0L && m == 1L && c > 0.999 })
    } finally spark.conf.unset("spark.graft.ann.ivfCells")
  }

  test("sim_matryoshka_topk: re-ranked cosines are EXACT full-dim cosines, order is brute-force order on survivors") {
    val brute = SparkEntry.queries("sim_topk_cosine")(spark, sfTiny)
      .select($"vec_id", $"cosine").as[(Long, Double)].collect().toMap
    val mat = SparkEntry.queries("sim_matryoshka_topk")(spark, sfTiny)
      .select($"vec_id", $"cosine").as[(Long, Double)].collect()
    assert(mat.length == 10)
    // stage 2 is the same full-dimension fold as the brute-force query:
    // any id both return must carry the bit-identical cosine
    mat.foreach { case (id, c) =>
      brute.get(id).foreach(b => assert(b == c, s"vec $id: $b != $c")) }
    // descending, deterministic tiebreak already pinned by the oracle
    val cs = mat.map(_._2)
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    // on RANDOM vectors a 16-dim prefix is a lossy retriever (that's
    // the MRL trade), so top-1 preservation is asserted on the planted
    // fixture instead, where the near-dup shares the prefix: the
    // cascade must surface it first, exactly like brute force
    val fixtureTop = SparkEntry.queries("sim_matryoshka_topk")(spark, dir)
      .select($"vec_id", $"cosine").as[(Long, Double)].collect()
    assert(fixtureTop.head._1 == 1L && fixtureTop.head._2 > 0.999)
  }

  test("sim_knn_per_label: neighbors stay inside the label block") {
    val rows = SparkEntry.queries("sim_knn_per_label")(spark, dir)
      .select("vec_id", "nn_id").as[(Long, Long)].collect()
    val label = Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1,
      6L -> 2, 7L -> 2)
    rows.foreach { case (v, n) => assert(label(v) === label(n)) }
    // within label 0, the mutual near-dups pick each other first
    val first = SparkEntry.queries("sim_knn_per_label")(spark, dir)
      .filter(col("rnk") === 1).select("vec_id", "nn_id")
      .as[(Long, Long)].collect().toMap
    assert(first(0L) === 1L)
    assert(first(1L) === 0L)
  }

  test("literal LSH sign matrix matches Spark-side md5 parity cell-by-cell") {
    // the hyperplane matrix is precomputed driver-side (ops.Similarity
    // .lshSign) and embedded as literals; every cell must equal what the
    // round-2 per-row SQL expression computed from md5
    val fromSql = spark.sql("""
      SELECT j, i,
             CASE WHEN substring(md5(concat(cast(j AS string), '|', cast(i AS string))), 1, 1) >= '8'
                  THEN 1.0D ELSE -1.0D END AS s
      FROM (SELECT explode(sequence(0, 15)) AS j)
      LATERAL VIEW explode(sequence(0, 63)) t AS i""")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (j <- 0 until 16; i <- 0 until 64)
      assert(ops.Similarity.lshSign(j, i) === fromSql((j, i)), s"cell ($j, $i)")
  }

  test("sim_ann_lsh: near-identical vectors land in the same buckets") {
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, dir)
      .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
    // cos(v0, v1) ≈ 1 ⇒ all 16 sign bits agree ⇒ all 4 bands collide
    assert(ann.get(0L).contains(1L))
    assert(ann.get(1L).contains(0L))
  }

  test("sim_ann_lsh recall@1 vs brute force on driver testdata") {
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, sfTiny)
      .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
    // brute-force exact NN for the same vectors
    val e = Tables.embeddings(spark, sfTiny).select(
      col("vec_id"), col("embedding"),
      expr("""sqrt(aggregate(transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
              CAST(0 AS DOUBLE), (acc, v) -> acc + v))""").as("nrm"))
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nrm").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("va")).orderBy(col("cos").desc, col("vb").asc)
    val exact = a.join(b, col("va") =!= col("vb"))
      .select(col("va"), col("vb"),
        (expr("""aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                 CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
          / (col("na") * col("nb"))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("va", "vb").as[(Long, Long)].collect().toMap
    val hits = exact.count { case (v, nn) => ann.get(v).contains(nn) }
    val recall = hits.toDouble / exact.size
    // random 64-d vectors, 4 bands × 4 bits ⇒ analytic recall ≈ 0.6;
    // deterministic here (md5 hyperplanes), bound it loosely
    assert(recall > 0.35, s"recall@1 degraded: $recall")
  }

  test("sim_ann_ivf: near-dups share a cell and pick each other") {
    // K=16 on an 8-vector fixture would make every vector its own seed
    // (self-cosine 1.0 ⇒ all cells singleton ⇒ empty result): the
    // degenerate K ≥ n regime. Pin K=2 so cells actually group.
    spark.conf.set("spark.graft.ann.ivfCells", "2")
    try {
      val ann = SparkEntry.queries("sim_ann_ivf")(spark, dir)
        .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
      // cos(v0, v1) ≈ 0.9998 ⇒ same argmax seed ⇒ same cell ⇒ mutual NN
      assert(ann.get(0L).contains(1L))
      assert(ann.get(1L).contains(0L))
    } finally spark.conf.unset("spark.graft.ann.ivfCells")
  }

  test("sim_ann_ivf recall@1 vs brute force on driver testdata") {
    val ann = SparkEntry.queries("sim_ann_ivf")(spark, sfTiny)
      .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
    val exact = bruteForceNN(sfTiny)
    val hits = exact.count { case (v, nn) => ann.get(v).contains(nn) }
    val recall = hits.toDouble / exact.size
    // single-probe IVF: recall = P(query and its NN share a nearest
    // seed). Near-dup pairs (cos ≈ 1) essentially always do; random
    // pairs land together ~1/K. The driver corpus mixes both, so bound
    // loosely and record the measured value in the failure message.
    assert(recall > 0.2, s"recall@1 degraded: $recall")
  }

  test("sim_ann_ivf multiprobe: nprobe=2 recall >= single-probe recall") {
    val exact = bruteForceNN(sfTiny)
    def recall(): Double = {
      val ann = SparkEntry.queries("sim_ann_ivf")(spark, sfTiny)
        .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
      exact.count { case (v, nn) => ann.get(v).contains(nn) }.toDouble / exact.size
    }
    val single = recall()
    spark.conf.set("spark.graft.ann.nprobe", "2")
    try {
      val multi = recall()
      // probing a second cell can only ADD candidates for the query side
      assert(multi >= single,
        s"nprobe=2 recall $multi must not regress single-probe $single")
    } finally spark.conf.unset("spark.graft.ann.nprobe")
  }

  test("sim_ann_ivf learned k-means centroids beat the seed quantizer's recall") {
    val exact = bruteForceNN(sfTiny)
    def recall(): Double = {
      val ann = SparkEntry.queries("sim_ann_ivf")(spark, sfTiny)
        .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
      exact.count { case (v, nn) => ann.get(v).contains(nn) }.toDouble / exact.size
    }
    val seed = recall()
    spark.conf.set("spark.graft.ann.ivfKmeansIters", "5")
    try {
      val learned = recall()
      info(f"recall@1 seed=$seed%.3f kmeans(5)=$learned%.3f (nprobe=1, K=16)")
      // same K, same nprobe, same init vectors: Lloyd's rounds move the
      // codebook toward the data's actual cluster structure, so the
      // query and its true NN co-locate strictly more often
      assert(learned > seed,
        s"k-means recall $learned must strictly beat seed quantizer $seed")
    } finally spark.conf.unset("spark.graft.ann.ivfKmeansIters")
  }

  test("sim_ann_ivf cell cap bounds candidate volume on a skewed corpus") {
    // one dominant cluster: 40 vectors all within noise of axis 0, so
    // (near-)all of them collapse into the same IVF cell — the skew that
    // would reintroduce the Σ cell² blowup. With ivfCellCap=8 the corpus
    // side of the cell join keeps only the 8 lowest vec_ids per cell, so
    // across K=2 cells at most 16 distinct vectors can EVER be returned
    // as a neighbor — while the uncapped query side still answers for
    // every vector.
    val d = scratchDir("sim_skew")
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map { i =>
      val v = Array.tabulate(dim)(_ => (rnd.nextDouble() * 0.01).toFloat)
      v(0) = 1.0f
      (i, v, 0)
    }.toDF("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    spark.conf.set("spark.graft.ann.ivfCells", "2")
    try {
      // uncapped baseline (default cap 2048 cannot bind on 40 rows):
      // neighbors spread well beyond any 16-vector subset
      val free = SparkEntry.queries("sim_ann_ivf")(spark, d)
        .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
      assert(free.size === 40)
      assert(free.values.toSet.size > 16,
        s"premise: uncapped neighbors spread wide, got ${free.values.toSet.size}")

      spark.conf.set("spark.graft.ann.ivfCellCap", "8")
      val capped = SparkEntry.queries("sim_ann_ivf")(spark, d)
        .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
      // query side uncapped: every vector still gets its top-1 …
      assert(capped.size === 40)
      // … but the searchable corpus is ≤ cap × cells vectors
      assert(capped.values.toSet.size <= 16,
        s"cell cap must bound the corpus side, got ${capped.values.toSet.size} distinct neighbors")
    } finally {
      spark.conf.unset("spark.graft.ann.ivfCells")
      spark.conf.unset("spark.graft.ann.ivfCellCap")
    }
  }

  /** Exact top-1 neighbor per vector (brute force) for recall baselines. */
  private def bruteForceNN(d: String): Map[Long, Long] = {
    val e = Tables.embeddings(spark, d).select(
      col("vec_id"), col("embedding"),
      expr("""sqrt(aggregate(transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
              CAST(0 AS DOUBLE), (acc, v) -> acc + v))""").as("nrm"))
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nrm").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("va")).orderBy(col("cos").desc, col("vb").asc)
    a.join(b, col("va") =!= col("vb"))
      .select(col("va"), col("vb"),
        (expr("""aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                 CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
          / (col("na") * col("nb"))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("va", "vb").as[(Long, Long)].collect().toMap
  }

  test("sim_ann_ivf ivfCellCap=auto derives from occupancy and stays exact here") {
    def ann() = SparkEntry.queries("sim_ann_ivf")(spark, dir)
      .select("vec_id", "ann_id").as[(Long, Long)].collect().toSet
    val dflt = ann()
    try {
      // the fixture's 8 vectors spread over K=16 cells: p99 occupancy is
      // single digits, so 2×p99 comfortably exceeds every real cell —
      // auto must reproduce the default-path result exactly
      spark.conf.set("spark.graft.ann.ivfCellCap", "auto")
      assert(ann() === dflt)
    } finally spark.conf.unset("spark.graft.ann.ivfCellCap")
  }

  test("sim_ann_recall_gate md5-slice: sliced queries, full corpus, gate intact") {
    def run() = SparkEntry.queries("sim_ann_recall_gate")(spark, sfTiny)
      .select("nprobe", "n_queries", "seed_hits")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    val full = run()
    val total = Tables.embeddings(spark, sfTiny).count()
    assert(full.forall(_._2 == total), "default gate counts every query")
    val m = 4L
    val sliceCount = Tables.embeddings(spark, sfTiny)
      .filter(ops.EvalSampling.inSlice(col("vec_id"), m)).count()
    assert(sliceCount > 0 && sliceCount < total,
      s"fixture slice must be proper, got $sliceCount of $total")
    spark.conf.set("spark.graft.eval.sampleMod", m.toString)
    try {
      val sliced = run()
      assert(sliced.map(_._1) === full.map(_._1), "same nprobe rows")
      assert(sliced.forall(_._2 == sliceCount),
        "n_queries is exactly the md5 slice")
      // the slice restricts the query set without touching the corpus or
      // quantizer, so per-query recall is the full run's — sliced hits
      // are a subset sum: bounded by the slice size and by the full hits
      sliced.zip(full).foreach { case (sr, fr) =>
        assert(sr._3 <= sliceCount && sr._3 <= fr._3)
      }
    } finally spark.conf.unset("spark.graft.eval.sampleMod")
    spark.conf.set("spark.graft.eval.sampleMod", "1")
    try assert(run() === full, "m = 1 is the identity")
    finally spark.conf.unset("spark.graft.eval.sampleMod")
  }

  test("sim_ann_pq: planted near-dup survives quantization and ranks first") {
    // crafted fixture: vector 1 is a near-duplicate of query vector 0
    // (cos ≈ 0.9998). With ≤16 corpus vectors every sub-slice is its own
    // codebook entry, so encoding is lossless and ADC must surface the
    // near-dup; the exact re-rank then puts it at rnk 1. This pins the
    // whole encode → lookup-table → ADC → refine machinery
    // deterministically (16-entry seed codebooks on the random driver
    // corpus are honestly too coarse for a guaranteed-recall claim —
    // production PQ trains k-means codebooks and runs inside IVF cells).
    val pq = SparkEntry.queries("sim_ann_pq")(spark, dir)
      .select(col("vec_id"), col("rnk")).as[(Long, Int)].collect().toMap
    assert(pq(1L) == 1, s"near-dup of the query must re-rank first: $pq")
  }

  test("sim_ann_pq: exact re-rank orders the ADC candidates by true cosine") {
    val rows = SparkEntry.queries("sim_ann_pq")(spark, sfTiny)
      .select(col("rnk"), col("cosine")).as[(Int, Double)].collect()
      .sortBy(_._1)
    assert(rows.length == 10)
    assert(rows.map(_._1).toSeq == (1 to 10),
      "rnk must be the dense 1..10 of the re-rank")
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq,
      "cosine must be non-increasing in rnk")
  }

  test("sim_mmr_diversify: exact greedy replay over the candidate pool") {
    // Recompute the unrolled greedy in plain Scala from the same
    // top-20 candidate pool and pairwise cosines, and require the
    // operator's 5 picks to match POSITION BY POSITION — the full MMR
    // recurrence (λ·rel − (1−λ)·max-sim-to-selected, ties to lower id),
    // not just set equality.
    val got = SparkEntry.queries("sim_mmr_diversify")(spark, sfTiny)
      .select(col("pos"), col("vec_id"), col("rel"))
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got.length == 5 && got.map(_._1).toSeq == (1 to 5))

    val e = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def cos(a: Long, b: Long): Double =
      dot(e(a), e(b)) / (math.sqrt(dot(e(a), e(a))) * math.sqrt(dot(e(b), e(b))))
    val cand = e.keys.filter(_ != 0L).map(v => v -> cos(0L, v)).toSeq
      .sortBy { case (v, r) => (-r, v) }.take(20)
    var sel = List(cand.head._1)
    for (_ <- 2 to 5) {
      val pick = cand.filterNot { case (v, _) => sel.contains(v) }
        .map { case (v, r) =>
          (v, 0.5 * r - 0.5 * sel.map(s => cos(v, s)).max)
        }
        .minBy { case (v, m) => (-m, v) }._1
      sel = sel :+ pick
    }
    assert(got.map(_._2).toSeq === sel,
      s"operator picks ${got.map(_._2).toSeq} != greedy replay $sel")
    // pos 1 is the plain top-1; later picks trade relevance for
    // diversity, so rel need not be monotone — but all must come from
    // the candidate pool
    assert(got.head._2 === cand.head._1)
    assert(got.map(_._2).toSet.subsetOf(cand.map(_._1).toSet))
  }
}
