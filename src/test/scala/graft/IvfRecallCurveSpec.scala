package graft

/** Informational pin of the IVF recall surface on the driver corpus:
  * recall@1 vs brute force across (quantizer, nprobe). Asserts only the
  * two monotonicities the operator promises — recall never decreases in
  * nprobe, and the learned codebook never loses to the seed quantizer
  * at equal nprobe — and prints the measured curve for SCALE.md.
  */
class IvfRecallCurveSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("IVF recall@1 curve: monotone in nprobe; k-means >= seeds at every nprobe") {
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

    def recall(nprobe: Int, kmIters: Int): Double = {
      if (nprobe > 1) spark.conf.set("spark.graft.ann.nprobe", nprobe.toString)
      if (kmIters > 0)
        spark.conf.set("spark.graft.ann.ivfKmeansIters", kmIters.toString)
      try {
        val ann = SparkEntry.queries("sim_ann_ivf")(spark, sfTiny)
          .select("vec_id", "ann_id").as[(Long, Long)].collect().toMap
        exact.count { case (v, nn) => ann.get(v).contains(nn) }.toDouble / exact.size
      } finally {
        spark.conf.unset("spark.graft.ann.nprobe")
        spark.conf.unset("spark.graft.ann.ivfKmeansIters")
      }
    }

    val probes = Seq(1, 2, 4)
    val seed    = probes.map(p => recall(p, 0))
    val learned = probes.map(p => recall(p, 5))
    info(probes.indices.map(i =>
      f"nprobe=${probes(i)}: seed=${seed(i)}%.3f kmeans(5)=${learned(i)}%.3f")
      .mkString("; "))
    probes.indices.tail.foreach { i =>
      assert(seed(i) >= seed(i - 1), s"seed recall not monotone at ${probes(i)}")
      assert(learned(i) >= learned(i - 1),
        s"k-means recall not monotone at ${probes(i)}")
    }
    probes.indices.foreach { i =>
      assert(learned(i) >= seed(i),
        s"k-means recall below seed at nprobe=${probes(i)}")
    }
  }
}
