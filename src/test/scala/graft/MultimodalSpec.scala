package graft

import graft.ops.{MediaAsset, Multimodal}

/** Binary-column plumbing: schema, batch shape, and stub-decode
  * determinism for the multimodal surface.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("assets preserve payload bytes and assign modality by doc_id") {
    val a = Multimodal.assets(spark, sfTiny)
    val first = a.filter(_.doc_id == 0L).head()
    assert(first.modality === "image")
    assert(first.mime === "image/png")
    // payload round-trips: binary content is the utf-8 text
    val doc0 = Tables.documents(spark, sfTiny)
      .filter($"doc_id" === 0L).select("text").as[String].head()
    assert(new String(first.content, "UTF-8") === doc0)
  }

  test("decodeFeatures processes partitions larger than one batch") {
    // 500 docs ≫ batch size 64: every row must come through exactly once
    val feats = Multimodal.decodeFeatures(Multimodal.assets(spark, sfTiny))
    assert(feats.count() === 500)
    assert(feats.select("doc_id").distinct().count() === 500)
  }

  test("stub decode is deterministic and modality-consistent") {
    val ds = Seq(
      MediaAsset(0L, "image", "image/png", "abc".getBytes("UTF-8")),
      MediaAsset(1L, "audio", "audio/wav", "defg".getBytes("UTF-8")),
      MediaAsset(2L, "video", "video/mp4", "hijkl".getBytes("UTF-8"))
    ).toDS()
    val f = Multimodal.decodeFeatures(ds).collect().map(x => x.doc_id -> x).toMap
    assert(f(0L).width === 16L + 3 % 640)
    assert(f(0L).height === 16L + 'a'.toLong % 480)
    assert(f(0L).n_frames === 1L && f(0L).sample_rate === 0L)
    assert(f(1L).sample_rate === 8000L + 100L * ('d'.toLong % 80))
    assert(f(1L).width === 0L)
    assert(f(2L).n_frames === 1L + 5 % 24)
  }
}
