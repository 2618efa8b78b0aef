package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.SnapshotStore
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Versioned-snapshot semantics: exactly-once upserts from an
  * at-least-once stream, crash-orphan invisibility, retention pruning,
  * and stream-static enrichment.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val csvSchema = StructType(Seq(
    StructField("k", LongType), StructField("seq", LongType),
    StructField("v", StringType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      ("k,seq,v" +: rows).mkString("\n").getBytes("UTF-8"))

  private def snapshot(dir: String): Map[Long, (Long, String)] =
    SnapshotStore.read(spark, dir).get
      .select("k", "seq", "v").as[(Long, Long, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("streaming upsert maintains an exactly-once keyed snapshot") {
    val landing = scratchDir("snap_landing")
    val snap    = scratchDir("snap_store") + "/tbl"
    val ckpt    = scratchDir("snap_ckpt") + "/cp"
    def run(): Unit = StreamingPipeline.runIncrementalUpsert(
      spark,
      spark.readStream.option("header", "true").schema(csvSchema)
        .csv(s"$landing/*.csv"),
      key = "k", seqCol = Some("seq"), snap, ckpt).awaitTermination()

    // batch 0: two keys; key 2 appears twice — highest seq wins
    writeCsv(landing, "b1.csv", Seq("1,1,a", "2,1,b", "2,2,b2"))
    run()
    assert(SnapshotStore.latestVersion(spark, snap).contains(0L))
    assert(snapshot(snap) == Map(1L -> (1L, "a"), 2L -> (2L, "b2")))

    // batch 1: update key 2, insert key 4; key 1 untouched
    writeCsv(landing, "b2.csv", Seq("2,3,b3", "4,1,d"))
    run()
    assert(SnapshotStore.latestVersion(spark, snap).contains(1L))
    assert(snapshot(snap) ==
      Map(1L -> (1L, "a"), 2L -> (3L, "b3"), 4L -> (1L, "d")))

    // replayed batch (same version): must be a no-op, even with junk
    SnapshotStore.upsertVersion(spark,
      Seq((2L, 9L, "JUNK")).toDF("k", "seq", "v"), "k", Some("seq"),
      snap, version = 1L)
    assert(snapshot(snap)(2L) == (3L, "b3"))

    // restart with no new files: checkpoint replays nothing
    run()
    assert(SnapshotStore.latestVersion(spark, snap).contains(1L))
  }

  test("streaming SCD-2 history: change detection, chaining, replay no-op") {
    val landing = scratchDir("scd2_landing")
    val snap    = scratchDir("scd2_store") + "/dim"
    val ckpt    = scratchDir("scd2_ckpt") + "/cp"
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("seg", StringType),
      StructField("bal", DoubleType)))
    def writeDim(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(landing, name),
        ("k,seg,bal" +: rows).mkString("\n").getBytes("UTF-8"))
    def run(): Unit = StreamingPipeline.runScd2History(
      spark,
      spark.readStream.option("header", "true").schema(schema)
        .csv(s"$landing/*.csv"),
      key = "k", attrs = Seq("seg", "bal"), snap, ckpt).awaitTermination()
    def history: Seq[(Long, String, Long, Option[Long], Boolean)] =
      SnapshotStore.read(spark, snap).get
        .select("k", "seg", "valid_from", "valid_to", "is_current")
        .as[(Long, String, Long, Option[Long], Boolean)]
        .collect().toSeq.sortBy(r => (r._1, r._3))

    // batch 0 opens the dimension; key 3 arrives twice — the max-struct
    // compaction must pick one deterministic image, not two versions
    writeDim("b1.csv", Seq("1,x,10.0", "2,y,20.0", "3,a,1.0", "3,b,2.0"))
    run()
    assert(SnapshotStore.latestVersion(spark, snap).contains(0L))
    assert(history == Seq(
      (1L, "x", 0L, None, true), (2L, "y", 0L, None, true),
      (3L, "b", 0L, None, true)))

    // batch 1: key 1 changes (close + reopen), key 2 re-sent verbatim
    // (must NOT version), key 9 is new
    writeDim("b2.csv", Seq("1,x2,10.0", "2,y,20.0", "9,n,1.0"))
    run()
    assert(SnapshotStore.latestVersion(spark, snap).contains(1L))
    assert(history == Seq(
      (1L, "x", 0L, Some(1L), false), (1L, "x2", 1L, None, true),
      (2L, "y", 0L, None, true), (3L, "b", 0L, None, true),
      (9L, "n", 1L, None, true)))

    // restart with no new files: checkpoint replays nothing
    run()
    assert(SnapshotStore.latestVersion(spark, snap).contains(1L))
    assert(history.size == 5)
  }

  test("maintainJoin tracks a full recompute through churn on EITHER side") {
    val root = scratchDir("snap_joinview")
    val aDir = s"$root/facts"; val bDir = s"$root/dim"
    // facts keyed by ok, joined to dim on ck (= dim's OWN key, so the
    // fact-churn direction reads the dim bucket-pruned)
    SnapshotStore.upsertVersion(spark,
      (1L to 40L).map(i => (i, i % 7, i * 10)).toDF("ok", "ck", "amt"),
      "ok", None, aDir, version = 0L)
    SnapshotStore.upsertVersion(spark,
      (0L to 6L).map(c => (c, s"seg$c")).toDF("ck", "seg"),
      "ck", None, bDir, version = 0L)

    def recompute(): Set[(Long, Long, Long, String)] =
      SnapshotStore.joinView(spark, aDir, "ok", bDir, "ck", "ck")
        .select($"ok", $"ck", $"amt", $"seg")
        .as[(Long, Long, Long, String)].collect().toSet
    def viewRows(v: org.apache.spark.sql.DataFrame) =
      v.select($"ok", $"ck", $"amt", $"seg")
        .as[(Long, Long, Long, String)].collect().toSet

    val v0 = SnapshotStore.joinView(spark, aDir, "ok", bDir, "ck", "ck")
      .persist()
    assert(viewRows(v0) == recompute() && viewRows(v0).nonEmpty)

    // FACT churn: update ok=3's amount, insert ok=100, delete ok=5
    SnapshotStore.upsertVersion(spark,
      Seq((3L, 3L % 7, 999L, "u"), (100L, 2L, 123L, "u"),
        (5L, 5L % 7, 0L, "d")).toDF("ok", "ck", "amt", "_op"),
      "ok", None, aDir, version = 1L, opCol = Some("_op"))
    val v1 = SnapshotStore.maintainJoin(spark, aDir, "ok", 0L, 1L,
      bDir, "ck", "ck", v0, "_ab", "_bb").persist()
    assert(viewRows(v1) == recompute())
    assert(viewRows(v1).exists(r => r._1 == 3L && r._3 == 999L))
    assert(!viewRows(v1).exists(_._1 == 5L))

    // DIM churn: rename seg2, delete ck=6 (all its facts drop out)
    SnapshotStore.upsertVersion(spark,
      Seq((2L, "SEG2!", "u"), (6L, "x", "d")).toDF("ck", "seg", "_op"),
      "ck", None, bDir, version = 1L, opCol = Some("_op"))
    val v2 = SnapshotStore.maintainJoin(spark, bDir, "ck", 0L, 1L,
      aDir, "ok", "ck", v1, "_bb", "_ab")
    assert(viewRows(v2) == recompute())
    assert(viewRows(v2).exists(_._4 == "SEG2!"))
    assert(!viewRows(v2).exists(_._2 == 6L))
    v0.unpersist(); v1.unpersist()
  }

  test("manifest records placement mode; hash-assuming paths verify it") {
    val root = scratchDir("snap_mode")
    val hashDir = s"$root/hash"; val contentDir = s"$root/content"
    SnapshotStore.upsertVersion(spark,
      (1L to 20L).map(i => (i, i * 10)).toDF("k", "v"),
      "k", None, hashDir, version = 0L)
    // content-bucketed dim whose bucket ids deliberately DISAGREE with
    // hash(k): the exact store ADVICE flagged — a hash-derived prune
    // would read the wrong buckets and drop join rows
    SnapshotStore.upsertVersion(spark,
      (0L to 6L).map(c => (c, s"seg$c", ((c + 3) % 7).toInt))
        .toDF("ck", "seg", "cell"),
      "ck", None, contentDir, version = 0L,
      bucketCol = Some("cell"), numBuckets = Some(7))
    assert(SnapshotStore.manifest(spark, hashDir).get.mode
      === Some("hash:k"))
    assert(SnapshotStore.manifest(spark, contentDir).get.mode
      === Some("content:cell"))

    // a delta placed under a DIFFERENT rule than the committed store
    // must fail, not merge against the wrong buckets
    val e1 = intercept[IllegalArgumentException] {
      SnapshotStore.upsertVersion(spark,
        Seq((1L, 11L)).toDF("k", "v"), "v", None, hashDir, version = 1L)
    }
    assert(e1.getMessage.contains("hash:k"))
    // hash routing on a content-bucketed store must refuse
    val e2 = intercept[IllegalArgumentException] {
      SnapshotStore.lookupKey(spark, contentDir, "ck", 3L)
    }
    assert(e2.getMessage.contains("content:cell"))
    val e3 = intercept[IllegalArgumentException] {
      SnapshotStore.rebucket(spark, contentDir, s"$root/g2", "ck", 4)
    }
    assert(e3.getMessage.contains("content:cell"))

    // maintainJoin with otherKey == joinCol against the CONTENT store:
    // before the mode check this took the wrong-bucket pruned read and
    // silently dropped rows; now it must fall back to the full read and
    // stay row-identical to a recompute
    val facts = s"$root/facts"
    SnapshotStore.upsertVersion(spark,
      (1L to 40L).map(i => (i, i % 7, i * 10)).toDF("ok", "ck", "amt"),
      "ok", None, facts, version = 0L)
    val v0 = SnapshotStore.joinView(spark, facts, "ok", contentDir, "ck", "ck")
    SnapshotStore.upsertVersion(spark,
      Seq((3L, 3L, 999L), (100L, 2L, 123L)).toDF("ok", "ck", "amt"),
      "ok", None, facts, version = 1L)
    val v1 = SnapshotStore.maintainJoin(spark, facts, "ok", 0L, 1L,
      contentDir, "ck", "ck", v0, "_ab", "_bb")
    val expect = SnapshotStore.joinView(spark, facts, "ok", contentDir, "ck", "ck")
      .select($"ok", $"ck", $"amt", $"seg")
      .as[(Long, Long, Long, String)].collect().toSet
    val got = v1.select($"ok", $"ck", $"amt", $"seg")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expect && got.exists(r => r._1 == 3L && r._3 == 999L))
  }

  test("a version colliding BELOW the committed head fails loudly") {
    // a reset checkpoint replaying old batch ids against a surviving
    // snapshot dir must error, not silently discard the batches
    val snap = scratchDir("snap_collide") + "/tbl"
    (0L to 2L).foreach { v =>
      SnapshotStore.upsertVersion(spark,
        Seq((v, v, s"v$v")).toDF("k", "seq", "v"), "k", None, snap, v)
    }
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.upsertVersion(spark,
        Seq((9L, 9L, "late")).toDF("k", "seq", "v"), "k", None, snap, 1L)
    }
    assert(e.getMessage.contains("collides"))
    // version == head is the legitimate at-least-once replay: no-op
    SnapshotStore.upsertVersion(spark,
      Seq((9L, 9L, "replay")).toDF("k", "seq", "v"), "k", None, snap, 2L)
    assert(!snapshot(snap).contains(9L))
  }

  test("within-batch seq ties resolve deterministically") {
    val snapA = scratchDir("snap_tie_a") + "/tbl"
    val snapB = scratchDir("snap_tie_b") + "/tbl"
    // two rows, same key, same seq — the md5-of-row tiebreak must pick
    // the same winner regardless of input order
    Seq(snapA -> Seq((1L, 5L, "a"), (1L, 5L, "b")),
        snapB -> Seq((1L, 5L, "b"), (1L, 5L, "a"))).foreach {
      case (dir, rows) =>
        SnapshotStore.upsertVersion(spark,
          rows.toDF("k", "seq", "v"), "k", Some("seq"), dir, 0L)
    }
    assert(snapshot(snapA) == snapshot(snapB))
  }

  test("uncommitted orphan data dirs are invisible to readers") {
    val snap = scratchDir("snap_orphan") + "/tbl"
    SnapshotStore.upsertVersion(spark,
      Seq((1L, 1L, "a")).toDF("k", "seq", "v"), "k", None, snap, 0L)
    // a writer that crashed after writing data but BEFORE the marker
    Seq((1L, 9L, "phantom")).toDF("k", "seq", "v")
      .write.parquet(s"$snap/v00000005-deadbeef01234567")
    assert(SnapshotStore.latestVersion(spark, snap).contains(0L))
    assert(snapshot(snap) == Map(1L -> (1L, "a")))
  }

  test("retention prunes bucket dirs no retained version references") {
    val snap = scratchDir("snap_retain") + "/tbl"
    // the SAME key every version => the same bucket rewritten 3 times:
    // once retained = {v1, v2}, nothing references v0's data any more
    (0L to 2L).foreach { v =>
      SnapshotStore.upsertVersion(spark,
        Seq((7L, v, s"v$v")).toDF("k", "seq", "v"), "k", None, snap, v,
        retain = 2)
    }
    val root = new org.apache.hadoop.fs.Path(snap)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirs = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.matches("v\\d{8}-[0-9a-f]+")).map(_.take(9)).sorted
    assert(dataDirs.toSeq == Seq("v00000001", "v00000002"),
      s"expected v0 pruned, got ${dataDirs.mkString(",")}")
    // all three commit markers AND their winning manifests survive
    // (auditable history: every committed version stays resolvable)
    val commitNames = fs
      .listStatus(new org.apache.hadoop.fs.Path(s"$snap/_commits"))
      .map(_.getPath.getName)
    assert(commitNames.count(_.matches("v\\d{8,}")) == 3)
    assert(commitNames.count(_.matches("\\.m-v\\d{8,}-[0-9a-f]+")) == 3)
    assert(SnapshotStore.versions(spark, snap) == Seq(0L, 1L, 2L))
    assert(snapshot(snap) == Map(7L -> (2L, "v2")))
  }

  /** md5 of every data file directly under `dir`, keyed by file name. */
  private def fileDigests(dir: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).map { st =>
      val in = fs.open(st.getPath)
      val bytes = try in.readAllBytes() finally in.close()
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      st.getPath.getName -> md.map("%02x".format(_)).mkString
    }.toMap
  }

  test("an upsert rewrites only touched buckets; untouched files are byte-identical") {
    val snap = scratchDir("snap_bytes") + "/tbl"
    spark.conf.set("spark.graft.snapshot.buckets", "4")
    try {
      SnapshotStore.upsertVersion(spark,
        (0L until 20L).map(k => (k, 0L, s"a$k")).toDF("k", "seq", "v"),
        "k", Some("seq"), snap, 0L)
      // bucket assignment is pmod(hash(key), n) — recompute it the same way
      val b0 = Seq(0L).toDF("k")
        .select(pmod(hash(col("k")), lit(4))).head.getInt(0)
      val m0 = SnapshotStore.manifest(spark, snap).get
      val untouched = m0.buckets.keySet.find(_ != b0).get
      val untouchedDir =
        s"$snap/${m0.buckets(untouched)}/_bucket=$untouched"
      val before = fileDigests(untouchedDir)
      assert(before.nonEmpty)

      SnapshotStore.upsertVersion(spark,
        Seq((0L, 1L, "upd")).toDF("k", "seq", "v"), "k", Some("seq"),
        snap, 1L)

      // the untouched bucket still serves v0's files, byte for byte
      assert(fileDigests(untouchedDir) == before)
      val m1 = SnapshotStore.manifest(spark, snap).get
      assert(m1.ownerVersion(b0) == 1L)
      assert(m1.ownerVersion(untouched) == 0L)
      val got = snapshot(snap)
      assert(got(0L) == (1L, "upd"))
      assert(got.size == 20 && got(7L) == (0L, "a7"))
    } finally spark.conf.unset("spark.graft.snapshot.buckets")
  }

  test("a version dir survives pruning while a retained manifest references it") {
    val snap = scratchDir("snap_refkeep") + "/tbl"
    spark.conf.set("spark.graft.snapshot.buckets", "4")
    try {
      SnapshotStore.upsertVersion(spark,
        (0L until 20L).map(k => (k, 0L, s"a$k")).toDF("k", "seq", "v"),
        "k", None, snap, 0L, retain = 2)
      // v1 and v2 rewrite ONLY key 0's bucket; v0 still owns the rest
      (1L to 2L).foreach { v =>
        SnapshotStore.upsertVersion(spark,
          Seq((0L, v, s"u$v")).toDF("k", "seq", "v"), "k", None, snap, v,
          retain = 2)
      }
      val b0 = Seq(0L).toDF("k")
        .select(pmod(hash(col("k")), lit(4))).head.getInt(0)
      val root = new org.apache.hadoop.fs.Path(snap)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // v0 is below the retention horizon but still referenced => kept
      // (resolve its data-dir name through the head manifest, which
      // still reads v0's attempt for every bucket the updates skipped)
      val mHead = SnapshotStore.manifest(spark, snap).get
      val unb = mHead.buckets.keySet.find(b =>
        b != b0 && mHead.ownerVersion(b) == 0L).get
      val v0 = new org.apache.hadoop.fs.Path(s"$snap/${mHead.buckets(unb)}")
      assert(fs.exists(v0), "referenced v0 dir must survive pruning")
      // ...except key 0's bucket, which v2 now owns: pruned from v0
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$v0/_bucket=$b0")))
      val got = snapshot(snap)
      assert(got.size == 20 && got(0L) == (2L, "u2") && got(1L) == (0L, "a1"))
    } finally spark.conf.unset("spark.graft.snapshot.buckets")
  }

  test("snapshot store runs unchanged on a non-default FileSystem scheme (graftfs:)") {
    // prove every path (data dirs, markers, pruning) resolves through
    // Path.getFileSystem on a second scheme — the substitution a real
    // multi-FS deployment makes. The scheme is outside the known-atomic-
    // create allow list, so the write must first REFUSE it (the probe),
    // then run cleanly once the deployer vouches for the scheme via the
    // documented conf.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    GraftTestFileSystem.renameIsCopyDelete = true
    val snap = s"graftfs:${scratchDir("snap_scheme")}/tbl"
    try {
      val refused = intercept[IllegalStateException] {
        SnapshotStore.upsertVersion(spark,
          Seq((1L, 1L, "a")).toDF("k", "seq", "v"),
          "k", Some("seq"), snap, 0L)
      }
      assert(refused.getMessage.contains("atomic"))
      spark.conf.set("spark.graft.snapshot.atomicCreateSchemes", "graftfs")
      SnapshotStore.upsertVersion(spark,
        Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "seq", "v"),
        "k", Some("seq"), snap, 0L)
      SnapshotStore.upsertVersion(spark,
        Seq((2L, 2L, "b2")).toDF("k", "seq", "v"),
        "k", Some("seq"), snap, 1L)
      assert(snapshot(snap) == Map(1L -> (1L, "a"), 2L -> (2L, "b2")))
      assert(SnapshotStore.latestVersion(spark, snap).contains(1L))
    } finally {
      GraftTestFileSystem.renameIsCopyDelete = false
      spark.conf.unset("spark.graft.snapshot.atomicCreateSchemes")
    }
  }

  test("commit CAS refuses S3A-like filesystems where create-once is check-then-create") {
    // The CAS's entire correctness is FileSystem.create(overwrite=false)
    // being atomic create-once. On S3A it is an existence HEAD at
    // create() with the PUT at close() — two same-slot writers both
    // pass. GraftTestFileSystem.createIsCheckThenAct emulates exactly
    // that; this spec proves (a) the broken-CAS premise is REAL on such
    // a filesystem, and (b) the store's scheme probe refuses before any
    // commit can corrupt.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    GraftTestFileSystem.createIsCheckThenAct = true
    val base = s"graftfs:${scratchDir("snap_s3a_cas")}"
    try {
      // (a) on this FS two writers really CAN both win a create-once —
      // the second create truncates the first writer's marker, the
      // lost-update class the probe exists to block
      val f = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(conf)
      val marker = new org.apache.hadoop.fs.Path(s"$base/race_marker")
      val w1 = f.create(marker, false)
      w1.write("writer-one".getBytes("UTF-8")); w1.close()
      val w2 = f.create(marker, false) // a true CAS would throw HERE
      w2.write("writer-two".getBytes("UTF-8")); w2.close()
      val in = f.open(marker)
      val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      assert(content == "writer-two",
        "second create-once writer silently replaced the first")

      // (b) the store never gets that far: the probe refuses the scheme
      // loudly and leaves nothing behind
      val snap = s"$base/tbl"
      val e = intercept[IllegalStateException] {
        SnapshotStore.upsertVersion(spark,
          Seq((1L, "a")).toDF("k", "v"), "k", None, snap, 0L)
      }
      assert(e.getMessage.contains("atomic create-once"))
      assert(e.getMessage.contains("atomicCreateSchemes"))
      assert(!f.exists(new org.apache.hadoop.fs.Path(snap)),
        "a refused store must write nothing")
    } finally {
      GraftTestFileSystem.createIsCheckThenAct = false
    }
  }

  test("property: random CDC batch sequences match an in-memory map model") {
    // fixed-seed model test: the snapshot after N random upsert batches
    // (with random replays interleaved) must equal folding the same
    // batches into a Map — replays must change nothing
    val rnd = new scala.util.Random(42)
    val snap = scratchDir("snap_model") + "/tbl"
    var model = Map.empty[Long, (Long, String)]
    var version = 0L
    (0 until 12).foreach { i =>
      // unique seq per batch row => deterministic winner without ties
      val batch = Seq.fill(1 + rnd.nextInt(6)) {
        (rnd.nextInt(8).toLong, i.toLong * 10 + rnd.nextInt(10), s"b${i}_${rnd.nextInt(100)}")
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // drop exact seq ties
      SnapshotStore.upsertVersion(spark,
        batch.toDF("k", "seq", "v"), "k", Some("seq"), snap, version)
      if (rnd.nextBoolean()) // at-least-once: replay the same batch
        SnapshotStore.upsertVersion(spark,
          batch.toDF("k", "seq", "v"), "k", Some("seq"), snap, version)
      val winners = batch.groupBy(_._1).map { case (k, rows) =>
        val w = rows.maxBy(r => (r._2, r._3))
        k -> (w._2, w._3)
      }
      model = model ++ winners
      version += 1
    }
    assert(snapshot(snap) == model)
  }

  test("CDC tombstones delete keys from the snapshot, exactly once") {
    val snap = scratchDir("snap_del") + "/tbl"
    def up(rows: Seq[(Long, Long, String, String)], v: Long): Unit =
      SnapshotStore.upsertVersion(spark,
        rows.toDF("k", "seq", "v", "op"), "k", Some("seq"), snap, v,
        opCol = Some("op"))

    up(Seq((1L, 1L, "a", "u"), (2L, 1L, "b", "u"), (3L, 1L, "c", "u")), 0L)
    // one batch mixing a delete (key 2) with an update (key 3)
    up(Seq((2L, 2L, "", "d"), (3L, 2L, "c2", "u")), 1L)
    assert(snapshot(snap) == Map(1L -> (1L, "a"), 3L -> (2L, "c2")))

    // at-least-once replay of the delete batch: marker no-ops it
    up(Seq((2L, 2L, "", "d"), (3L, 2L, "c2", "u")), 1L)
    assert(snapshot(snap) == Map(1L -> (1L, "a"), 3L -> (2L, "c2")))

    // delete then reinsert in a later batch: the key comes back
    up(Seq((2L, 3L, "back", "u")), 2L)
    assert(snapshot(snap)(2L) == (3L, "back"))

    // within one batch the seq winner decides the key's fate:
    // upsert then higher-seq delete => deleted ...
    up(Seq((4L, 1L, "x", "u"), (4L, 2L, "", "d")), 3L)
    assert(!snapshot(snap).contains(4L))
    // ... delete then higher-seq upsert => alive
    up(Seq((5L, 1L, "", "d"), (5L, 2L, "y", "u")), 4L)
    assert(snapshot(snap)(5L) == (2L, "y"))

    // tombstone for a never-seen key no-ops (replay-safe deletes)
    up(Seq((99L, 1L, "", "d")), 5L)
    assert(!snapshot(snap).contains(99L))
  }

  test("a delete-only delta rewrites only its bucket; an emptied bucket reads as zero rows") {
    val snap = scratchDir("snap_del_bytes") + "/tbl"
    spark.conf.set("spark.graft.snapshot.buckets", "4")
    try {
      SnapshotStore.upsertVersion(spark,
        (0L until 20L).map(k => (k, 0L, s"a$k", "u")).toDF("k", "seq", "v", "op"),
        "k", Some("seq"), snap, 0L, opCol = Some("op"))
      val bucketOf = (0L until 20L).toDF("k")
        .select(col("k"), pmod(hash(col("k")), lit(4)).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val b0 = bucketOf(0L)
      val untouched = (0 until 4).find(_ != b0).get
      val m0 = SnapshotStore.manifest(spark, snap).get
      val untouchedDir =
        s"$snap/${m0.buckets(untouched)}/_bucket=$untouched"
      val before = fileDigests(untouchedDir)
      assert(before.nonEmpty)

      // delete EVERY key living in bucket b0: the bucket is emptied, so
      // the version must land a zero-row schema-bearing dir for it — a
      // manifest still pointing at v0 would resurrect the deleted rows
      val doomed = (0L until 20L).filter(k => bucketOf(k) == b0)
      assert(doomed.size > 1, "test premise: several keys share bucket 0")
      SnapshotStore.upsertVersion(spark,
        doomed.map(k => (k, 1L, "", "d")).toDF("k", "seq", "v", "op"),
        "k", Some("seq"), snap, 1L, opCol = Some("op"))

      // untouched buckets still serve v0's files byte for byte
      assert(fileDigests(untouchedDir) == before)
      val m1 = SnapshotStore.manifest(spark, snap).get
      assert(m1.ownerVersion(b0) == 1L)
      assert(m1.ownerVersion(untouched) == 0L)
      // the snapshot READS (the emptied bucket contributes zero rows)
      val got = snapshot(snap)
      assert(got.size == 20 - doomed.size)
      assert(doomed.forall(k => !got.contains(k)))
    } finally spark.conf.unset("spark.graft.snapshot.buckets")
  }

  test("streaming CDC upsert with deletes is exactly-once end-to-end") {
    val landing = scratchDir("cdc_landing")
    val snap    = scratchDir("cdc_store") + "/tbl"
    val ckpt    = scratchDir("cdc_ckpt") + "/cp"
    val cdcSchema = StructType(csvSchema.fields :+ StructField("op", StringType))
    def writeCdc(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(landing, name),
        ("k,seq,v,op" +: rows).mkString("\n").getBytes("UTF-8"))
    def run(): Unit = StreamingPipeline.runIncrementalUpsert(
      spark,
      spark.readStream.option("header", "true").schema(cdcSchema)
        .csv(s"$landing/*.csv"),
      key = "k", seqCol = Some("seq"), snap, ckpt,
      opCol = Some("op")).awaitTermination()

    writeCdc("b1.csv", Seq("1,1,a,u", "2,1,b,u", "3,1,c,u"))
    run()
    assert(snapshot(snap) ==
      Map(1L -> (1L, "a"), 2L -> (1L, "b"), 3L -> (1L, "c")))

    // batch 1: delete key 2, update key 3, insert key 4
    writeCdc("b2.csv", Seq("2,2,,d", "3,2,c2,u", "4,1,d4,u"))
    run()
    assert(snapshot(snap) ==
      Map(1L -> (1L, "a"), 3L -> (2L, "c2"), 4L -> (1L, "d4")))

    // at-least-once replay of the committed delete batch: marker no-ops
    // it even if the replayed contents try to resurrect the key
    SnapshotStore.upsertVersion(spark,
      Seq((2L, 9L, "ZOMBIE", "u")).toDF("k", "seq", "v", "op"),
      "k", Some("seq"), snap, version = 1L, opCol = Some("op"))
    assert(!snapshot(snap).contains(2L))

    // restart with no new files: checkpoint replays nothing
    run()
    assert(SnapshotStore.latestVersion(spark, snap).contains(1L))
  }

  test("time travel: any retained version reads as-of; pruned versions fail loudly") {
    val snap = scratchDir("snap_asof") + "/tbl"
    def asOf(v: Long): Map[Long, (Long, String)] =
      SnapshotStore.readVersion(spark, snap, v)
        .select("k", "seq", "v").as[(Long, Long, String)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap

    // v0: two keys; v1: update 2 + insert 3; v2: DELETE key 1
    SnapshotStore.upsertVersion(spark,
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "seq", "v"),
      "k", None, snap, 0L, retain = 3)
    SnapshotStore.upsertVersion(spark,
      Seq((2L, 2L, "b2"), (3L, 1L, "c")).toDF("k", "seq", "v"),
      "k", None, snap, 1L, retain = 3)
    SnapshotStore.upsertVersion(spark,
      Seq((1L, 3L, "", "d")).toDF("k", "seq", "v", "op"),
      "k", None, snap, 2L, retain = 3, opCol = Some("op"))

    assert(SnapshotStore.versions(spark, snap) == Seq(0L, 1L, 2L))
    // each retained version reads exactly its historical contents —
    // including key 1 BEFORE its deletion
    assert(asOf(0L) == Map(1L -> (1L, "a"), 2L -> (1L, "b")))
    assert(asOf(1L) == Map(1L -> (1L, "a"), 2L -> (2L, "b2"), 3L -> (1L, "c")))
    assert(asOf(2L) == Map(2L -> (2L, "b2"), 3L -> (1L, "c")))
    assert(snapshot(snap) == asOf(2L)) // head == latest as-of

    // a never-committed version fails on the marker check
    val e1 = intercept[IllegalArgumentException](asOf(7L))
    assert(e1.getMessage.contains("never committed"))

    // push v0 outside a retain=2 window: its manifest prunes, and the
    // as-of read must refuse rather than serve a partial snapshot
    SnapshotStore.upsertVersion(spark,
      Seq((3L, 9L, "c2")).toDF("k", "seq", "v"), "k", None, snap, 3L,
      retain = 2)
    val e2 = intercept[IllegalArgumentException](asOf(0L))
    assert(e2.getMessage.contains("retention window"))
    // versions inside the window still read
    assert(asOf(3L)(3L) == (9L, "c2"))
  }

  test("point lookup reads exactly one bucket and routes like the writer") {
    val snap = scratchDir("snap_lookup") + "/tbl"
    spark.conf.set("spark.graft.snapshot.buckets", "8")
    try {
      SnapshotStore.upsertVersion(spark,
        (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v"),
        "k", None, snap, 0L)
      // every key resolves to its row, via ONE bucket dir's files only
      Seq(1L, 57L, 200L).foreach { k =>
        val df = SnapshotStore.lookupKey(spark, snap, "k", k).get
        val rows = df.select("v").collect().map(_.getString(0))
        assert(rows.toSeq == Seq(s"v$k"), s"key $k")
        val dirs = df.inputFiles.map(_.replaceAll("/[^/]+$", "")).distinct
        assert(dirs.length == 1 && dirs.head.contains("_bucket="),
          s"lookup of $k read ${dirs.mkString(", ")}")
      }
      // int-typed value for a bigint key still routes correctly
      assert(SnapshotStore.lookupKey(spark, snap, "k", 57)
        .get.count() == 1)
      // absent key: empty, not an error
      assert(SnapshotStore.lookupKey(spark, snap, "k", 4242L).get.count() == 0)
      // before any commit: None
      assert(SnapshotStore.lookupKey(spark,
        scratchDir("snap_lookup_empty") + "/none", "k", 1L).isEmpty)
    } finally spark.conf.unset("spark.graft.snapshot.buckets")
  }

  test("change feed: semantic diff only, netting across version spans") {
    val snap = scratchDir("snap_feed") + "/tbl"
    def feed(a: Long, b: Long): Map[Long, (String, String)] =
      SnapshotStore.changes(spark, snap, "k", a, b)
        .select("k", "v", "_change").as[(Long, String, String)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap

    SnapshotStore.upsertVersion(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      "k", None, snap, 0L, retain = 4)
    // v1: rewrite 2 VERBATIM (no-op), change 3, insert 4
    SnapshotStore.upsertVersion(spark,
      Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("k", "v"),
      "k", None, snap, 1L, retain = 4)
    // v2: delete 4, insert 5
    SnapshotStore.upsertVersion(spark,
      Seq((4L, "", "d"), (5L, "e", "u")).toDF("k", "v", "op"),
      "k", None, snap, 2L, retain = 4, opCol = Some("op"))

    // the verbatim rewrite of 2 must NOT appear: semantic diff, not writes
    assert(feed(0L, 1L) == Map(3L -> ("c2", "update"), 4L -> ("d", "insert")))
    // deletes carry last-seen values
    assert(feed(1L, 2L) == Map(4L -> ("d", "delete"), 5L -> ("e", "insert")))
    // a span nets out: 4's insert+delete vanishes; 3's update survives
    assert(feed(0L, 2L) == Map(3L -> ("c2", "update"), 5L -> ("e", "insert")))

    intercept[IllegalArgumentException](feed(2L, 2L))
    intercept[IllegalArgumentException](feed(0L, 9L))
  }

  test("additive schema evolution: new column null-fills old rows and vintages") {
    val snap = scratchDir("snap_evolve") + "/tbl"
    // v0: the pre-evolution table, keys spread across many buckets
    SnapshotStore.upsertVersion(spark,
      (1L to 40L).map(k => (k, s"v$k")).toDF("k", "v"),
      "k", None, snap, 0L, retain = 3)
    // v1: a delta that touches TWO keys and carries a brand-new column
    SnapshotStore.upsertVersion(spark,
      Seq((2L, "v2b", 7), (41L, "new", 9)).toDF("k", "v", "score"),
      "k", None, snap, 1L, retain = 3, evolve = true)

    val head = SnapshotStore.read(spark, snap).get
    assert(head.columns.toSet == Set("k", "v", "score"))
    val rows = head.select("k", "v", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(rows.size == 41)
    // delta rows carry the column; EVERY untouched row — including whole
    // buckets v1 never rewrote — reads back null-filled
    assert(rows(2L)  == ("v2b", Some(7)))
    assert(rows(41L) == ("new", Some(9)))
    assert(rows(1L)  == ("v1", None))
    assert((1L to 40L).filter(_ != 2L).forall(rows(_)._2.isEmpty))

    // time travel keeps history faithful: the pre-evolution version
    // reads back WITHOUT the evolved column
    assert(SnapshotStore.readVersion(spark, snap, 0L)
      .columns.toSet == Set("k", "v"))

    // a delta that stops carrying an old column null-fills it on its
    // own rows (whole-row replacement semantics, documented)
    SnapshotStore.upsertVersion(spark,
      Seq((3L, 5)).toDF("k", "score"), "k", None, snap, 2L,
      retain = 3, evolve = true)
    val r3 = SnapshotStore.read(spark, snap).get
      .filter(col("k") === 3L).select("v", "score").head
    assert(r3.isNullAt(0) && r3.getInt(1) == 5)

    // without evolve, schema drift must fail loudly, not null-fill
    intercept[org.apache.spark.sql.AnalysisException] {
      SnapshotStore.upsertVersion(spark,
        Seq((4L, "x", 1, 2)).toDF("k", "v", "score", "typo"),
        "k", None, snap, 3L, retain = 3)
    }
  }

  test("streaming dedup-gated ingest: accepted corpus + band index, exactly-once") {
    val landing = scratchDir("dd_landing")
    val idx     = scratchDir("dd_index") + "/idx"
    val acc     = scratchDir("dd_accepted") + "/docs"
    val ckpt    = scratchDir("dd_ckpt") + "/cp"
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val base = "spark makes big data small again with catalyst and tungsten " +
      "query plans that scale across many executors without manual tuning"
    val other = "completely different content about weather events in ohio " +
      "and airport delay statistics gathered over several winters"
    def writeDocs(name: String, rows: Seq[(Long, String)]): Unit =
      Files.write(Paths.get(landing, name),
        ("doc_id\ttext" +: rows.map { case (id, t) => s"$id\t$t" })
          .mkString("\n").getBytes("UTF-8"))
    def run(): Unit = StreamingPipeline.runIncrementalDedup(
      spark,
      spark.readStream.option("header", "true").option("sep", "\t")
        .schema(docSchema).csv(s"$landing/*.csv"),
      idx, acc, ckpt).awaitTermination()
    def acceptedIds: Set[Long] =
      SnapshotStore.read(spark, acc).get.select("doc_id")
        .as[Long].collect().toSet

    // batch 0: novel doc 10, exact dup 11 (within-batch lowest id wins)
    writeDocs("b1.csv", Seq(10L -> base, 11L -> base))
    run()
    assert(acceptedIds === Set(10L))

    // batch 1: 12 near-dups ACCEPTED doc 10 (cross-batch, via the
    // stored index — corpus text never re-read), 13 is novel
    writeDocs("b2.csv", Seq(
      12L -> base.replace("manual", "hand"), 13L -> other))
    run()
    assert(acceptedIds === Set(10L, 13L))
    // the index holds min canons: doc 10's full-sig buckets canon to 10
    val canon = SnapshotStore.read(spark, idx).get
      .agg(min(col("canon_doc"))).head.getLong(0)
    assert(canon === 10L)

    // restart with no new files: checkpoint replays nothing, both
    // stores keep their heads (exactly-once across the pair)
    run()
    assert(SnapshotStore.latestVersion(spark, acc).contains(1L))
    assert(SnapshotStore.latestVersion(spark, idx).contains(1L))
    assert(acceptedIds === Set(10L, 13L))
  }

  test("incremental view maintenance: chained spans equal full recomputes, groups vanish and appear") {
    val snap = scratchDir("snap_view") + "/tbl"
    spark.conf.set("spark.graft.snapshot.buckets", "8")
    try {
      def viewOf(v: Long) = SnapshotStore.readVersion(spark, snap, v)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("amt").cast(DecimalType(18, 2))).as("total"))
      def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
        df.select(col("grp"), col("cnt"), col("total").cast("double"))
          .as[(String, Long, Double)].collect().toSet
      def maintain(from: Long, to: Long, old: org.apache.spark.sql.DataFrame) =
        SnapshotStore.maintainAgg(spark, snap, from, to, old, Seq("grp"),
          Seq("total" -> col("amt").cast(DecimalType(18, 2))))

      // v0: three cyclic groups over keys 1..30, plus a doomed group
      // whose entire membership v1 will delete
      val base = (1L to 30L).map(k => (k, s"g${k % 3}", k * 1.25, "u")) ++
        Seq(100L, 101L, 102L).map(k => (k, "gone", k * 2.0, "u"))
      SnapshotStore.upsertVersion(spark,
        base.toDF("k", "grp", "amt", "op"), "k", None, snap, 0L,
        retain = 5, opCol = Some("op"))
      val view0 = viewOf(0L)

      // v1: delete ALL of "gone", update one key, insert a new group
      SnapshotStore.upsertVersion(spark,
        (Seq(100L, 101L, 102L).map(k => (k, "gone", 0.0, "d")) ++
          Seq((1L, "g1", 999.75, "u"), (50L, "new", 7.50, "u")))
          .toDF("k", "grp", "amt", "op"),
        "k", None, snap, 1L, retain = 5, opCol = Some("op"))
      val view1 = maintain(0L, 1L, view0)
      assert(rows(view1) === rows(viewOf(1L)))
      val byGrp1 = rows(view1).map(r => r._1 -> r).toMap
      assert(!byGrp1.contains("gone"), "fully-deleted group must vanish")
      assert(byGrp1("new") === ("new", 1L, 7.50))

      // v2: a single-key delta — churn must be ONE bucket of 8, and the
      // CHAINED maintenance (view1 was itself maintained) still matches
      SnapshotStore.upsertVersion(spark,
        Seq((2L, "g2", 2.25, "u")).toDF("k", "grp", "amt", "op"),
        "k", None, snap, 2L, retain = 5, opCol = Some("op"))
      assert(SnapshotStore.churnedBuckets(spark, snap, 1L, 2L).size === 1)
      val view2 = maintain(1L, 2L, view1)
      assert(rows(view2) === rows(viewOf(2L)))

      // v3: an empty delta — no churn, the view passes through untouched
      SnapshotStore.upsertVersion(spark,
        base.toDF("k", "grp", "amt", "op").limit(0), "k", None, snap, 3L,
        retain = 5, opCol = Some("op"))
      assert(SnapshotStore.churnedBuckets(spark, snap, 2L, 3L).isEmpty)
      assert(rows(maintain(2L, 3L, view2)) === rows(view2))

      // a span across several versions maintains in ONE step
      assert(rows(maintain(0L, 2L, view0)) === rows(viewOf(2L)))
    } finally spark.conf.unset("spark.graft.snapshot.buckets")
  }

  test("streaming incrementally-maintained view tracks the table store exactly-once") {
    val landing = scratchDir("mv_landing")
    val snap    = scratchDir("mv_store") + "/tbl"
    val view    = scratchDir("mv_view") + "/vw"
    val ckpt    = scratchDir("mv_ckpt") + "/cp"
    val mvSchema = StructType(Seq(
      StructField("k", LongType), StructField("seq", LongType),
      StructField("grp", StringType), StructField("amt", DoubleType),
      StructField("op", StringType)))
    val sums = Seq("total" -> col("amt").cast(DecimalType(18, 2)))
    def writeRows(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(landing, name),
        ("k,seq,grp,amt,op" +: rows).mkString("\n").getBytes("UTF-8"))
    def run(): Unit = StreamingPipeline.runIncrementalView(
      spark,
      spark.readStream.option("header", "true").schema(mvSchema)
        .csv(s"$landing/*.csv"),
      key = "k", seqCol = Some("seq"), groupCol = "grp", sums,
      snap, view, ckpt, opCol = Some("op")).awaitTermination()
    def viewRows: Map[String, (Long, Double)] =
      SnapshotStore.read(spark, view).get
        .select(col("grp"), col("cnt"), col("total").cast("double"))
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    def recompute: Map[String, (Long, Double)] =
      SnapshotStore.read(spark, snap).get
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("amt").cast(DecimalType(18, 2))).cast("double").as("total"))
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

    // batch 0: three groups
    writeRows("b1.csv", Seq(
      "1,1,a,1.25,u", "2,1,a,2.50,u", "3,1,b,10.00,u",
      "4,1,c,5.00,u", "5,1,c,7.75,u"))
    run()
    assert(SnapshotStore.latestVersion(spark, view).contains(0L))
    assert(viewRows === Map("a" -> (2L, 3.75), "b" -> (1L, 10.00),
      "c" -> (2L, 12.75)))

    // batch 1: delete ALL of c, update one a row, insert group d —
    // the view must track, with the emptied group tombstoned away
    writeRows("b2.csv", Seq(
      "4,2,c,0,d", "5,2,c,0,d", "1,2,a,100.25,u", "9,1,d,3.00,u"))
    run()
    assert(SnapshotStore.latestVersion(spark, view).contains(1L))
    assert(viewRows === recompute)
    assert(!viewRows.contains("c") && viewRows("d") === (1L, 3.00))
    assert(viewRows("a") === (2L, 102.75))

    // a replayed fold is a no-op (view head == table head)
    StreamingPipeline.foldView(spark, snap, view, "grp", sums)
    assert(SnapshotStore.latestVersion(spark, view).contains(1L))
    assert(viewRows === recompute)

    // crash window of ONE version: the table commits v2 with no fold;
    // the next fold catches up INCREMENTALLY (v1's manifest is still
    // inside retain=2)
    SnapshotStore.upsertVersion(spark,
      Seq((10L, 1L, "e", 4.50, "u")).toDF("k", "seq", "grp", "amt", "op"),
      "k", Some("seq"), snap, 2L, opCol = Some("op"))
    assert(SnapshotStore.spanReadable(spark, snap, 1L, 2L))
    StreamingPipeline.foldView(spark, snap, view, "grp", sums)
    assert(SnapshotStore.latestVersion(spark, view).contains(2L))
    assert(viewRows === recompute)
    assert(viewRows("e") === (1L, 4.50))

    // crash window DEEPER than retention: two more table versions with
    // no fold — the span's start manifest is pruned, so the fold must
    // fall back to a full REBUILD and still land the exact view
    SnapshotStore.upsertVersion(spark,
      Seq((3L, 2L, "b", 0.0, "d")).toDF("k", "seq", "grp", "amt", "op"),
      "k", Some("seq"), snap, 3L, opCol = Some("op"))
    SnapshotStore.upsertVersion(spark,
      Seq((11L, 1L, "f", 6.00, "u")).toDF("k", "seq", "grp", "amt", "op"),
      "k", Some("seq"), snap, 4L, opCol = Some("op"))
    assert(!SnapshotStore.spanReadable(spark, snap, 2L, 4L),
      "test premise: the lagged span must be beyond retention")
    StreamingPipeline.foldView(spark, snap, view, "grp", sums)
    // the view SKIPPED table txn 3 (crash window), so its own version
    // numbers (contiguous by the commit CAS) lag its recorded txns —
    // the fold's high-water mark is the txn, not the version
    assert(SnapshotStore.latestTxn(spark, view).contains(4L))
    assert(SnapshotStore.latestVersion(spark, view).contains(3L))
    assert(viewRows === recompute)
    assert(!viewRows.contains("b") && viewRows("f") === (1L, 6.00))
  }

  test("stream-static enrichment attaches dimension columns per batch") {
    val dim = Seq((10L, "alice"), (11L, "bob")).toDF("id", "name")
    val mem = MemoryStream[(Long, Long, Double)](spark)
    val typed = mem.toDF().toDF("event_id", "user_id", "value")
    val q = StreamingPipeline.enriched(typed, dim, "user_id", "id")
      .select($"event_id", $"name")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10L, 1.0), (2L, 11L, 2.0), (3L, 99L, 3.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .as[(Long, Option[String])].collect().toMap
      // unmatched key 99 passes through with null, not dropped
      assert(rows == Map(1L -> Some("alice"), 2L -> Some("bob"), 3L -> None))
    } finally q.stop()
  }

  test("rebucket creates a new generation with the new bucket count") {
    import spark.implicits._
    val dir = scratchDir("snap_rebkt") + "/src"
    val out = scratchDir("snap_rebkt_out") + "/dst"
    val rows = (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v")
    SnapshotStore.upsertVersion(spark, rows, "k", None, dir, 0L,
      numBuckets = Some(2))
    SnapshotStore.rebucket(spark, dir, out, "k", 8)

    // new generation: 8 buckets, identical contents, source untouched
    assert(SnapshotStore.manifest(spark, out).get.numBuckets == 8)
    assert(SnapshotStore.manifest(spark, dir).get.numBuckets == 2)
    def all(d: String) = SnapshotStore.read(spark, d).get
      .as[(Long, String)].collect().toSet
    assert(all(out) == all(dir))

    // the new store routes point lookups through the NEW bucket count
    val hit = SnapshotStore.lookupKey(spark, out, "k", 7L).get
    assert(hit.as[(Long, String)].collect().toSeq == Seq((7L, "v7")))
    assert(hit.inputFiles.forall(_.contains("/dst/")))

    // and upserts continue from version 0 of the new generation
    SnapshotStore.upsertVersion(spark,
      Seq((7L, "v7b")).toDF("k", "v"), "k", None, out, 1L)
    assert(SnapshotStore.lookupKey(spark, out, "k", 7L).get
      .as[(Long, String)].collect().toSeq == Seq((7L, "v7b")))
  }

  test("OCC: a claimed version rejects the second writer loudly, store intact") {
    import spark.implicits._
    val dir = scratchDir("snap_occ_claim") + "/tbl"
    SnapshotStore.upsertVersion(spark,
      Seq((1L, "a")).toDF("k", "v"), "k", None, dir, 0L)
    // simulate a live writer mid-flight on v1: its claim exists, no marker
    val claims = new java.io.File(s"$dir/_claims")
    claims.mkdirs()
    val claim = new java.io.File(claims, "v00000001")
    assert(claim.createNewFile())
    val e = intercept[SnapshotStore.ConcurrentWriteException] {
      SnapshotStore.upsertVersion(spark,
        Seq((2L, "b")).toDF("k", "v"), "k", None, dir, 1L)
    }
    assert(e.getMessage.contains("claimed by another writer"))
    // the loser wrote nothing: head and contents unchanged
    assert(SnapshotStore.latestVersion(spark, dir).contains(0L))
    assert(SnapshotStore.read(spark, dir).get.as[(Long, String)]
      .collect().toSet == Set((1L, "a")))
    // the claim belongs to the (simulated) first writer — still held
    assert(claim.exists())
    // once the holder is gone the slot reopens
    assert(claim.delete())
    SnapshotStore.upsertVersion(spark,
      Seq((2L, "b")).toDF("k", "v"), "k", None, dir, 1L)
    assert(SnapshotStore.read(spark, dir).get.as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    // successful commits release their claims
    assert(!new java.io.File(claims, "v00000001").exists())
  }

  test("OCC CAS: three-writer TTL-reclaim race — exactly one commit survives") {
    // The lost-update interleaving the commit CAS must kill: writer A
    // claims the next version and stalls past the claim TTL; writer B
    // reclaims the stale claim and commits; a third writer C attempts
    // while B holds the reclaimed claim; A then resumes its merge and
    // tries to publish. Exactly ONE of the three may commit; the other
    // two must fail loudly, and nothing the winner wrote may be lost.
    // Every step is deterministically barriered: A's delta blocks on
    // the commit marker (so A resumes only after the winner published),
    // B's delta blocks on a release file (so C provably runs while B
    // holds the claim), and C runs on the main thread in between.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import spark.implicits._
    val dir = scratchDir("snap_occ_race") + "/tbl"
    val release = new java.io.File(scratchDir("snap_occ_race"), "release_B")
    SnapshotStore.upsertVersion(spark,
      Seq((1L, "base")).toDF("k", "v"), "k", None, dir, 0L)
    spark.conf.set("spark.graft.snapshot.claimTtlMs", "2000")
    try {
      val marker1 = s"$dir/_commits/v00000001"
      def blockingDelta(gate: String, row: (Long, String)) =
        spark.range(1).map { _ =>
          var waited = 0
          while (!new java.io.File(gate).exists() && waited < 60000) {
            Thread.sleep(50); waited += 50
          }
          row
        }.toDF("k", "v")

      // A: claims v1, then stalls inside its merge until someone commits
      val a = Future(intercept[SnapshotStore.ConcurrentWriteException] {
        SnapshotStore.upsertVersion(spark,
          blockingDelta(marker1, (100L, "from_A")), "k", None, dir, 1L)
      })
      val claim1 = new java.io.File(s"$dir/_claims/v00000001")
      var waited = 0
      while (!claim1.exists() && waited < 60000) { Thread.sleep(50); waited += 50 }
      assert(claim1.exists(), "writer A never claimed v1")
      val aClaimStamp = claim1.lastModified()
      Thread.sleep(2100) // age A's claim past the 2 s TTL

      // B: reclaims A's stale claim, then stalls holding it
      val b = Future {
        SnapshotStore.upsertVersion(spark,
          blockingDelta(release.getPath, (2L, "from_B")), "k", None, dir, 1L)
      }
      waited = 0
      while (claim1.lastModified() == aClaimStamp && waited < 60000) {
        Thread.sleep(50); waited += 50
      }
      assert(claim1.lastModified() != aClaimStamp, "B never reclaimed the claim")

      // C: attempts while B holds the freshly-reclaimed claim — loud loser
      val cErr = intercept[SnapshotStore.ConcurrentWriteException] {
        SnapshotStore.upsertVersion(spark,
          Seq((3L, "from_C")).toDF("k", "v"), "k", None, dir, 1L)
      }
      assert(cErr.getMessage.contains("claimed by another writer"))

      // release B: it commits v1; A then resumes and must lose AT THE
      // CREATE-ONCE COMMIT — there is no validate-then-publish window
      // left for A to slip through
      assert(release.createNewFile())
      Await.result(b, 120.seconds)
      val aErr = Await.result(a, 120.seconds)
      assert(aErr.getMessage.contains("lost the commit race"))

      // exactly one v1 commit; B's data intact, A's and C's rows absent,
      // A's orphan attempt dir invisible
      assert(SnapshotStore.latestVersion(spark, dir).contains(1L))
      assert(SnapshotStore.versions(spark, dir) == Seq(0L, 1L))
      assert(SnapshotStore.read(spark, dir).get.as[(Long, String)]
        .collect().toSet == Set((1L, "base"), (2L, "from_B")))
      // the loser must NOT delete the winner-lineage claim; B's own
      // commit released it
      assert(!claim1.exists())

      // A's retry against the new head lands cleanly as v2
      SnapshotStore.upsertVersion(spark,
        Seq((100L, "from_A")).toDF("k", "v"), "k", None, dir, 2L)
      assert(SnapshotStore.read(spark, dir).get.as[(Long, String)]
        .collect().toSet ==
        Set((1L, "base"), (2L, "from_B"), (100L, "from_A")))
    } finally spark.conf.unset("spark.graft.snapshot.claimTtlMs")
  }

  test("an in-flight commit marker never tears reads; writers wait the grace then auto-heal") {
    import spark.implicits._
    val dir = scratchDir("snap_torn") + "/tbl"
    SnapshotStore.upsertVersion(spark,
      Seq((1L, "a")).toDF("k", "v"), "k", None, dir, 0L)
    // simulate a writer caught between the marker create and its token
    // landing: an empty v1 marker (the manifest is always in its own
    // file, so no manifest content can be half-written)
    val inflight = new java.io.File(s"$dir/_commits/v00000001")
    assert(inflight.createNewFile())
    // READERS are untouched: the head resolves to the committed v0 —
    // no exception, no torn message, no repair instruction
    assert(SnapshotStore.latestVersion(spark, dir).contains(0L))
    assert(SnapshotStore.versions(spark, dir) == Seq(0L))
    assert(SnapshotStore.read(spark, dir).get.as[(Long, String)]
      .collect().toSet == Set((1L, "a")))
    // asking for the in-flight version EXPLICITLY is loud and says so
    val rv = intercept[IllegalStateException] {
      SnapshotStore.readVersion(spark, dir, 1L)
    }
    assert(rv.getMessage.contains("IN-FLIGHT"))
    // a WRITER inside the grace window refuses the slot (the in-flight
    // writer may still land its token) — and deletes nothing
    spark.conf.set("spark.graft.snapshot.commitGraceMs", "60000")
    try {
      val e = intercept[SnapshotStore.ConcurrentWriteException] {
        SnapshotStore.upsertVersion(spark,
          Seq((2L, "b")).toDF("k", "v"), "k", None, dir, 1L)
      }
      assert(e.getMessage.contains("in-flight"))
      assert(inflight.exists(), "a writer inside grace must not heal")
      // past the grace window the marker is an abandoned commit: the
      // next writer heals it automatically and the slot reopens —
      // no manual repair anywhere
      spark.conf.set("spark.graft.snapshot.commitGraceMs", "1")
      Thread.sleep(10)
      SnapshotStore.upsertVersion(spark,
        Seq((2L, "b")).toDF("k", "v"), "k", None, dir, 1L)
      assert(SnapshotStore.read(spark, dir).get.as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (2L, "b")))
      assert(SnapshotStore.versions(spark, dir) == Seq(0L, 1L))
    } finally spark.conf.unset("spark.graft.snapshot.commitGraceMs")
  }

  test("an incremental-view caller falls back to full rebuild across an in-flight entry") {
    import spark.implicits._
    val dir = scratchDir("snap_span_inflight") + "/tbl"
    SnapshotStore.upsertVersion(spark,
      Seq((1L, "a")).toDF("k", "v"), "k", None, dir, 0L)
    SnapshotStore.upsertVersion(spark,
      Seq((2L, "b")).toDF("k", "v"), "k", None, dir, 1L)
    assert(SnapshotStore.spanReadable(spark, dir, 0L, 1L))
    // an in-flight marker inside the span answers false (full-rebuild
    // fallback), never propagates the in-flight exception
    val inflight = new java.io.File(s"$dir/_commits/v00000002")
    assert(inflight.createNewFile())
    assert(!SnapshotStore.spanReadable(spark, dir, 1L, 2L))
    assert(!SnapshotStore.spanReadable(spark, dir, 0L, 2L))
    assert(SnapshotStore.spanReadable(spark, dir, 0L, 1L),
      "a span below the in-flight marker stays readable")
  }

  test("grace-heal race: a stalled writer whose token lands after a heal reports a LOSS, not success") {
    // The exact interleaving the read-back verify exists for: writer A
    // creates its commit marker, then stalls past the grace window
    // before its 16-byte token write; writer B heals the abandoned
    // (empty) marker, re-creates it, and commits; A then resumes, its
    // token write and close SUCCEED (the stream points at the unlinked
    // file), and without the read-back A would believe it committed —
    // two writers reporting success for one slot. With it, A must see
    // B's token and throw. Exactly one success, B's data is the store.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val root = scratchDir("snap_heal_race")
    val dir = s"graftfs:$root/tbl"
    val gate = new java.io.File(root, "release_A")
    spark.conf.set("spark.graft.snapshot.atomicCreateSchemes", "graftfs")
    try {
      SnapshotStore.upsertVersion(spark,
        Seq((1L, "base")).toDF("k", "v"), "k", None, dir, 0L)
      val marker1 = new java.io.File(s"$root/tbl/_commits/v00000001")
      // A: merges, creates the v1 marker, then stalls inside the token
      // write until the gate file appears
      GraftTestFileSystem.stallCreateWhenPathContains =
        Some(("_commits/v00000001", gate.getPath))
      val a = Future(intercept[SnapshotStore.ConcurrentWriteException] {
        SnapshotStore.upsertVersion(spark,
          Seq((2L, "from_A")).toDF("k", "v"), "k", None, dir, 1L)
      })
      var waited = 0
      while ((GraftTestFileSystem.stallCreateWhenPathContains.isDefined ||
              !marker1.exists()) && waited < 60000) {
        Thread.sleep(20); waited += 20
      }
      assert(marker1.exists() && marker1.length() == 0,
        "A never reached its stalled marker create")
      // B: past the (tiny) grace + claim TTLs, heals A's empty marker,
      // reclaims A's claim, and commits v1
      spark.conf.set("spark.graft.snapshot.commitGraceMs", "1")
      spark.conf.set("spark.graft.snapshot.claimTtlMs", "1")
      Thread.sleep(10)
      SnapshotStore.upsertVersion(spark,
        Seq((3L, "from_B")).toDF("k", "v"), "k", None, dir, 1L)
      // release A: its token write + close succeed against the unlinked
      // file; the read-back sees B's token and A loses LOUDLY
      assert(gate.createNewFile())
      val aErr = Await.result(a, 120.seconds)
      assert(aErr.getMessage.contains("grace-reclaimed"))
      // exactly one commit survived, and it is B's
      assert(SnapshotStore.latestVersion(spark, dir).contains(1L))
      assert(SnapshotStore.read(spark, dir).get.as[(Long, String)]
        .collect().toSet == Set((1L, "base"), (3L, "from_B")))
    } finally {
      GraftTestFileSystem.stallCreateWhenPathContains = None
      spark.conf.unset("spark.graft.snapshot.commitGraceMs")
      spark.conf.unset("spark.graft.snapshot.claimTtlMs")
      spark.conf.unset("spark.graft.snapshot.atomicCreateSchemes")
    }
  }

  test("retention sweeps LOSER manifest files below the horizon, keeps every winner") {
    import spark.implicits._
    val dir = scratchDir("snap_loser_m") + "/tbl"
    SnapshotStore.upsertVersion(spark,
      Seq((1L, "a")).toDF("k", "v"), "k", None, dir, 0L, retain = 2)
    // a CAS loser's orphan manifest for slot 0 (its token never won)
    val loser = new java.io.File(
      s"$dir/_commits/.m-v00000000-deadbeefdeadbeef")
    assert(loser.createNewFile())
    SnapshotStore.upsertVersion(spark,
      Seq((1L, "b")).toDF("k", "v"), "k", None, dir, 1L, retain = 2)
    assert(loser.exists(), "slot 0 is still inside the retention window")
    SnapshotStore.upsertVersion(spark,
      Seq((1L, "c")).toDF("k", "v"), "k", None, dir, 2L, retain = 2)
    // v0 fell below the horizon: the loser file is swept, the three
    // WINNING manifests survive (history stays resolvable forever)
    assert(!loser.exists(), "loser manifest below the horizon must sweep")
    val names = new java.io.File(s"$dir/_commits").list().toSeq
    assert(names.count(_.matches("\\.m-v\\d{8,}-[0-9a-f]+")) == 3)
    assert(SnapshotStore.versions(spark, dir) == Seq(0L, 1L, 2L))
    // every committed manifest still parses: v0's data is pruned, so its
    // time-travel read must refuse with the RETENTION message (reaching
    // it requires the manifest to have read back fine), and v1/v2 read
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.readVersion(spark, dir, 0L)
    }
    assert(e.getMessage.contains("retention window"))
    (1L to 2L).foreach(v =>
      assert(SnapshotStore.readVersion(spark, dir, v).count() == 1L))
    assert(SnapshotStore.read(spark, dir).get.as[(Long, String)]
      .collect().toSet == Set((1L, "c")))
  }

  test("OCC: a crashed writer's stale claim is reclaimed after the TTL") {
    import spark.implicits._
    val dir = scratchDir("snap_occ_ttl") + "/tbl"
    SnapshotStore.upsertVersion(spark,
      Seq((1L, "a")).toDF("k", "v"), "k", None, dir, 0L)
    val claim = new java.io.File(s"$dir/_claims/v00000001")
    claim.getParentFile.mkdirs()
    assert(claim.createNewFile()) // leftover of a crashed writer
    spark.conf.set("spark.graft.snapshot.claimTtlMs", "1")
    try {
      Thread.sleep(10) // age past the 1 ms TTL
      SnapshotStore.upsertVersion(spark,
        Seq((2L, "b")).toDF("k", "v"), "k", None, dir, 1L)
      assert(SnapshotStore.latestVersion(spark, dir).contains(1L))
    } finally spark.conf.unset("spark.graft.snapshot.claimTtlMs")
  }
}
