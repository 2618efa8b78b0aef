package graft.pipeline

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink operators registered in the correctness gate: schema'd
  * CSV ingestion (SURVEY.md §2.1 S1) and the date-partitioned parquet
  * sink (S3), each proven by a write→read round trip whose result is
  * oracle-compared against the original table.
  *
  * The round trips write under java.io.tmpdir (keyed by a per-process
  * UUID plus the sf dir) — harness-scoped scratch, deterministic
  * content, never shared between concurrent JVMs, deleted on JVM exit.
  * Timestamps travel as epoch-microsecond BIGINTs: the raw events table
  * is nanosecond-precision, and µs-truncated integers compare exactly
  * across Spark (`unix_micros`, after Tables.events' ns→µs truncation)
  * and DuckDB (`epoch_ns // 1000`).
  */
object Sources extends QueryModule {

  /** Per-JVM unique component: two concurrent runs over the same sf dir
    * (e.g. the driver gate plus a dev run) must never race overwrite
    * writes against reads of the same scratch path. The whole per-JVM
    * root is removed on shutdown; because a SIGKILL/OOM-kill skips the
    * shutdown hook, root creation also best-effort sweeps sibling
    * `graft_*` dirs that have been idle for over a day — crashed runs
    * must not turn unique dirs into an unbounded tmp leak.
    */
  private lazy val procRoot: java.io.File = {
    val tmpDir = new java.io.File(sys.props("java.io.tmpdir"))
    val dayAgo = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(tmpDir.listFiles()).getOrElse(Array.empty).foreach { f =>
      // mtime alone is not enough: a sibling JVM mid-way through a
      // single >24h query never re-touches its root, so each root holds
      // a `_pid` liveness marker — only a stale root whose owner process
      // is provably gone is swept
      if (f.getName.startsWith("graft_") && f.isDirectory
          && f.lastModified() < dayAgo && !ownerAlive(f))
        org.apache.commons.io.FileUtils.deleteQuietly(f)
    }
    val root = new java.io.File(
      tmpDir, s"graft_${java.util.UUID.randomUUID().toString.take(8)}")
    root.mkdirs()
    java.nio.file.Files.write(root.toPath.resolve("_pid"),
      ProcessHandle.current().pid().toString.getBytes("UTF-8"))
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(root)))
    root
  }

  /** True iff the root's `_pid` marker names a live process. A missing
    * or unreadable marker means a crashed/legacy run: not alive.
    */
  private def ownerAlive(root: java.io.File): Boolean =
    try {
      val pid = new String(java.nio.file.Files.readAllBytes(
        root.toPath.resolve("_pid")), "UTF-8").trim.toLong
      ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
    } catch { case scala.util.control.NonFatal(_) => false }

  private[graft] def scratch(d: String, tag: String): String = {
    // keep the root's mtime live: writes land in nested subdirs, which
    // do NOT update the root's own mtime — without the touch, a soak
    // run >24h could be swept by a newly starting sibling JVM
    procRoot.setLastModified(System.currentTimeMillis())
    s"$procRoot/$tag${d.replaceAll("[^A-Za-z0-9.-]", "_")}"
  }

  /** Typed schema for the CSV read-back (S1: declared schema, FAILFAST —
    * the strict path; EventsPipeline.readCsv covers PERMISSIVE).
    */
  private val csvSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  override def queries: Seq[GraftQuery] = Seq(

    // ───── S1: CSV sink → schema'd FAILFAST scan → typed rows ─────
    GraftQuery(
      "src_csv_roundtrip",
      (s, d) => {
        val tmp = scratch(d, "csv_")
        Tables.events(s, d)
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
            col("user_id"), col("event_type"), col("value"))
          .write.mode("overwrite").option("header", "true").csv(tmp)
        s.read
          .option("header", "true")
          .option("mode", "FAILFAST")
          .schema(csvSchema)
          .csv(tmp)
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, epoch_ns(ts) // 1000 AS ts_us, user_id, event_type, value
        FROM events ORDER BY event_id
      """)),

    // ───── raw-file ingest: the binaryFile source (multimodal path) ─────
    // The lake's raw-object ingest surface: files land as opaque bytes
    // and enter the engine via `format("binaryFile")` as (path, length,
    // content) rows — exactly how image/audio corpora arrive before the
    // mm_* decode operators take over. The round trip stages each doc's
    // text as its own file (a distributed partitioned text write — one
    // dir per key, never a driver loop), reads the directory back as
    // binary, recovers the key from the file PATH, and proves
    // byte-level fidelity by sha256: the oracle computes the same
    // digest from the table directly (the text sink appends one
    // newline, stated explicitly on both sides). Corpus is capped to
    // doc_id < 200 because one-file-per-record is the SMALL-corpus
    // layout by design — at scale raw bytes ride parquet binary
    // columns (mm_binary_meta) and this source is the on-ramp.
    GraftQuery(
      "src_binaryfile_ingest",
      (s, d) => {
        val tmp = scratch(d, "binf_")
        Tables.documents(s, d)
          .filter(col("doc_id") < 200)
          .select(col("doc_id"), col("text"))
          .repartition(4)
          .write.mode("overwrite").partitionBy("doc_id").text(tmp)
        s.read.format("binaryFile").load(s"$tmp/doc_id=*")
          .select(
            regexp_extract(col("path"), "doc_id=(\\d+)", 1)
              .cast("long").as("doc_id"),
            col("length").as("n_bytes"),
            sha2(col("content"), 256).as("sha"))
          .groupBy(col("doc_id"))
          // a doc's dir may hold several part files only if the writer
          // split it (it cannot: one row per doc) — the agg makes the
          // one-file-per-doc contract checkable as n_files
          .agg(count(lit(1)).as("n_files"), sum(col("n_bytes")).as("n_bytes"),
            min(col("sha")).as("sha"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, CAST(1 AS BIGINT) AS n_files,
               CAST(strlen(text) + 1 AS BIGINT) AS n_bytes,
               sha256(text || chr(10)) AS sha
        FROM documents WHERE doc_id < 200 ORDER BY doc_id
      """)),

    // ───── S3: date-partitioned parquet append sink + pruned read-back ─────
    // Writes the orders table partitioned by month, reads back ONE
    // partition; the scan must prune to that directory (visible as
    // PartitionFilters in the plan), which is the layout the reference's
    // sink lacked (unindexed row store, init.sql:1-17).
    GraftQuery(
      "sink_partitioned_roundtrip",
      (s, d) => {
        val tmp = scratch(d, "sink_")
        Tables.orders(s, d)
          .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
          .repartition(col("o_month"))
          .write.mode("overwrite").partitionBy("o_month").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("o_month") === "1997-03")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_month"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE strftime(o_orderdate, '%Y-%m') = '1997-03'
        ORDER BY o_orderkey
      """))
  )
}
