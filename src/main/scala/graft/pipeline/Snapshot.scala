package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned keyed snapshot on plain parquet: the minimal table-format
  * core (versioned data dirs + an append-only commit log) that makes a
  * continuously-upserted lake table safe without a heavyweight format.
  *
  * Layout:
  * {{{
  *   dir/v00000007/        parquet data for version 7
  *   dir/_commits/v00000007   empty marker, created AFTER the data dir
  * }}}
  *
  * Readers resolve max(committed version) and read only that dir, so a
  * writer crashing mid-write leaves an orphan data dir that is simply
  * never visible — no mutable pointer file, no rename-atomicity
  * assumption (S3A-safe: markers are create-once, never renamed or
  * overwritten). A RETRIED version commit (same version number, e.g. a
  * replayed foreachBatch) short-circuits on the existing marker, which
  * is what turns streaming's at-least-once batch delivery into an
  * exactly-once snapshot.
  *
  * Single-writer contract: one writer per snapshot dir (a streaming
  * query IS single-writer per checkpoint). Concurrent writers would race
  * version numbers — coordination is the caller's job, as in any
  * single-log table format.
  */
object SnapshotStore {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionName(v: Long): String = f"v$v%08d"

  def versionDir(dir: String, v: Long): String = s"$dir/${versionName(v)}"

  private def markerPath(dir: String, v: Long): Path =
    new Path(s"$dir/_commits/${versionName(v)}")

  private val versionPat = "v(\\d{8,})".r

  /** Highest committed version, if any commit exists. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val commits = new Path(s"$dir/_commits")
    val f = fs(spark, dir)
    if (!f.exists(commits)) None
    else f.listStatus(commits)
      .map(_.getPath.getName)
      .collect { case versionPat(n) => n.toLong }
      .reduceOption(_ max _)
  }

  /** The current snapshot contents (None before the first commit). */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    latestVersion(spark, dir).map(v => spark.read.parquet(versionDir(dir, v)))

  /** Merge `delta` into the snapshot as `version` (idempotent: a version
    * already committed is a no-op, so at-least-once callers get an
    * exactly-once snapshot). Delta rows win over snapshot rows on `key`;
    * new keys append. Within the delta, the row with the highest
    * `seqCol` per key wins, with an md5-of-row tiebreak on equal seq so
    * replays pick the SAME winner (deterministic snapshot contents);
    * pass a delta already unique on `key` to skip that pass.
    * After committing, data dirs older than the `retain` most recent
    * committed versions are deleted (their markers stay, so version
    * history remains auditable).
    *
    * Replay vs collision: at-least-once streaming can only replay the
    * LAST committed batch, so version == latest no-ops (the replay) but
    * version < latest throws — that is a writer running against a
    * checkpoint that was reset while the snapshot dir survived, and a
    * silent no-op there would discard every batch whose id collides
    * with an old marker. (The one undetectable case is a reset
    * checkpoint colliding on the very latest version; recovery from a
    * checkpoint loss is to also start a fresh snapshot dir or
    * re-point `retain`-aware tooling at the old one.)
    */
  def upsertVersion(spark: SparkSession, delta: DataFrame, key: String,
                    seqCol: Option[String], dir: String, version: Long,
                    retain: Int = 2): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val f = fs(spark, dir)
    val latest = latestVersion(spark, dir)
    if (latest.contains(version)) return // replay of the last batch
    require(latest.forall(_ < version),
      s"version $version collides below committed ${latest.get}: the " +
        "checkpoint driving this writer was reset against a live snapshot " +
        "dir (single-writer, monotone-version contract)")

    val deltaLatest = seqCol match {
      case Some(seq) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{col, md5, row_number, struct, to_json}
        delta.withColumn("_rn", row_number().over(
            Window.partitionBy(col(key))
              .orderBy(col(seq).desc, md5(to_json(struct(delta.columns.map(col): _*))))))
          .filter(col("_rn") === 1).drop("_rn")
      case None => delta
    }
    val merged = read(spark, dir) match {
      case Some(base) => Layout.upsert(base, deltaLatest, key)
      case None       => deltaLatest
    }
    merged.write.mode("overwrite").parquet(versionDir(dir, version))
    f.mkdirs(new Path(s"$dir/_commits"))
    f.create(markerPath(dir, version), false).close() // create-once: commit
    pruneData(spark, dir, retain)
  }

  /** Delete data dirs of committed versions older than the `retain`
    * newest. Uncommitted orphan dirs (crash leftovers) older than the
    * retention horizon are removed too.
    */
  private def pruneData(spark: SparkSession, dir: String, retain: Int): Unit = {
    val f = fs(spark, dir)
    val commits = new Path(s"$dir/_commits")
    val committed = f.listStatus(commits).map(_.getPath.getName)
      .collect { case versionPat(n) => n.toLong }
    val cutoff = committed.sorted.takeRight(retain).min
    f.listStatus(new Path(dir))
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case versionPat(n) => Some(s.getPath -> n.toLong)
        case _             => None
      })
      .collect { case (p, v) if v < cutoff => p }
      .foreach(p => f.delete(p, true))
  }
}
