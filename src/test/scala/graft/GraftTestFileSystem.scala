package graft

import java.net.URI

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** A second Hadoop FileSystem scheme (`graftfs:`) backed by local disk:
  * registered via `fs.graftfs.impl`, it lets the suite prove the
  * ingest/pipeline code is FileSystem-agnostic — every path round-trips
  * through `Path.getFileSystem` with a non-default scheme, exactly the
  * substitution an `s3a://` or `hdfs://` deployment makes.
  *
  * Two switchable behaviors emulate S3A rename semantics (the reference
  * deploys against MinIO via S3A, where rename is a non-atomic
  * copy-then-delete — /root/reference/dags/ingestion/ingestion.py):
  *  - [[GraftTestFileSystem.renameIsCopyDelete]] replaces atomic rename
  *    with copy + delete (destination overwritten, like an S3 PUT);
  *  - [[GraftTestFileSystem.crashAfterCopy]] additionally throws ONCE
  *    between the copy and the delete — the S3A crash window that leaves
  *    the file present at BOTH paths. PipelineSpec uses it to prove
  *    archival converges to exactly-once on re-run.
  */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")

  // S3A create semantics: create(overwrite = false) is an existence
  // HEAD at create() with the object PUT at close(), so a second
  // same-path writer passes the "no-overwrite" check and the last
  // close silently replaces the first — the exact non-atomicity that
  // breaks a create-once CAS on object stores. Emulated by forcing
  // overwrite in BOTH public create variants (FileSystem.create(Path,
  // boolean) routes to the non-permission one on RawLocalFileSystem).
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f,
      overwrite || GraftTestFileSystem.createIsCheckThenAct,
      bufferSize, replication, blockSize, progress)

  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, permission,
      overwrite || GraftTestFileSystem.createIsCheckThenAct,
      bufferSize, replication, blockSize, progress)

  // Every create variant funnels through here AFTER its exists-check,
  // with the file just opened on disk: the one-shot stall below fakes
  // a writer that created its commit marker and then GC-paused before
  // its token write (SnapshotSpec's grace-heal race).
  override protected def createOutputStreamWithMode(f: Path,
      append: Boolean,
      permission: org.apache.hadoop.fs.permission.FsPermission)
      : java.io.OutputStream = {
    val out = super.createOutputStreamWithMode(f, append, permission)
    GraftTestFileSystem.stallCreateWhenPathContains.foreach {
      case (tag, gate) =>
        if (f.toString.contains(tag)) {
          GraftTestFileSystem.stallCreateWhenPathContains = None
          var waited = 0
          while (!new java.io.File(gate).exists() && waited < 60000) {
            Thread.sleep(20); waited += 20
          }
        }
    }
    out
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (!GraftTestFileSystem.renameIsCopyDelete) super.rename(src, dst)
    else {
      // copy-delete mode applies to EVERY rename on the scheme — including
      // Spark's FileOutputCommitter task/job commits (which rename whole
      // attempt directories), exactly as S3A without a committer would —
      // so the copy and the delete must both handle directories.
      if (!exists(src)) false
      else {
        FileUtil.copy(this, src, this, dst,
          /* deleteSource = */ false, /* overwrite = */ true, getConf)
        GraftTestFileSystem.crashAfterCopyWhenDstContains.foreach { tag =>
          if (dst.toString.contains(tag)) {
            GraftTestFileSystem.crashAfterCopyWhenDstContains = None
            throw new java.io.IOException(
              "simulated crash between S3A copy and delete")
          }
        }
        delete(src, true)
      }
    }
  }
}

object GraftTestFileSystem {
  /** Emulate S3A: rename = copy bytes + delete source (non-atomic). */
  @volatile var renameIsCopyDelete: Boolean = false
  /** Emulate S3A: create(overwrite=false) is check-then-create, so two
    * same-path writers both succeed (no atomic create-once).
    */
  @volatile var createIsCheckThenAct: Boolean = false
  /** One-shot: the next create whose path contains `_1` blocks (file
    * already created, content not yet writable by the caller) until the
    * gate file `_2` appears — fakes a writer stalled between its marker
    * create and its token write.
    */
  @volatile var stallCreateWhenPathContains: Option[(String, String)] = None
  /** One-shot: the next copy-delete rename whose DESTINATION contains
    * this substring throws after the copy (scopes the simulated crash to
    * e.g. the archival rename, not Spark's own commit renames).
    */
  @volatile var crashAfterCopyWhenDstContains: Option[String] = None
}
