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
  /** One-shot: the next copy-delete rename whose DESTINATION contains
    * this substring throws after the copy (scopes the simulated crash to
    * e.g. the archival rename, not Spark's own commit renames).
    */
  @volatile var crashAfterCopyWhenDstContains: Option[String] = None
}
