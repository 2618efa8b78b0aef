package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A second Hadoop FileSystem scheme (`graftfs:`) backed by local disk:
  * registered via `fs.graftfs.impl`, it lets the suite prove the
  * ingest/pipeline code is FileSystem-agnostic — every path round-trips
  * through `Path.getFileSystem` with a non-default scheme, exactly the
  * substitution an `s3a://` or `hdfs://` deployment makes. (S3A's rename
  * is copy+delete, i.e. non-atomic — see SCALE.md for the archival
  * implication; this stand-in tests scheme plumbing, not S3 semantics.)
  */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
