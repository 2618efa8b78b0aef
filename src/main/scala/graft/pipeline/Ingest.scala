package graft.pipeline

import java.security.MessageDigest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** File-ingestion step (SURVEY.md §2.1 S4/S5): stage raw files into a
  * landing prefix with a sha256 integrity manifest, creating the landing
  * area if absent. Re-expresses the reference's MinIO upload step
  * (/root/reference/dags/ingestion/ingestion.py:30-93) on the Hadoop
  * FileSystem API, so the same code runs on local disk in tests and on
  * s3a:// at scale.
  *
  * Differences from the reference, deliberate:
  *  - no silent exception swallow: a failed copy fails the run;
  *  - the source file is moved (rename) rather than copied-then-deleted,
  *    which is atomic on HDFS-like stores;
  *  - the checksum manifest is written next to the landing prefix so the
  *    pipeline (and audits) can verify payload integrity later.
  */
object Ingest {

  final case class IngestedFile(name: String, sha256: String, nBytes: Long)

  private def fs(conf: Configuration, p: Path): FileSystem = p.getFileSystem(conf)

  /** S5: create the landing area if it doesn't exist. Returns true if
    * newly created.
    */
  def bootstrap(conf: Configuration, landingDir: String): Boolean = {
    val p = new Path(landingDir)
    val f = fs(conf, p)
    if (f.exists(p)) false else f.mkdirs(p)
  }

  /** Streaming sha256 of one file (bounded memory — 64 KiB buffer). */
  def sha256(conf: Configuration, file: Path): String = {
    val f  = fs(conf, file)
    val md = MessageDigest.getInstance("SHA-256")
    val in = f.open(file)
    try {
      val buf = new Array[Byte](64 * 1024)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0)
        .foreach(n => md.update(buf, 0, n))
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** S4: move every *.csv under srcDir into landingDir, checksumming each,
    * and write a `_manifest.csv` (name,sha256,n_bytes) into landingDir.
    * Returns the ingested files in name order (deterministic).
    */
  def ingest(conf: Configuration, srcDir: String, landingDir: String): Seq[IngestedFile] = {
    bootstrap(conf, landingDir)
    val src  = new Path(srcDir)
    val dst  = new Path(landingDir)
    val f    = fs(conf, src)
    val files = f.listStatus(src).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".csv"))
      .sortBy(_.getPath.getName)
    val ingested = files.map { st =>
      val p   = st.getPath
      val sum = sha256(conf, p)
      val to  = new Path(dst, p.getName)
      if (!f.rename(p, to))
        sys.error(s"ingest: rename failed for $p -> $to")
      IngestedFile(p.getName, sum, st.getLen)
    }
    if (ingested.nonEmpty) {
      val manifest = new Path(dst, "_manifest.csv")
      val out = fs(conf, manifest).create(manifest, true)
      try {
        out.write("name,sha256,n_bytes\n".getBytes("UTF-8"))
        ingested.foreach { i =>
          out.write(s"${i.name},${i.sha256},${i.nBytes}\n".getBytes("UTF-8"))
        }
      } finally out.close()
    }
    ingested
  }
}
