package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session for the whole suite run (sbt forks a single test
  * JVM): same config surface as GraftSession, smaller parallelism so
  * tiny-frame tests don't pay 32-way scheduling.
  */
object TestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_test_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  /** Smallest driver-generated fixture (TESTDATA.md). */
  val sfTiny = "/root/testdata/sf0.001"

  /** Scratch dir unique per test class, wiped on creation. */
  def scratchDir(tag: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_test_$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}
