package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-STAGE attribution for one registry query: runs the query under the
  * bench's noop-sink action and prints every completed stage's wall, CPU,
  * GC, shuffle bytes and record counts, sorted by CPU — the local-mode
  * stand-in for the Spark UI's stage table (spark.ui is disabled in
  * GraftSession). Measurement tooling only; not part of the driver
  * contract.
  *
  * Usage: runMain graft.StageProbe <sfDir> <queryName> [reps]
  */
object StageProbe {

  private final case class StageRow(id: Int, name: String, tasks: Int,
      wallMs: Long, cpuMs: Long, gcMs: Long,
      inRec: Long, outRec: Long, srMb: Double, swMb: Double,
      spillMb: Double)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProbe <sfDir> <queryName> [reps]")
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    val spark = GraftSession.get()
    val rows = mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null) rows.synchronized {
          rows += StageRow(si.stageId, si.name, si.numTasks,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            m.executorCpuTime / 1000000, m.jvmGCTime,
            m.inputMetrics.recordsRead, m.outputMetrics.recordsWritten,
            (m.shuffleReadMetrics.remoteBytesRead +
              m.shuffleReadMetrics.localBytesRead) / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
        }
      }
    })
    // warm-up, as in Bench
    (if (new java.io.File(s"$sfDir/lineitem.parquet").exists())
       Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
     else Tables.documents(spark, sfDir).groupBy("lang").count())
      .write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      rows.synchronized(rows.clear())
      System.gc()
      val t0 = System.nanoTime()
      Materialize.scoped {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let stage-completed events drain
      val snap = rows.synchronized(rows.toVector)
      println(f"== STAGEPROBE $name rep $r wall=$wall%.2fs stages=${snap.size} " +
        f"cpuSum=${snap.map(_.cpuMs).sum / 1e3}%.1fs ==")
      snap.sortBy(-_.cpuMs).take(40).foreach { s =>
        val nm = s.name.replaceAll("\\s+", " ").take(90)
        println(f"stage=${s.id}%4d cpu=${s.cpuMs / 1e3}%7.2fs wall=${s.wallMs / 1e3}%6.2fs gc=${s.gcMs / 1e3}%5.1fs tasks=${s.tasks}%4d " +
          f"in=${s.inRec}%10d sr=${s.srMb}%8.1fMB sw=${s.swMb}%8.1fMB spill=${s.spillMb}%8.1fMB $nm")
      }
    }
    spark.stop()
  }
}
