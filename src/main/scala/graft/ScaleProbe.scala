package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level diagnostic runner for scale investigations: executes one
  * registered query under the exact Bench session and prints, per
  * completed stage, the aggregate task runtime / CPU / GC / shuffle and
  * peak memory — the breakdown `Bench`'s per-query totals can't show.
  * Usage: runMain graft.ScaleProbe <sfDir> <query> [query ...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleProbe <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown: ${unknown.mkString(", ")}")
    val spark = GraftSession.get()
    val rows = new ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        rows.add(
          f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%3d " +
            f"run=${m.executorRunTime / 1e3}%8.1fs cpu=${m.executorCpuTime / 1e9}%8.1fs " +
            f"gc=${m.jvmGCTime / 1e3}%7.1fs srMB=${(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead) / 1e6}%8.1f " +
            f"swMB=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f " +
            f"spillMB=${m.memoryBytesSpilled / 1e6}%8.1f  ${i.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    names.foreach { name =>
      rows.clear()
      val t0 = System.nanoTime()
      Materialize.scoped {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      println(s"PROBE $name wall=$wall")
      rows.forEach(r => println(s"PROBE $r"))
    }
    spark.stop()
  }
}
