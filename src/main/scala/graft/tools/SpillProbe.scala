package graft.tools

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage cost attribution for one SparkEntry query: task-time skew
  * (max vs median), shuffle record volumes, and spill bytes — the
  * evidence that separates "per-pair work got slower" into its real
  * causes (skewed buckets starving the task wave vs hash-agg spill vs
  * plain output volume). Used for the SCALE.md attributions; run at 1x
  * (the testdata dir) and at the replicated Nx dir FullScaleBench
  * builds, and diff the phase tables.
  *
  * Usage: runMain graft.tools.SpillProbe <sfDir> <query> [repeat]
  */
object SpillProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val taskMs = TrieMap.empty[Int, ArrayBuffer[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val buf = taskMs.getOrElseUpdate(t.stageId, ArrayBuffer.empty[Long])
        buf.synchronized { buf += t.taskInfo.duration: Unit }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val tm = si.taskMetrics
        val ts = taskMs.getOrElse(si.stageId, ArrayBuffer.empty[Long])
          .sorted
        val med = if (ts.isEmpty) 0L else ts(ts.size / 2)
        val mx = if (ts.isEmpty) 0L else ts.last
        println(
          f"[stage ${si.stageId}%3d] tasks=${si.numTasks}%3d " +
            f"med=${med}%6d ms max=${mx}%6d ms skew=${
              if (med > 0) mx.toDouble / med else 0.0}%5.1f | " +
            f"sRdRec=${tm.shuffleReadMetrics.recordsRead}%12d " +
            f"sWrRec=${tm.shuffleWriteMetrics.recordsWritten}%12d " +
            f"outRec=${tm.outputMetrics.recordsWritten}%12d | " +
            f"memSpill=${tm.memoryBytesSpilled / (1 << 20)}%6d MB " +
            f"diskSpill=${tm.diskBytesSpilled / (1 << 20)}%6d MB | ${si.name}")
      }
    }
    spark.sparkContext.addSparkListener(listener)

    (1 to repeat).foreach { i =>
      taskMs.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(qname)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[run $i] $qname rows=$n took=$sec%.2f s")
    }
    spark.stop()
  }
}
