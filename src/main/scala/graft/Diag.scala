package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Variance diagnostics: run one query N times in a single JVM under
  * Bench-identical hygiene (clearResidue between runs, toRdd force) with
  * a stage-level listener, printing per-run wall time plus the stage
  * census — stage count, task count, summed executor run time, shuffle
  * read/write bytes. A slow run's census shows WHERE the extra time went
  * (an extra exchange that should have been reused, a replanned join, a
  * skewed stage), which a wall-clock number alone cannot.
  *
  * Usage: graft.Diag <sfDir> <n> qid1 [qid2 ...]
  * Prints one line per run: qid run sec stages tasks taskSec shufR shufW
  * and, with SPARK_GRAFT_DIAG_STAGES=1, one line per completed stage.
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val qids = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000") // match Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, Long, Long, Long, Long, Long, Long)]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += ((si.name.takeWhile(_ != '\n'), si.numTasks,
            m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.jvmGCTime,
            si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L)))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def clearResidue(): Unit = {
      ops.Dedup.clearCaches()
      ops.TextAnalysis.clearCaches()
      ops.Curation.clearCaches(spark)
      ops.Graph.clearCaches()
      ops.Similarity.clearPersists(spark)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val perStage = sys.env.get("SPARK_GRAFT_DIAG_STAGES").contains("1")
    // interleave=1 reproduces the bench's suite context (rep loop outside,
    // qids cycled inside, in the given order) instead of isolating a qid
    val interleave = sys.env.get("SPARK_GRAFT_DIAG_INTERLEAVE").contains("1")
    val schedule: Seq[(String, Int)] =
      if (interleave) (1 to n).flatMap(i => qids.map(q => (q, i)))
      else qids.flatMap(q => (1 to n).map(i => (q, i)))
    for ((qid, i) <- schedule) {
      val fn = SparkEntry.queries(qid)
      locally {
        clearResidue()
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        try fn(spark, sfDir).queryExecution.toRdd.count()
        catch { case e: Throwable => println(s"ERR $qid: $e") }
        val sec = (System.nanoTime() - t0) / 1e9
        // stage completions arrive async on the listener bus; give it a
        // beat to drain (diagnostic tool — a lost straggler event only
        // undercounts that run's census, never the wall time)
        Thread.sleep(300)
        val snap = stages.synchronized(stages.toVector)
        val taskSec = snap.map(_._3).sum / 1e3
        println(f"RUN $qid%-24s $i%2d sec=$sec%7.3f stages=${snap.size}%3d " +
          f"tasks=${snap.map(_._2).sum}%5d taskSec=$taskSec%8.2f " +
          f"gcSec=${snap.map(_._6).sum / 1e3}%6.2f " +
          f"shufR=${snap.map(_._4).sum / 1048576}%6dMB " +
          f"shufW=${snap.map(_._5).sum / 1048576}%6dMB")
        if (perStage)
          for (((nm, nt, rt, sr, sw, gc, sub, comp), j) <- snap.zipWithIndex)
            println(f"  ST $j%3d $nt%4dt run=${rt / 1e3}%7.2fs " +
              f"wall=${(comp - sub) / 1e3}%6.2fs gc=${gc / 1e3}%5.2fs " +
              f"r=${sr / 1048576}%5dMB w=${sw / 1048576}%5dMB  $nm")
      }
    }
    spark.stop()
  }
}
