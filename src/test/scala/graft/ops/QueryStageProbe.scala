package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch probe (test scope, not shipped): per-stage/job breakdown for
  * arbitrary SparkEntry bench queries — task counts expose parallelism
  * collapse (few-task stages doing heavy compute), per-stage run time
  * vs wall exposes scheduling/planning gaps. PROBE_NO_COALESCE=1 turns
  * off AQE partition coalescing to separate "AQE collapsed it" from
  * "the scan had one split" (the batch-4 diagnosis).
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.ops.QueryStageProbe /root/testdata/sf0.1 q_pmi_top q_containment"
  */
object QueryStageProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryStageProbe <sfDir> <query>...")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val noCoalesce = sys.env.get("PROBE_NO_COALESCE").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.enabled", (!noCoalesce).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.AuxTables.ensure(spark, sfDir)

    @volatile var jobs = List.empty[(Int, Long, Long)]
    @volatile var stages = List.empty[(Int, Long, Int, Long, Long)] // id, runMs, tasks, inRows, outRows
    val listener = new SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(e: SparkListenerJobStart): Unit = starts.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs ::= ((e.jobId, Option(starts.get(e.jobId)).getOrElse(0L), e.time))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val in = si.taskMetrics.inputMetrics.recordsRead +
          si.taskMetrics.shuffleReadMetrics.recordsRead
        val out = si.taskMetrics.shuffleWriteMetrics.recordsWritten
        stages ::= ((si.stageId, ms, si.numTasks, in, out))
      }
    }

    // session warm-up like Bench
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm pass
      jobs = Nil; stages = Nil
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      val ss = stages.sortBy(_._1)
      println(f"[probe] $name: wall=$wall%.3f s rows=$n jobs=${jobs.size} stages=${ss.size} stage-sum=${ss.map(_._2).sum / 1e3}%.3f s")
      ss.foreach { case (id, ms, nt, in, out) =>
        println(f"  stage $id%4d: ${ms / 1e3}%7.3f s  $nt%3d tasks  in=$in%9d out=$out%9d")
      }
    }
    spark.stop()
  }
}
