package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (test scope, not shipped): where do q_containment /
  * q_simjoin_exact spend their ~1.6 s? Registers a listener recording
  * every job and stage (submission gaps vs task time) while running the
  * exact bench entry, so the "sequential AQE stage waves" diagnosis in
  * OPTIMIZATION_r06.md is checked against data instead of plan reading.
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.ops.SimJoinStageProbe /root/testdata/sf0.1"
  */
object SimJoinStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    val aux = graft.AuxTables.ensure(spark, sfDir)

    @volatile var jobs = List.empty[(Int, Long, Long)] // id, start, end
    @volatile var stages = List.empty[(Int, String, Long, Int)] // id, name, runMs, tasks
    val listener = new SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs ::= ((e.jobId, Option(starts.get(e.jobId)).getOrElse(0L), e.time))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages ::= ((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms, si.numTasks))
      }
    }

    val sets = spark.read.parquet(s"$aux/shingle_sets")
    println(s"[probe] shingle_sets rows=${sets.count()}")

    def run(label: String)(df: => org.apache.spark.sql.Dataset[_]): Unit = {
      // warm pass outside the listener window
      df.count()
      jobs = Nil; stages = Nil
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val js = jobs.sortBy(_._1)
      val ss = stages.sortBy(_._1)
      println(f"[probe] $label: wall=$wall%.3f s, rows=$n, jobs=${js.size}, stages=${ss.size}")
      val jset = js.map { case (id, s, e) => f"  job $id%3d: ${(e - s) / 1e3}%.3f s" }
      jset.foreach(println)
      ss.foreach { case (id, name, ms, nt) =>
        println(f"  stage $id%4d ($nt%3d tasks, ${ms / 1e3}%7.3f s) $name")
      }
      val stageSum = ss.map(_._3).sum / 1e3
      println(f"[probe] $label: sum-of-stage-runtimes=$stageSum%.3f s vs wall=$wall%.3f s (gap = scheduling/planning)")
    }

    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      run("q_simjoin_exact") {
        DedupOps.prefixSimJoinFromSets(sets, tn = 1, td = 2)
          .orderBy(col("doc_a"), col("doc_b"))
      }
      run("q_containment") {
        DedupOps.containmentJoinFromSets(sets, tn = 4, td = 5, maxDf = 64L)
          .orderBy(col("doc_a"), col("doc_b"))
      }
    }
    spark.stop()
  }
}
