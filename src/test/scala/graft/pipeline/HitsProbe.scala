package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: HITS step shapes — (a) r6 current (lazy ckpts + driver
  * max collect per half-step), (b) collect-free (1-row max frame joined
  * via broadcast nested loop, whole fixed point one lazy plan chain).
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.pipeline.HitsProbe /root/testdata/sf0.1"
  */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val aux = graft.AuxTables.ensure(spark, sfDir)
    spark.read.parquet(s"$aux/triples").count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }
    (1 to 3).foreach { pass =>
      val triples = spark.read.parquet(s"$aux/triples")
      time(s"pass $pass current (driver max)") {
        GraphMaterialize.hitsScores(triples, 3)
          .orderBy(col("auth").desc, col("hub").desc, col("node")).limit(100).count()
      }
      time(s"pass $pass collect-free") {
        hitsNoCollect(triples, 3)
          .orderBy(col("auth").desc, col("hub").desc, col("node")).limit(100).count()
      }
    }
    spark.stop()
  }

  def hitsNoCollect(triples: DataFrame, iterations: Int): DataFrame = {
    val edges = triples
      .filter(col("objKind") === 0 && col("subj") =!= col("objValue"))
      .select(col("subj").as("src"), col("objValue").as("dst"))
      .distinct().localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    def halfStep(scores: DataFrame, scoreCol: String, joinSide: String,
        emitSide: String, outCol: String): DataFrame = {
      val raw = edges
        .join(scores.withColumnRenamed("node", joinSide), Seq(joinSide))
        .groupBy(col(emitSide).as("node"))
        .agg(sum(col(scoreCol)).as("raw"))
        .localCheckpoint(false)
      val mx = raw.agg(greatest(max(col("raw")), lit(1L)).as("mx"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(mx))
        .select(col("node"),
          expr("(coalesce(raw, 0L) * 1000000) div mx").as(outCol))
        .localCheckpoint(false)
    }
    var hub = nodes.select(col("node"), lit(1000000L).as("h"))
    var auth = nodes.select(col("node"), lit(0L).as("a"))
    for (_ <- 1 to iterations) {
      auth = halfStep(hub, "h", "src", "dst", "a")
      hub = halfStep(auth, "a", "dst", "src", "h")
    }
    nodes.join(auth, Seq("node")).join(hub, Seq("node"))
      .select(col("node"), col("a").as("auth"), col("h").as("hub"))
  }
}
