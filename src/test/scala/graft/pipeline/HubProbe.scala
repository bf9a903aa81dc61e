package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (test scope, not shipped): where does q_kg_hubs spend
  * its ~1.3 s? Times the edge build vs each fixed-point iteration.
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.pipeline.HubProbe /root/testdata/sf0.1"
  */
object HubProbe {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }
    // warmup
    spark.read.parquet(s"$aux/triples").count()
    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      val triples = spark.read.parquet(s"$aux/triples")
      val edges = triples
        .filter(col("objKind") === 0 && col("subj") =!= col("objValue"))
        .select(col("subj").as("src"), col("objValue").as("dst"))
        .distinct()
      val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      val withDeg = time("withDeg ckpt-lazy construct") {
        edges.join(outDeg, Seq("src")).localCheckpoint(false)
      }
      val nodes = time("nodes ckpt-lazy construct") {
        edges.select(col("src").as("node"))
          .unionByName(edges.select(col("dst").as("node")))
          .distinct().localCheckpoint(false)
      }
      var scores = nodes.select(col("node"), lit(1000000000L).as("score"))
      for (i <- 1 to 6) {
        scores = time(s"iter $i construct+ckpt") {
          val inSums = withDeg
            .join(scores.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"), expr("score div d").as("c"))
            .groupBy(col("node")).agg(sum(col("c")).as("insum"))
          nodes.join(inSums, Seq("node"), "left")
            .select(col("node"),
              (lit(150000000L) + expr("(85 * coalesce(insum, 0L)) div 100")).as("score"))
            .localCheckpoint(false)
        }
      }
      time("final action (orderBy limit count)") {
        scores.orderBy(col("score").desc, col("node")).limit(100).count()
      }

      // ---- co-partitioned variant: one exchange per iteration ----
      println(s"== pass $pass co-partitioned ==")
      val p = spark.sessionState.conf.numShufflePartitions
      val withDegP = time("withDegP ckpt") {
        edges.join(outDeg, Seq("src"))
          .repartition(p, col("src")).localCheckpoint(false)
      }
      val nodesP = time("nodesP ckpt") {
        edges.select(col("src").as("node"))
          .unionByName(edges.select(col("dst").as("node")))
          .distinct()
          .repartition(p, col("node")).localCheckpoint(false)
      }
      var scoresP = nodesP.select(col("node"), lit(1000000000L).as("score"))
      for (i <- 1 to 6) {
        scoresP = time(s"iterP $i construct+ckpt") {
          val inSums = withDegP
            .join(scoresP.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"), expr("score div d").as("c"))
            .groupBy(col("node")).agg(sum(col("c")).as("insum"))
          nodesP.join(inSums, Seq("node"), "left")
            .select(col("node"),
              (lit(150000000L) + expr("(85 * coalesce(insum, 0L)) div 100")).as("score"))
            .localCheckpoint(false)
        }
      }
      time("final action P") {
        scoresP.orderBy(col("score").desc, col("node")).limit(100).count()
      }
      // ---- checkpoint-every-k variant ----
      for (k <- Seq(2, 3, 6)) {
        println(s"== pass $pass ckpt-every-$k ==")
        val withDeg2 = time("withDeg ckpt") {
          edges.join(outDeg, Seq("src")).localCheckpoint(false)
        }
        val nodes2 = time("nodes ckpt") {
          edges.select(col("src").as("node"))
            .unionByName(edges.select(col("dst").as("node")))
            .distinct().localCheckpoint(false)
        }
        var sc2 = nodes2.select(col("node"), lit(1000000000L).as("score"))
        val tAll = System.nanoTime()
        for (i <- 1 to 6) {
          val it = withDeg2
            .join(sc2.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"), expr("score div d").as("c"))
            .groupBy(col("node")).agg(sum(col("c")).as("insum"))
          sc2 = nodes2.join(it, Seq("node"), "left")
            .select(col("node"),
              (lit(150000000L) + expr("(85 * coalesce(insum, 0L)) div 100")).as("score"))
          if (i % k == 0 && i < 6) sc2 = sc2.localCheckpoint(false)
        }
        val n = sc2.orderBy(col("score").desc, col("node")).limit(100).count()
        println(f"[probe] every-$k total iters+action: ${(System.nanoTime() - tAll) / 1e9}%.3f s (n=$n)")
      }
    }
    spark.stop()
  }
}
