package graft.pipeline

/** Manual timing probe for the cold-tail entity-link query (run with
  * `sbt "Test/runMain graft.pipeline.ColdLinkProbe"`). Round-4 findings,
  * for the bench record: the ~7 s steady-state cost of
  * q_kg_entitylink_cold is the salted SMJ itself (sorting the ×salt
  * exploded dictionary — ~2.6M rows at salt=8 — measures 3.8-7.3 s warm;
  * mentions/hot-split/explode are each <3 s). That sort IS the 100 TB
  * plan shape being exercised on purpose; at scale it spreads over the
  * cluster, and the hot head (the only skewed keys) never enters it. */
object ColdLinkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.01"
    val aux = graft.AuxTables.ensure(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }
    import spark.implicits._
    val triples = spark.read.parquet(s"$aux/triples").as[Triple]
    val bigDict = spark.read.parquet(s"$aux/big_dict")
    time("warm mentions")(GraphMaterialize.mentions(triples).count())
    time("warm dict")(bigDict.count())
    for (i <- 1 to 3) {
      time(s"full cold link pass $i") {
        GraphMaterialize.linkEntitiesScalable(
          GraphMaterialize.mentions(triples), bigDict, hotMentionCount = 8L, salt = 8)
          .groupBy(coalesce(col("entity"), lit("(unlinked)")).as("entity"))
          .agg(count(lit(1)).as("n_mentions")).count()
      }
    }
    // components
    val m = GraphMaterialize.mentions(triples).select(col("surface"), col("subj"))
    val dict = bigDict.select(lower(col("surface")).as("surface"), col("entity"))
    val hotSurfaces = m.groupBy(col("surface")).agg(count(lit(1)).as("n_m"))
      .filter(col("n_m") >= 8).select(col("surface"))
    time("hotSurfaces")(hotSurfaces.count())
    val saltedDict = dict.join(broadcast(hotSurfaces), Seq("surface"), "left_anti")
      .withColumn("salt_b", explode(array((0 until 8).map(lit): _*)))
    time("saltedDict explode")(saltedDict.count())
    val saltedMentions = m.join(broadcast(hotSurfaces), Seq("surface"), "left_anti")
      .withColumn("salt_b", pmod(hash(col("subj")), lit(8)))
    time("cold SMJ join") {
      saltedMentions.join(saltedDict.hint("merge"), Seq("surface", "salt_b"), "left").count()
    }
    time("cold SMJ join again") {
      saltedMentions.join(saltedDict.hint("merge"), Seq("surface", "salt_b"), "left").count()
    }
  }
}
