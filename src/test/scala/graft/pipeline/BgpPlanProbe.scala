package graft.pipeline

/** Manual probe: formatted plans for the new KG read-side queries. */
object BgpPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.maxMetadataStringLength", "500")
    for (q <- Seq("q_kg_bgp", "q_kg_validate")) {
      println(s"========== $q ==========")
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.explain("formatted")
      println("rows = " + df.count())
    }
    spark.stop()
  }
}
