package graft.pipeline

/** Manual probe: formatted plans for the sameAs merge + characteristic
  * sets queries (run with AQE off via -Dspark args if static shapes are
  * wanted; default session settings otherwise). */
object SameAsPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.maxMetadataStringLength", "500")
    for (q <- Seq("q_kg_sameas", "q_kg_charsets", "q_kg_intervals",
        "q_kg_schemagraph", "q_kg_applydelta", "q_kg_negatives")) {
      println(s"========== $q ==========")
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.explain("formatted")
      println("rows = " + df.count())
    }
    spark.stop()
  }
}
