package graft.pipeline

/** Manual probe: runs the q_kg_closure driver query standalone. */
object ClosureProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_kg_closure")(spark, "/root/testdata/sf0.001")
    df.coalesce(1).write.mode("overwrite").parquet("/tmp/closure_probe")
    println("rows = " + spark.read.parquet("/tmp/closure_probe").count())
    spark.stop()
  }
}
