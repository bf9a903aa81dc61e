package graft.pipeline

/** Manual probe: repeated q_kg_closure passes in one session — watches
  * for per-pass growth (checkpoint-block accumulation). */
object ClosureRepeatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    for (pass <- 1 to 6) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q_kg_closure")(spark, "/root/testdata/sf0.001").count()
      println(f"pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
