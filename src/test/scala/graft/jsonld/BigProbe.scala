package graft.jsonld

import org.apache.spark.sql.SparkSession
import graft.pipeline._

object BigProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0) else "32"
    val n = if (args.length > 1) args(1).toLong else 6000000L
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s (n=$r)")
    }
    val P = 256
    time("warmup-small")(TripleEmit.pipeline(PageGen.pages(spark, 10000, 7L, 32)).count())
    time("gen only")(PageGen.pages(spark, n, 42L, P).count())
    time("triples no dedup")(
      TripleEmit.triplesFused(PageGen.pages(spark, n, 42L, P)).count())
    time("full with dedup")(
      TripleEmit.pipeline(PageGen.pages(spark, n, 42L, P)).count())
    spark.stop()
  }
}
