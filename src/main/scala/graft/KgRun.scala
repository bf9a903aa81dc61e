package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline._

/** End-to-end resumable KG-construction job (the spark-submit entry point
  * of the north rule): pages → pending-partition filter → extract →
  * expand → toRDF → dedup → partitioned write + lineage manifest +
  * adjacency table. Re-running after a crash (or with new input) only
  * processes partitions whose fingerprint is new/changed.
  *
  * Usage: KgRun <outDir> [nPages] [cores]
  */
object KgRun {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/kg_out"
    val nPages = if (args.length > 1) args(1).toLong else 100000L
    val cores = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val triplesPath = s"$outDir/triples"
    val manifestPath = s"$outDir/lineage"
    val adjacencyPath = s"$outDir/adjacency"
    val quarantinePath = s"$outDir/quarantine"

    val pages = PageGen.pages(spark, nPages, 42L, cores.toInt * 4).toDF()
    val manifest = Lineage.readManifest(spark, manifestPath)
    val pending = Lineage.pendingPages(pages, manifest).cache()
    val nPending = pending.count()
    if (nPending == 0) {
      println(s"""{"job":"kg","status":"up-to-date","pages":$nPages,"pending":0}""")
      spark.stop()
      return
    }

    // observe() metrics ride the action for free (no extra pass)
    val pendingPages = pending.drop("partition_key").as[Page]
    val triples = TripleEmit.pipeline(pendingPages)
      .observe("kg_metrics", count(lit(1)).as("triples_out"))
    Lineage.writeWithLineage(spark, triples.toDF(), pending, triplesPath, manifestPath)

    // quarantine + adjacency from the written table (scan, no recompute)
    TripleEmit.quarantine(Extract.extract(pendingPages))
      .write.mode(SaveMode.Append).parquet(quarantinePath)
    val written = spark.read.parquet(triplesPath)
    GraphMaterialize.adjacency(written.as[Triple])
      .write.mode(SaveMode.Overwrite).parquet(adjacencyPath)

    val nTriples = written.count()
    val nQuarantine = spark.read.parquet(quarantinePath).count()
    println(s"""{"job":"kg","status":"done","pages":$nPages,"pending":$nPending,"triples_total":$nTriples,"quarantined":$nQuarantine,"out":"$outDir"}""")
    spark.stop()
  }
}
