package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.DedupOps
import graft.pipeline.SparkTestBase

/** Streaming dedup maintenance: draining the docs backlog in micro-batches
  * must accumulate exactly the pair set a full batch rebuild computes, and
  * a replayed micro-batch must not pair documents against their own
  * crashed attempt's sketches. */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus = {
    val base = (0 until 200).map(i => s"word$i").mkString(" ")
    val near = base.replace("word100", "replaced")
    Seq(
      (10L, base), (11L, base.replace("word5", "changed")),
      (12L, (0 until 200).map(i => s"other$i").mkString(" ")),
      (20L, near), (21L, near),
      (22L, (0 until 200).map(i => s"new$i").mkString(" "))
    )
  }

  test("micro-batch drain accumulates the full-rebuild pair set across batches") {
    val dir = java.nio.file.Files.createTempDirectory("dedupstream").toString
    val docsDir = s"$dir/docs"
    val outDir = s"$dir/out"
    // two arrival waves as separate files; maxFilesPerTrigger=1 forces
    // at least two micro-batches, so cross-batch pairing is exercised
    corpus.take(3).toDF("doc_id", "text").coalesce(1).write.parquet(docsDir)
    corpus.drop(3).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(docsDir)

    val q = DedupStream.run(spark, docsDir, outDir, maxFilesPerTrigger = 1)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$outDir/pairs")
      .select("a", "b").as[(Long, Long)].collect().toSet
    val rebuilt = DedupOps.minhashNearDups(corpus.toDF("doc_id", "text"), threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(streamed == rebuilt, s"streamed=$streamed rebuild=$rebuilt")
    assert(streamed.contains((10L, 20L)) && streamed.contains((20L, 21L)),
      s"cross-batch and in-batch pairs must both appear: $streamed")

    // sketches table carries every doc exactly once
    assert(spark.read.parquet(s"$outDir/sketches").count() == corpus.size)
  }

  test("replayed micro-batch is idempotent and never self-pairs") {
    val dir = java.nio.file.Files.createTempDirectory("dedupreplay").toString
    val outDir = s"$dir/out"
    val batch0 = corpus.take(3).toDF("doc_id", "text")
    val batch1 = corpus.drop(3).toDF("doc_id", "text")
    DedupStream.dedupBatch(batch0, 0L, outDir, threshold = 0.5)
    DedupStream.dedupBatch(batch1, 1L, outDir, threshold = 0.5)
    val before = spark.read.parquet(s"$outDir/pairs")
      .select("a", "b").as[(Long, Long)].collect().toSet
    // crash-replay of batch 1: must exclude its own previous output from
    // the existing-sketch join (else 20/21/22 would pair with themselves)
    DedupStream.dedupBatch(batch1, 1L, outDir, threshold = 0.5)
    val after = spark.read.parquet(s"$outDir/pairs")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(after == before, s"replay changed the pair set: $after vs $before")
    assert(!after.exists(p => p._1 == p._2), s"self-pair leaked: $after")
  }

  test("a re-crawled doc_id meets its own earlier sketch without self-pairing") {
    val dir = java.nio.file.Files.createTempDirectory("dedupcrawl").toString
    val outDir = s"$dir/out"
    val text = (0 until 200).map(i => s"word$i").mkString(" ")
    DedupStream.dedupBatch(Seq((10L, text)).toDF("doc_id", "text"), 0L, outDir, 0.5)
    // the same document arrives again in a later batch (routine re-crawl)
    DedupStream.dedupBatch(Seq((10L, text)).toDF("doc_id", "text"), 1L, outDir, 0.5)
    val pairs = spark.read.parquet(s"$outDir/pairs")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.isEmpty, s"re-crawl must not self-pair: $pairs")
  }
}
