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
    // a false return means the query is still running (or hung) — read
    // nothing, fail with the real cause instead of a partial-output diff
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

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

  test("a crashed first batch (_temporary only, nothing committed) replays cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("dedupcrash").toString
    val outDir = s"$dir/out"
    // simulate batch 0 dying mid-write: the partition dir exists but holds
    // only the uncommitted _temporary dir — no data file
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$outDir/sketches/batch=0/_temporary"))
    DedupStream.dedupBatch(corpus.take(3).toDF("doc_id", "text"), 0L, outDir, 0.5)
    assert(spark.read.parquet(s"$outDir/sketches").count() == 3)
  }

  test("a sketches dir without batch= partitions fails loudly, not as empty") {
    val dir = java.nio.file.Files.createTempDirectory("deduplayout").toString
    val outDir = s"$dir/out"
    corpus.take(2).toDF("doc_id", "text").write.parquet(s"$outDir/sketches")
    val e = intercept[IllegalStateException] {
      DedupStream.dedupBatch(corpus.drop(3).toDF("doc_id", "text"), 1L, outDir, 0.5)
    }
    assert(e.getMessage.contains("batch="), e.getMessage)
  }

  test("a bands drift against the persisted table fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("dedupbands").toString
    val outDir = s"$dir/out"
    DedupStream.dedupBatch(corpus.take(3).toDF("doc_id", "text"), 0L, outDir, 0.5,
      k = 64, bands = 16)
    val e = intercept[IllegalStateException] {
      DedupStream.dedupBatch(corpus.drop(3).toDF("doc_id", "text"), 1L, outDir, 0.5,
        k = 64, bands = 8)
    }
    assert(e.getMessage.contains("bands"), e.getMessage)
  }

  test("a re-crawl re-confirming a known near-dup pair does not duplicate it") {
    val dir = java.nio.file.Files.createTempDirectory("dedupreconfirm").toString
    val outDir = s"$dir/out"
    val base = (0 until 200).map(i => s"word$i").mkString(" ")
    val near = base.replace("word100", "replaced")
    DedupStream.dedupBatch(Seq((10L, base)).toDF("doc_id", "text"), 0L, outDir, 0.5)
    DedupStream.dedupBatch(Seq((20L, near)).toDF("doc_id", "text"), 1L, outDir, 0.5)
    // doc 10 re-crawled unchanged: it meets doc 20 again via LSH, but the
    // (10,20) pair is already recorded in batch 1 — first discovery wins
    DedupStream.dedupBatch(Seq((10L, base)).toDF("doc_id", "text"), 2L, outDir, 0.5)
    val pairs = spark.read.parquet(s"$outDir/pairs")
      .select("a", "b").as[(Long, Long)].collect().toList
    assert(pairs == List((10L, 20L)), s"expected exactly one (10,20) row: $pairs")
  }

  test("compaction keeps each doc's latest sketch and preserves stream recovery") {
    val dir = java.nio.file.Files.createTempDirectory("dedupcompact").toString
    val outDir = s"$dir/out"
    val base = (0 until 200).map(i => s"word$i").mkString(" ")
    val v2 = base.replace("word100", "replaced")
    // doc 10 crawled twice (text changed), doc 12 once
    DedupStream.dedupBatch(Seq((10L, base),
      (12L, (0 until 200).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text"),
      0L, outDir, 0.5)
    DedupStream.dedupBatch(Seq((10L, v2)).toDF("doc_id", "text"), 1L, outDir, 0.5)
    assert(spark.read.parquet(s"$outDir/sketches").count() == 3)
    val n = DedupStream.compactSketches(spark, outDir)
    assert(n == 2, s"expected 2 compacted rows, got $n")
    val kept = spark.read.parquet(s"$outDir/sketches")
      .select(col("doc_id"), col("batch").cast("long")).as[(Long, Long)].collect().toSet
    assert(kept == Set((10L, 1L), (12L, 0L)), kept)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$outDir/sketches.compact-tmp")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$outDir/sketches.pre-compact")))
    // the stream keeps working against the compacted table: a new batch
    // pairs against doc 10's LATEST version only — identical to a fresh
    // rebuild over current texts (v2 ~ the new doc at J≈0.97; base differs
    // from v2 in 1 token so both pass, but the sketch table must hold v2)
    DedupStream.dedupBatch(Seq((20L, v2)).toDF("doc_id", "text"), 2L, outDir, 0.5)
    val pairs = spark.read.parquet(s"$outDir/pairs")
      .select("a", "b").as[(Long, Long)].collect().toSet
    val rebuilt = DedupOps.minhashNearDups(
      Seq((10L, v2), (12L, (0 until 200).map(i => s"other$i").mkString(" ")),
        (20L, v2)).toDF("doc_id", "text"), threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == rebuilt, s"streamed=$pairs rebuild-of-current-texts=$rebuilt")
  }

  test("revalidation drops pairs whose re-crawled doc diverged, keeps live ones") {
    val dir = java.nio.file.Files.createTempDirectory("dedupreval").toString
    val outDir = s"$dir/out"
    val base = (0 until 200).map(i => s"word$i").mkString(" ")
    val near = base.replace("word100", "replaced")
    val unrelated = (0 until 200).map(i => s"zzz$i").mkString(" ")
    DedupStream.dedupBatch(Seq((10L, base), (11L, base)).toDF("doc_id", "text"), 0L, outDir, 0.5)
    DedupStream.dedupBatch(Seq((20L, near)).toDF("doc_id", "text"), 1L, outDir, 0.5)
    // three recorded pairs: (10,11) exact, (10,20)/(11,20) near
    assert(spark.read.parquet(s"$outDir/pairs").count() == 3)
    // doc 10 re-crawled with unrelated content: its old pairs are now
    // verdicts about a superseded version
    DedupStream.dedupBatch(Seq((10L, unrelated)).toDF("doc_id", "text"), 2L, outDir, 0.5)
    DedupStream.compactSketches(spark, outDir)
    val n = DedupStream.revalidatePairs(spark, outDir)
    val pairs = spark.read.parquet(s"$outDir/pairs")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(n == 1 && pairs == Set((11L, 20L)),
      s"only the pair between unchanged docs survives: $pairs")
  }

  test("revalidation that drops EVERY pair still swaps in a valid empty table") {
    val dir = java.nio.file.Files.createTempDirectory("dedupallstale").toString
    val outDir = s"$dir/out"
    val base = (0 until 200).map(i => s"word$i").mkString(" ")
    DedupStream.dedupBatch(Seq((10L, base), (11L, base)).toDF("doc_id", "text"), 0L, outDir, 0.5)
    DedupStream.dedupBatch(
      Seq((10L, (0 until 200).map(i => s"zzz$i").mkString(" "))).toDF("doc_id", "text"),
      1L, outDir, 0.5)
    DedupStream.compactSketches(spark, outDir)
    assert(DedupStream.revalidatePairs(spark, outDir) == 0L)
    // the empty pair table reads back cleanly and the stream keeps working
    DedupStream.dedupBatch(Seq((30L, base)).toDF("doc_id", "text"), 2L, outDir, 0.5)
    val pairs = spark.read.parquet(s"$outDir/pairs")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((11L, 30L)), s"doc 30 matches the unchanged doc 11 only: $pairs")
  }

  test("revalidation with a mismatched k fails loudly instead of mis-scaling estimates") {
    val dir = java.nio.file.Files.createTempDirectory("dedupkdrift").toString
    val outDir = s"$dir/out"
    val base = (0 until 200).map(i => s"word$i").mkString(" ")
    DedupStream.dedupBatch(Seq((10L, base)).toDF("doc_id", "text"), 0L, outDir, 0.5)
    val e = intercept[IllegalStateException] {
      DedupStream.revalidatePairs(spark, outDir, k = 32)
    }
    assert(e.getMessage.contains("k=64") && e.getMessage.contains("k=32"), e.getMessage)
  }

  test("a drain against a mid-swap-crashed table fails loudly, not as empty corpus") {
    val dir = java.nio.file.Files.createTempDirectory("dedupmidswap").toString
    val outDir = s"$dir/out"
    val base = (0 until 200).map(i => s"word$i").mkString(" ")
    DedupStream.dedupBatch(Seq((10L, base)).toDF("doc_id", "text"), 0L, outDir, 0.5)
    // simulate a compaction that died after moving the live table away
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$outDir/sketches"),
      java.nio.file.Paths.get(s"$outDir/sketches.pre-compact"))
    val e = intercept[IllegalStateException] {
      DedupStream.dedupBatch(Seq((20L, base)).toDF("doc_id", "text"), 1L, outDir, 0.5)
    }
    assert(e.getMessage.contains("mid-swap"), e.getMessage)
    // the documented recovery path restores the table and the drain resumes
    DedupStream.compactSketches(spark, outDir)
    DedupStream.dedupBatch(Seq((20L, base)).toDF("doc_id", "text"), 1L, outDir, 0.5)
    val pairs = spark.read.parquet(s"$outDir/pairs")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 20L)), pairs)
  }

  test("compaction crash recovery: a swap that died after moving the live table away completes") {
    val dir = java.nio.file.Files.createTempDirectory("dedupcompactcrash").toString
    val outDir = s"$dir/out"
    val text = (0 until 200).map(i => s"word$i").mkString(" ")
    DedupStream.dedupBatch(Seq((10L, text)).toDF("doc_id", "text"), 0L, outDir, 0.5)
    // simulate the crash window: live renamed to backup, tmp never created
    val live = java.nio.file.Paths.get(s"$outDir/sketches")
    val backup = java.nio.file.Paths.get(s"$outDir/sketches.pre-compact")
    java.nio.file.Files.move(live, backup)
    val n = DedupStream.compactSketches(spark, outDir)
    assert(n == 1 && spark.read.parquet(s"$outDir/sketches").count() == 1)
  }

  test("a second writer aborts while the writer lock is held, and resumes after release") {
    val dir = java.nio.file.Files.createTempDirectory("deduplock").toString
    val outDir = s"$dir/out"
    val text = (0 until 200).map(i => s"word$i").mkString(" ")
    DedupStream.dedupBatch(Seq((10L, text)).toDF("doc_id", "text"), 0L, outDir, 0.5)
    // simulate a live drain holding the lock (e.g. a long micro-batch)
    DedupStream.acquireWriterLock(spark, outDir, "drain batch=1")
    try {
      val e1 = intercept[IllegalStateException] {
        DedupStream.compactSketches(spark, outDir)
      }
      assert(e1.getMessage.contains("another writer") && e1.getMessage.contains("pid="),
        e1.getMessage)
      val e2 = intercept[IllegalStateException] {
        DedupStream.revalidatePairs(spark, outDir)
      }
      assert(e2.getMessage.contains("another writer"), e2.getMessage)
      val e3 = intercept[IllegalStateException] {
        DedupStream.dedupBatch(Seq((20L, text)).toDF("doc_id", "text"), 1L, outDir, 0.5)
      }
      assert(e3.getMessage.contains("another writer"), e3.getMessage)
      // aborted writers must not have touched the tables
      assert(spark.read.parquet(s"$outDir/sketches").count() == 1)
    } finally DedupStream.releaseWriterLock(spark, outDir)
    // after release every writer proceeds, and the lock is self-cleaning
    DedupStream.dedupBatch(Seq((20L, text)).toDF("doc_id", "text"), 1L, outDir, 0.5)
    assert(DedupStream.compactSketches(spark, outDir) == 2)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$outDir/.writer-lock")),
      "lock file must not outlive its holder")
  }

  test("a crashed holder's stale lock is cleared by forceReleaseWriterLock") {
    val dir = java.nio.file.Files.createTempDirectory("deduplockstale").toString
    val outDir = s"$dir/out"
    val text = (0 until 200).map(i => s"word$i").mkString(" ")
    DedupStream.dedupBatch(Seq((10L, text)).toDF("doc_id", "text"), 0L, outDir, 0.5)
    DedupStream.acquireWriterLock(spark, outDir, "crashed-compactor")
    intercept[IllegalStateException] {
      DedupStream.dedupBatch(Seq((20L, text)).toDF("doc_id", "text"), 1L, outDir, 0.5)
    }
    DedupStream.forceReleaseWriterLock(spark, outDir)
    DedupStream.dedupBatch(Seq((20L, text)).toDF("doc_id", "text"), 1L, outDir, 0.5)
    assert(spark.read.parquet(s"$outDir/sketches").count() == 2)
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
