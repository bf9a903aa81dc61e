package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ops.DedupOps

/** Streaming near-duplicate maintenance — the append-mode companion of
  * the batch dedup stack (VERDICT r3 #9 + the KgStream skin): each
  * micro-batch of documents is sketched ONCE and candidate-joined against
  * the PERSISTED signature table via DedupOps.incrementalMinhashDelta;
  * the batch's delta (its sketches + its new pairs) lands in a
  * batchId-scoped directory, exactly like KgStream.writeBatch.
  *
  * Exactly-once reasoning, same two halves as KgStream: the checkpointed
  * file-source offsets guarantee a document file never joins two
  * committed batches, and the batchId-scoped OVERWRITE makes the sink
  * idempotent. The replay subtlety specific to dedup: a replayed batch
  * must join against the signature table EXCLUDING its own crashed
  * attempt's output (otherwise every replayed doc would pair with its own
  * prior sketch as a spurious near-dup), so [[dedupBatch]] filters
  * `batch =!= batchId` when loading the existing sketches.
  *
  * At 100 TB the per-batch cost is O(|batch| + |batch x corpus
  * candidates|): the corpus-side scan reads the keys-only signature
  * table, never document text, and the candidate join is banded-LSH
  * equi-join shaped (BHJ on a small batch, SMJ/AQE at scale).
  */
object DedupStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val sketchSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("band_buckets", ArrayType(LongType)),
    StructField("batch", LongType)))

  private val pairSchema = StructType(Seq(
    StructField("a", LongType),
    StructField("b", LongType),
    StructField("jaccard_est", DoubleType),
    StructField("batch", LongType)))

  /** Drain the docs backlog, maintaining `outDir/sketches` and
    * `outDir/pairs` (both batchId-partitioned). `k`/`bands` are the
    * persisted table's sketch parameters — [[dedupBatch]] validates every
    * batch against what is already on disk, so a parameter drift fails
    * loudly instead of silently depressing signature agreement.
    * `maxBucket` is the hot-bucket occupancy cap and should match the
    * value used to build any corpus pair table this stream extends. */
  def run(spark: SparkSession, docsDir: String, outDir: String,
          maxFilesPerTrigger: Int = 64, threshold: Double = 0.5,
          k: Int = 64, bands: Int = 16,
          maxBucket: Int = DedupOps.DefaultMaxBucket): StreamingQuery =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
      .writeStream
      .queryName("dedup-stream")
      .option("checkpointLocation", s"$outDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupBatch(batch, batchId, outDir, threshold, k, bands, maxBucket)
      }
      .start()

  /** Single-writer fence (VERDICT r4 #7): the run-between-drains contract
    * on [[compactSketches]]/[[revalidatePairs]] was previously only a
    * docstring — a drain racing a compaction's verify-then-swap rename
    * could pair a batch against a table that vanishes mid-join, or worse,
    * interleave two rewrites' backup/tmp renames. Every writer (each
    * micro-batch in [[dedupBatch]] and both table rewriters) now takes a
    * create-exclusive lock file at `outDir/.writer-lock` carrying
    * pid+epoch+role, and a second writer fails LOUDLY with the holder's
    * identity instead of racing the swap.
    *
    * Atomicity note: HDFS `create(path, overwrite=false)` is atomic; the
    * local FS check-then-create has a theoretical window, acceptable for a
    * guard whose job is catching operational mistakes (a cron'd compactor
    * overlapping a drain), not Byzantine writers. A holder that CRASHES
    * leaves the lock behind by design — pid+epoch in the file let the
    * operator judge staleness, and [[forceReleaseWriterLock]] clears it;
    * auto-expiry would re-open the race for any long-running legitimate
    * holder. */
  private def lockPath(outDir: String) = new org.apache.hadoop.fs.Path(s"$outDir/.writer-lock")

  private[streaming] def acquireWriterLock(spark: SparkSession, outDir: String,
                                           role: String): Unit = {
    val p = lockPath(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val out =
      try fs.create(p, false)
      catch {
        case e: java.io.IOException =>
          val holder =
            try {
              val in = fs.open(p)
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
            } catch { case _: java.io.IOException => "<unreadable>" }
          throw new IllegalStateException(
            s"another writer holds $p [$holder] — a concurrent drain/compaction/" +
              "revalidation would race the table swap; wait for it, or if its " +
              "process is dead, clear the lock with forceReleaseWriterLock", e)
      }
    try out.write(
      s"pid=${ProcessHandle.current().pid()} epoch=${System.currentTimeMillis()} role=$role"
        .getBytes("UTF-8"))
    finally out.close()
  }

  private[streaming] def releaseWriterLock(spark: SparkSession, outDir: String): Unit = {
    val p = lockPath(outDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }

  /** Operator escape hatch for a lock left by a CRASHED holder (the file's
    * pid+epoch identify it). Never call while the holder might be alive. */
  def forceReleaseWriterLock(spark: SparkSession, outDir: String): Unit =
    releaseWriterLock(spark, outDir)

  private def withWriterLock[A](spark: SparkSession, outDir: String, role: String)(f: => A): A = {
    acquireWriterLock(spark, outDir, role)
    try f finally releaseWriterLock(spark, outDir)
  }

  /** Read a batchId-partitioned delta table, excluding `excludeBatch`
    * (replay safety) and returning an empty frame when no batch has ever
    * COMMITTED — the probe looks for an actual data file inside a
    * `batch=` partition, not mere directory existence, because a crashed
    * first attempt leaves `batch=N/_temporary` behind and a bare
    * existence check would then feed that unreadable directory to the
    * parquet reader on every replay, bricking recovery (review r4b). A
    * directory that exists with visible content but NO `batch=`
    * partitions still fails loudly (a rewritten layout must not silently
    * join every future batch against nothing — review r4). */
  private def committedDelta(spark: SparkSession, dir: String,
                             schema: StructType, excludeBatch: Long): DataFrame = {
    def hidden(p: org.apache.hadoop.fs.Path) =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    if (!fs.exists(path)) {
      // a missing table with rewrite-protocol dirs next to it is NOT a
      // fresh table — a compaction/revalidation swap died mid-flight, and
      // silently reading "empty" here would make the next drain miss every
      // new-vs-corpus pair and then destroy the backup on the next rewrite
      // (the exact silent-empty failure the batch= layout check below
      // guards against). Fail loudly; recoverTable restores the table.
      val pending = Seq(".compact-tmp", ".pre-compact")
        .map(s => new org.apache.hadoop.fs.Path(dir + s)).filter(fs.exists)
      if (pending.nonEmpty)
        throw new IllegalStateException(
          s"$dir is missing but ${pending.mkString(", ")} exist — a table " +
            "rewrite died mid-swap; run revalidatePairs (recovers both " +
            "tables) or, for the sketches table, compactSketches, then drain")
      empty
    } else {
      val entries = fs.listStatus(path).filterNot(st => hidden(st.getPath))
      val parts = entries.filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      if (parts.isEmpty && entries.nonEmpty)
        throw new IllegalStateException(
          s"$dir exists but holds no batch= partitions — the table layout was " +
            "rewritten; refusing to silently treat it as empty")
      val committed = parts.exists(p =>
        fs.listStatus(p.getPath).exists(f => f.isFile && !hidden(f.getPath)))
      if (!committed) empty
      else spark.read.parquet(path.toString)
        .filter(col("batch") =!= excludeBatch)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }

  /** All sketches persisted by batches OTHER than `excludeBatch`, with
    * their batch id (the pair generator uses it to resolve re-crawled
    * docs' multiple sketches deterministically — latest wins). */
  private[streaming] def existingSketches(spark: SparkSession, outDir: String,
                                          excludeBatch: Long): DataFrame =
    committedDelta(spark, s"$outDir/sketches", sketchSchema, excludeBatch)

  /** All pairs recorded by batches OTHER than `excludeBatch` — the
    * anti-join target that keeps a re-confirmed pair (a re-crawl meeting
    * a known near-dup) from landing twice in the pair table. */
  private[streaming] def existingPairs(spark: SparkSession, outDir: String,
                                       excludeBatch: Long): DataFrame =
    committedDelta(spark, s"$outDir/pairs", pairSchema, excludeBatch)

  /** Compact `outDir/sketches` to each doc's LATEST sketch
    * ([[DedupOps.latestSketches]]), rewriting the table in place with the
    * batchId partitioning preserved so the stream's readers and replay
    * guards keep working unchanged. Run it BETWEEN drains — AvailableNow
    * streams terminate after a drain, and compacting under a live writer
    * would race the swap. That contract is ENFORCED by the single-writer
    * lock (see [[acquireWriterLock]]): a compaction overlapping a drain
    * batch aborts with the holder's pid+epoch instead of racing. Without periodic compaction, re-crawled docs
    * grow the signature table by one superseded row per crawl forever.
    *
    * Swap protocol (crash-recoverable at every step): write the compacted
    * table to `sketches.compact-tmp`, verify its committed row count
    * equals the distinct-doc count, rename the live table to
    * `sketches.pre-compact`, rename tmp into place, then delete the
    * backup. A crash mid-swap leaves either the live table untouched (+
    * stale tmp, overwritten on retry) or the backup + tmp pair, from
    * which a re-run completes the swap; the backup is only deleted after
    * the new table is live. Returns the compacted row count. */
  def compactSketches(spark: SparkSession, outDir: String): Long =
    withWriterLock(spark, outDir, "compactSketches") {
      recoverTable(spark, s"$outDir/sketches")
      val all = existingSketches(spark, outDir, excludeBatch = -1L)
      rewriteInPlace(spark, s"$outDir/sketches",
        DedupOps.latestSketches(all), sketchSchema,
        expectedRows = () => all.select("doc_id").distinct().count())
    }

  /** Re-score every recorded pair against each doc's LATEST sketch and
    * drop pairs no longer over threshold — compaction's semantic
    * companion: first-discovery-wins keeps a pair recorded even after a
    * re-crawl changes one document past similarity, so without
    * revalidation the pair table accumulates verdicts about superseded
    * page versions. After compactSketches + revalidatePairs, every
    * surviving pair is over threshold on CURRENT texts with its estimate
    * refreshed — a from-scratch rebuild's verdict, up to LSH recall (a
    * pair first discovered through a superseded version's buckets is
    * kept if still over threshold, even where a rebuild's banding would
    * miss it; revalidation never keeps an under-threshold pair). Same
    * run-between-drains and crash-recovery contract as
    * [[compactSketches]]. Returns the surviving pair count. */
  def revalidatePairs(spark: SparkSession, outDir: String,
                      k: Int = 64, threshold: Double = 0.5): Long =
    withWriterLock(spark, outDir, "revalidatePairs") {
    recoverTable(spark, s"$outDir/pairs")
    recoverTable(spark, s"$outDir/sketches")
    val all = existingSketches(spark, outDir, excludeBatch = -1L)
    // the same k-drift gate dedupBatch applies: rescoring a k=128 table
    // with the default k=64 would scale every estimate by 2 and keep
    // virtually every stale pair (one sampled row decides — the table is
    // uniform by dedupBatch's write-time induction)
    all.select(size(col("sig")).as("k0")).head(1).foreach { r =>
      if (r.getInt(0) != k)
        throw new IllegalStateException(
          s"persisted sketches in $outDir/sketches carry k=${r.getInt(0)} signatures " +
            s"but revalidatePairs was called with k=$k — estimates would be mis-scaled")
    }
    val latest = DedupOps.latestSketches(all)
    val pairs = existingPairs(spark, outDir, excludeBatch = -1L)
    val rescored = pairs.select(col("a"), col("b"), col("batch"))
      .join(latest.select(col("doc_id").as("a"), col("sig").as("siga")), Seq("a"))
      .join(latest.select(col("doc_id").as("b"), col("sig").as("sigb")), Seq("b"))
      .withColumn("jaccard_est", DedupOps.jaccardEstimate(col("siga"), col("sigb"), k))
      .filter(col("jaccard_est") >= threshold)
      .select(col("a"), col("b"), col("jaccard_est"), col("batch"))
    rewriteInPlace(spark, s"$outDir/pairs", rescored, pairSchema, expectedRows = null)
  }

  /** Crash recovery for [[rewriteInPlace]] — MUST run before the caller
    * READS the live table (the replacement frame is built from it; doing
    * recovery inside the rewrite would build the replacement from a
    * missing dir). If a previous swap died after moving the live table
    * away, restore one: prefer tmp (the verified replacement), else the
    * backup. */
  private def recoverTable(spark: SparkSession, table: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(table)
    val tmp = new org.apache.hadoop.fs.Path(s"$table.compact-tmp")
    val backup = new org.apache.hadoop.fs.Path(s"$table.pre-compact")
    if (!fs.exists(live)) {
      if (fs.exists(tmp)) { require(fs.rename(tmp, live), s"rename $tmp -> $live failed") }
      else if (fs.exists(backup)) { require(fs.rename(backup, live), s"rename $backup -> $live failed") }
      else throw new IllegalStateException(s"$live does not exist and no recovery dirs found")
    }
  }

  /** Crash-recoverable in-place rewrite of a batchId-partitioned table:
    * write `replacement` to `<table>.compact-tmp`, verify its committed
    * row count (read back with the EXPLICIT `schema` — an all-rows-
    * dropped rewrite writes a dir with no parquet footers, where schema
    * inference would throw and brick the legitimate everything-stale
    * state), rename the live table to `<table>.pre-compact`, rename tmp
    * into place, delete the backup. A crash mid-swap leaves either the
    * live table untouched (+ stale tmp, overwritten on retry) or the
    * backup/tmp pair, from which a re-run completes the swap; the
    * backup is only deleted after the new table is live. */
  private def rewriteInPlace(spark: SparkSession, table: String,
                             replacement: DataFrame, schema: StructType,
                             expectedRows: () => Long): Long = {
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(table)
    val tmp = new org.apache.hadoop.fs.Path(s"$table.compact-tmp")
    val backup = new org.apache.hadoop.fs.Path(s"$table.pre-compact")
    require(fs.exists(live), s"$live must exist (recoverTable runs first)")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    replacement.write.partitionBy("batch").mode("overwrite").parquet(tmp.toString)
    val written = spark.read.schema(schema).parquet(tmp.toString).count()
    if (expectedRows != null) {
      val expected = expectedRows()
      if (written != expected)
        throw new IllegalStateException(
          s"rewrite of $table produced $written rows, expected $expected — aborting before swap")
    }
    if (fs.exists(backup)) fs.delete(backup, true)
    require(fs.rename(live, backup), s"rename $live -> $backup failed")
    require(fs.rename(tmp, live), s"rename $tmp -> $live failed")
    fs.delete(backup, true)
    written
  }

  /** One micro-batch: sketch the batch ONCE (cached across the two
    * writes — foreachBatch frames recompute per action, and the
    * tokenize+minhash pass over document text must not run 3-4 times),
    * validate sketch-parameter compatibility with the persisted table,
    * pair against every EARLIER batch's signatures, write both deltas
    * batchId-scoped. */
  private[streaming] def dedupBatch(batch: DataFrame, batchId: Long, outDir: String,
                                    threshold: Double, k: Int = 64,
                                    bands: Int = 16,
                                    maxBucket: Int = DedupOps.DefaultMaxBucket): Unit = {
    val spark = batch.sparkSession
    withWriterLock(spark, outDir, s"drain batch=$batchId") {
    val existing = existingSketches(spark, outDir, batchId)
    // Parameter-drift gate on ONE sampled row: every committed batch
    // passed this same gate at write time, so the persisted table is
    // uniform by induction and a single row decides — a filtered full
    // count here would re-scan the whole signature table every
    // micro-batch just to return 0 (review r4b). Both k (sig length)
    // and bands (band_buckets length) are checked: a bands drift would
    // silently empty the (band,bucket) candidate join.
    existing.select(size(col("sig")).as("k0"), size(col("band_buckets")).as("b0"))
      .head(1).foreach { r =>
        if (r.getInt(0) != k || r.getInt(1) != bands)
          throw new IllegalStateException(
            s"persisted sketches in $outDir/sketches were built with k=${r.getInt(0)}/" +
              s"bands=${r.getInt(1)} but this stream runs k=$k/bands=$bands — " +
              "signature agreement would be silently wrong; rebuild or match parameters")
      }
    val newSk = DedupOps.sketches(batch, k, bands)
      .select("doc_id", "sig", "band_buckets").cache()
    try {
      newSk.write.mode("overwrite").parquet(s"$outDir/sketches/batch=$batchId")
      // A re-crawled doc re-confirming a known near-dup must not append
      // the pair a second time: first discovery wins, enforced by an
      // anti-join against every earlier batch's pairs (the pair table is
      // tiny next to the corpus, so this scan is cheap per batch).
      DedupOps.incrementalPairsFromSketches(existing, newSk, k, threshold, maxBucket)
        .join(existingPairs(spark, outDir, batchId).select("a", "b"),
          Seq("a", "b"), "left_anti")
        .write.mode("overwrite").parquet(s"$outDir/pairs/batch=$batchId")
    } finally newSk.unpersist()
    }
  }
}
