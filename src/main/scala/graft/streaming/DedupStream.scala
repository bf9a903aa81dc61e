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
    StructField("band_buckets", ArrayType(LongType))))

  /** Drain the docs backlog, maintaining `outDir/sketches` and
    * `outDir/pairs` (both batchId-partitioned). */
  def run(spark: SparkSession, docsDir: String, outDir: String,
          maxFilesPerTrigger: Int = 64, threshold: Double = 0.5): StreamingQuery =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
      .writeStream
      .queryName("dedup-stream")
      .option("checkpointLocation", s"$outDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupBatch(batch, batchId, outDir, threshold)
      }
      .start()

  /** All sketches persisted by batches OTHER than `excludeBatch` (replay
    * safety), or an empty frame before the first batch commits. */
  private[streaming] def existingSketches(spark: SparkSession, outDir: String,
                                          excludeBatch: Long): DataFrame =
    try
      spark.read.parquet(s"$outDir/sketches")
        .filter(col("batch") =!= excludeBatch)
        .select("doc_id", "sig", "band_buckets")
    catch {
      case _: org.apache.spark.sql.AnalysisException => // nothing written yet
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          sketchSchema)
    }

  /** One micro-batch: sketch the batch, pair it against every EARLIER
    * batch's persisted signatures, write both deltas batchId-scoped. */
  private[streaming] def dedupBatch(batch: DataFrame, batchId: Long, outDir: String,
                                    threshold: Double): Unit = {
    val spark = batch.sparkSession
    val existing = existingSketches(spark, outDir, batchId)
    val (newSk, newPairs) =
      DedupOps.incrementalMinhashDelta(existing, batch, threshold = threshold)
    newSk.write.mode("overwrite").parquet(s"$outDir/sketches/batch=$batchId")
    newPairs.write.mode("overwrite").parquet(s"$outDir/pairs/batch=$batchId")
  }
}
