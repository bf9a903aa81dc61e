package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Iceberg-style table IO seam + per-partition lineage manifest for
  * resumable runs (SURVEY.md §4.3, north rule "resumable from checkpoint
  * with per-partition lineage + metrics").
  *
  * No Iceberg runtime is available offline (SURVEY.md §7.0), so the seam
  * is partitioned Parquet + a lineage manifest table written after each
  * partition batch (write-audit-publish). A real deployment swaps these
  * two methods for an Iceberg catalog without touching the engine.
  */
object Lineage {

  /** Stable partition key for a page: its host bucket. Hash-bucketed so
    * hot hosts don't map 1:1 to output partitions. */
  def partitionKeyCol = concat(lit("hb="),
    pmod(hash(regexp_extract(col("url"), "https?://([^/]+)/", 1)), lit(64)))

  /** Fingerprint of the input slice belonging to a partition key —
    * order-independent (xor of per-row hashes) so it is reproducible
    * regardless of task scheduling, and overflow-free under ANSI mode. */
  def fingerprint(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(expr("bit_xor(xxhash64(url))").as("input_fingerprint"),
        count(lit(1)).as("row_count"))

  def readManifest(spark: SparkSession, manifestPath: String): DataFrame = {
    try spark.read.parquet(manifestPath)
    catch {
      case _: Exception =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.Encoders.product[LineageRow].schema)
    }
  }

  /** Resume filter: drop pages whose partition is already marked done with
    * a matching fingerprint (left_anti against the manifest). */
  def pendingPages(pages: DataFrame, manifest: DataFrame): DataFrame = {
    val done = manifest.filter(col("status") === "done")
      .select(col("partition_key"), col("input_fingerprint").as("done_fp"))
    val keyed = pages.withColumn("partition_key", partitionKeyCol)
    val fps = fingerprint(keyed, "partition_key")
      .select(col("partition_key"), col("input_fingerprint"))
    val stillPending = fps.join(done, Seq("partition_key"), "left_anti")
      .union(
        // also re-run partitions whose fingerprint changed since the run
        fps.join(done, Seq("partition_key"))
          .filter(col("input_fingerprint") =!= col("done_fp"))
          .select(col("partition_key"), col("input_fingerprint")))
    keyed.join(broadcast(stillPending.select("partition_key")), Seq("partition_key"), "left_semi")
  }

  /** Write triples partitioned by the page partition key, then publish the
    * manifest rows (write-audit-publish: manifest only says "done" after
    * the data write succeeded). */
  def writeWithLineage(spark: SparkSession, triples: DataFrame, pagesKeyed: DataFrame,
                       outPath: String, manifestPath: String): Unit = {
    triples.write.mode(SaveMode.Append).parquet(outPath)
    val now = new Timestamp(System.currentTimeMillis())
    val manifest = fingerprint(pagesKeyed, "partition_key")
      .select(col("partition_key"), col("input_fingerprint"),
        col("row_count").as("triple_count"))
      .withColumn("status", lit("done"))
      .withColumn("updated_at", lit(now))
    manifest.write.mode(SaveMode.Append).parquet(manifestPath)
  }
}
