package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Subject-bucketed storage for the materialized KG tables — the
  * concrete form of the claim the plan audits make throughout
  * BENCH/PLANS.md ("bucketed by subj at production scale, the join
  * co-locates"): write the triples/adjacency/entity tables bucketed and
  * sorted by their join key, and every subj-keyed join between them
  * (entity linking, closure extension, delta application, adjacency
  * probes) reads pre-partitioned, pre-sorted buckets — ZERO exchanges,
  * ZERO sorts at query time. BucketedJoinSpec asserts exactly that on
  * the physical plan, with broadcast disabled so the test can't pass by
  * dodging the shuffle.
  *
  * Sort elision needs two opt-ins beyond the bucket layout (both
  * spec-verified): one FILE per bucket (the writer repartitions by the
  * bucket hash to guarantee it) and
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (since
  * Spark 3.0 a bucketed scan doesn't report sort order by default —
  * safe to enable when buckets are single-file, as here).
  *
  * Bucket-count discipline at 100 TB: both sides of a co-located join
  * must use the SAME bucket count (Spark requires it to elide the
  * exchange), so the count is an argument with one shared default
  * rather than a per-table choice. Buckets also bound task input size:
  * at 10^12 triples choose the count so one bucket's largest table
  * slice fits a task (e.g. 2^14 buckets ≈ 60M triples/bucket), then
  * every downstream self-join inherits the layout.
  */
object BucketedStore {

  val DefaultBuckets = 16

  /** Write `df` as an external bucketed+sorted table at `path`,
    * registered as `table` in the session catalog (bucketed reads
    * require catalog metadata — a bare parquet path loses the bucket
    * spec; this is Spark's contract, not a limitation of the layout).
    *
    * The pre-write `repartition(buckets, key)` matters: every writer
    * task otherwise emits its own file per bucket, and Spark only
    * trusts a bucket's SORT order when the bucket is a single file —
    * multi-file buckets keep the co-partitioning (no exchange) but
    * re-sort both join sides at read time (caught by the
    * BucketedJoinSpec sort assertion after review r5 fixed it).
    * Repartitioning by the bucket hash gives one writer — one file —
    * per bucket, so joins elide the sorts too. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int = DefaultBuckets): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (by catalog name — see [[writeBucketed]]
    * on why the name, not the path, carries the bucket layout).
    *
    * Also enables `spark.sql.legacy.bucketedTableScan.outputOrdering`
    * for the session: the sort-elision half of this module's guarantee
    * lives or dies on that conf, so it belongs with the reader, not in
    * a test fixture (review r5b). Safe here because [[writeBucketed]]
    * guarantees one file per bucket — the layout the conf's default
    * exists to protect against is never produced by this writer. */
  def readBucketed(spark: SparkSession, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.table(table)
  }
}
