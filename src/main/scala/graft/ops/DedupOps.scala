package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for web-scale corpora. Design points for
  * 100 TB: all variants shuffle 8-byte signatures or small signature
  * arrays, never document bodies; candidate generation is banded (LSH)
  * so the join is equi-join-able and AQE-skew-splittable; exact pair
  * verification happens only within buckets.
  */
object DedupOps {

  /** Exact dedup: fingerprint group-by keeping the smallest doc_id.
    * Shuffle key = 8-byte hash; map-side partial aggregation. */
  def exactDedup(documents: DataFrame): DataFrame = {
    val fp = documents.withColumn("fp", TextOps.fingerprint(col("text")))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    fp.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "fp")
  }

  /** Exact-dup groups (for reporting): fp -> keeper + dup count. */
  def exactDupGroups(documents: DataFrame): DataFrame =
    documents
      .groupBy(TextOps.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)

  // ---------------- MinHash + LSH ----------------

  /** Word 3-gram shingles → k minhashes, as a Column pipeline:
    * shingles via sliding window over the token array, each hashed with
    * `xxhash64(shingle, seed_i)`, min-aggregated with array intrinsics
    * (aggregate over codegen'd expressions — no UDF). */
  def minhashSignature(text: Column, k: Int): Column = {
    val tokens = split(lower(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", " ")), "\\s+")
    // shingles: transform over index range, concat_ws of 3 consecutive tokens
    val n = greatest(size(tokens) - 2, lit(1))
    val shingles = transform(sequence(lit(0), n - 1),
      i => concat_ws(" ", element_at(tokens, i + 1), element_at(tokens, i + 2), element_at(tokens, i + 3)))
    val sig = (0 until k).map { seed =>
      aggregate(shingles, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(s, lit(seed))))
    }
    array(sig: _*)
  }

  /** LSH banding: k minhashes split into `bands` bands of `rowsPerBand`;
    * each band hashed to a bucket id. Near-dup candidates = docs sharing
    * any (band, bucket). */
  def lshBuckets(documents: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = k / bands
    val withSig = documents.withColumn("sig", minhashSignature(col("text"), k))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*))
          .as("bucket"))
    }
    withSig
      .withColumn("bands", array(bandCols: _*))
      .select(col("doc_id"), col("sig"), explode(col("bands")).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
  }

  /** MinHash-LSH near-dup pairs: self-join on (band,bucket) — an
    * equi-join, so sort-merge/AQE applies; estimated Jaccard from
    * signature agreement; verified pairs only within buckets. */
  def minhashNearDups(documents: DataFrame, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.6): DataFrame = {
    val buckets = lshBuckets(documents, k, bands)
    val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("a"), col("sig").as("siga"))
    val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("b"), col("sig").as("sigb"))
    val pairs = a.join(b, Seq("band", "bucket")).filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
    val agree = aggregate(zip_with(col("siga"), col("sigb"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    pairs
      .withColumn("jaccard_est", agree.cast("double") / lit(k.toDouble))
      .filter(col("jaccard_est") >= threshold)
      .select(col("a"), col("b"), col("jaccard_est"))
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash over word tokens: per-token hash votes per bit.
    * Implemented as a Column pipeline: for each bit, sum +1/-1 over
    * tokens, then assemble the sign bits. */
  def simhash(text: Column, bits: Int = 16): Column = {
    val tokens = split(lower(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", " ")), "\\s+")
    val bitCols = (0 until bits).map { b =>
      val vote = aggregate(tokens, lit(0L),
        (acc, t) => acc + when((shiftright(xxhash64(t), b) % 2) =!= 0, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash near-dups: docs whose simhash matches on 3 of 4 byte-bands
    * (approximate hamming ≤ small). Bands are equi-join keys. */
  def simhashNearDups(documents: DataFrame, bits: Int = 16): DataFrame = {
    val sh = documents.select(col("doc_id"), simhash(col("text"), bits).as("sh"))
    val bandWidth = bits / 4
    val banded = sh.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * bandWidth).bitwiseAND(lit((1L << bandWidth) - 1)).as("key"))): _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.key"))
    val a = banded.select(col("band"), col("key"), col("doc_id").as("a"), col("sh").as("sha"))
    val b = banded.select(col("band"), col("key"), col("doc_id").as("b"), col("sh").as("shb"))
    a.join(b, Seq("band", "key")).filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("hamming", bitCount(col("sha").bitwiseXOR(col("shb"))))
      .filter(col("hamming") <= bits / 4)
      .select(col("a"), col("b"), col("hamming"))
  }

  private def bitCount(c: Column): Column = bit_count(c)

  // ---------------- character n-gram Jaccard ----------------

  /** Exact token-set Jaccard between candidate pairs produced by LSH
    * (never all-pairs — the candidate set bounds the join). */
  def ngramJaccardVerify(documents: DataFrame, candidates: DataFrame): DataFrame = {
    val sets = documents.select(col("doc_id"),
      array_distinct(split(lower(col("text")), "\\s+")).as("toks"))
    val a = sets.select(col("doc_id").as("a"), col("toks").as("ta"))
    val b = sets.select(col("doc_id").as("b"), col("toks").as("tb"))
    candidates.join(a, "a").join(b, "b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("double"))
      .withColumn("uni", size(array_union(col("ta"), col("tb"))).cast("double"))
      .withColumn("jaccard", col("inter") / greatest(col("uni"), lit(1.0)))
      .select(col("a"), col("b"), col("jaccard"))
  }
}
