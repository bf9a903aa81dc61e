package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings(vec_id, embedding: array<float>,
  * label)` table. Baseline: brute-force cosine top-k with codegen'd array
  * intrinsics over materialized columns. Scale path: random-hyperplane
  * LSH — signatures computed in one narrow typed pass (like
  * DedupOps.sketches; round 1's per-plane HOF Columns re-evaluated the
  * cast/transform subtree per plane), banded so candidate generation is
  * an equi-join on small (band, key) pairs, multi-probe on the query side
  * so ANN recall does not collapse to a single bucket.
  *
  * Dimensionality is taken from each row's own array — round 1 hard-coded
  * dim=8 against 64-dim data and null-padded every cosine.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector. The query must
    * have the same length as the stored embeddings (asserted per row —
    * a length mismatch is a wiring bug, not data to silently null-pad).
    * The query is a literal array (constant-folded); on a real cluster a
    * batch of queries becomes a broadcast join instead. */
  def topKCosine(embeddings: DataFrame, query: Array[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val emb = transform(col("embedding"), x => x.cast("double"))
    val guarded = when(size(col("embedding")) === lit(query.length), cosine(emb, q))
      .otherwise(raise_error(concat(lit(s"query dim ${query.length} != embedding dim "),
        size(col("embedding")).cast("string"))))
    embeddings
      .select(col("vec_id"), col("label"), guarded.as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane coefficient in [-1, 1]. */
  @inline private def coef(seed: Long, plane: Int, j: Int): Double =
    TextHash.mix64(seed ^ (plane.toLong << 32) ^ j.toLong).toDouble / Long.MaxValue.toDouble

  /** Sign bits of the projections of `v` onto `planes` hyperplanes,
    * packed per band: key(b) = bits [b*rows, (b+1)*rows). */
  def signBandKeys(v: Array[Double], planes: Int, bands: Int, seed: Long): Array[Long] = {
    val rows = planes / bands
    val keys = new Array[Long](bands)
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var j = 0
      while (j < v.length) { acc += v(j) * coef(seed, p, j); j += 1 }
      if (acc > 0) keys(p / rows) |= (1L << (p % rows))
      p += 1
    }
    keys
  }

  /** One narrow typed pass: (vec_id, label, embedding as double[], L2
    * norm, band keys). Norms computed once here so the pair join only
    * pays the dot product; the band keys are the only join keys later
    * shuffles need. */
  def sketch(embeddings: DataFrame, planes: Int, bands: Int, seed: Long): DataFrame = {
    require(planes % bands == 0, s"planes=$planes must be divisible by bands=$bands")
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col("vec_id").cast("long"), col("label").cast("int"), col("embedding"))
      .as[(Long, Int, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, label, emb) =>
          val v = new Array[Double](emb.length)
          var nrm = 0.0
          var i = 0
          while (i < emb.length) {
            v(i) = emb(i).toDouble
            nrm += v(i) * v(i)
            i += 1
          }
          (id, label, v, math.sqrt(nrm), signBandKeys(v, planes, bands, seed))
        }
      }.toDF("vec_id", "label", "e", "nrm", "band_keys")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold: banded
    * hyperplane LSH candidates (equi-join on (band, key)), then exact
    * cosine on the candidate pairs only. With planes=96/bands=12 (8-bit
    * keys), recall at cos >= 0.97 is 1-(1-0.527)^12 ≈ 0.9999 while a
    * random pair collides in any band with prob ≈ 12 × 2^-8 ≈ 4.7%. */
  def cosineNearDups(embeddings: DataFrame, threshold: Double = 0.95,
                     planes: Int = 96, bands: Int = 12, seed: Long = 42L): DataFrame = {
    val sk = sketch(embeddings, planes, bands, seed)
      .select(col("vec_id"), col("e"), col("nrm"),
        posexplode(col("band_keys")).as(Seq("band", "key")))
    val a = sk.select(col("band"), col("key"), col("vec_id").as("a"), col("e").as("ea"), col("nrm").as("na"))
    val b = sk.select(col("band"), col("key"), col("vec_id").as("b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("band", "key")).filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Multi-probe bucketed ANN: candidates = vectors sharing the query's
    * key in any band, probing the exact key plus every 1-bit flip of it
    * (rows+1 probes per band), then exact cosine top-k on candidates.
    * Single-bucket probing (round 1) has unbounded-low recall; multi-probe
    * over all bands bounds the miss probability at (1-p^rows-...)^bands. */
  def annBucketed(embeddings: DataFrame, query: Array[Float], k: Int,
                  planes: Int = 48, bands: Int = 8, seed: Long = 7L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = planes / bands
    val qv = query.map(_.toDouble)
    val qKeys = signBandKeys(qv, planes, bands, seed)
    val probes = (0 until bands).flatMap { b =>
      val base = qKeys(b)
      (base +: (0 until rows).map(r => base ^ (1L << r))).map(key => (b, key))
    }
    val probeDf = probes.toDF("band", "key")
    val sk = sketch(embeddings, planes, bands, seed)
      .select(col("vec_id"), col("label"), col("e"), col("nrm"),
        posexplode(col("band_keys")).as(Seq("band", "key")))
    val q = array(qv.map(lit): _*)
    val qNorm = math.sqrt(qv.map(x => x * x).sum)
    sk.join(broadcast(probeDf), Seq("band", "key"))
      .dropDuplicates("vec_id")
      .select(col("vec_id"), col("label"),
        (dot(col("e"), q) / (col("nrm") * lit(qNorm))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }
}
