package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings(vec_id, embedding: array<float>,
  * label)` table. Baseline: brute-force cosine top-k with codegen'd array
  * intrinsics (zip_with/aggregate — no UDF). Scale path: LSH bucketing by
  * random-hyperplane signs, so candidate generation is an equi-join on a
  * small bucket key and only in-bucket pairs pay the full dot product.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector. The query is a
    * literal array (driver-side constant folded into codegen) — on a real
    * cluster a batch of queries becomes a broadcast join instead. */
  def topKCosine(embeddings: DataFrame, query: Array[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val emb = transform(col("embedding"), x => x.cast("double"))
    embeddings
      .select(col("vec_id"), col("label"), cosine(emb, q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, restricted
    * to LSH candidates (random-hyperplane signature bands). */
  def hyperplaneSignature(emb: Column, dim: Int, planes: Int, seed: Long): Column = {
    // pseudo-random plane p, component j ~ hash(seed,p,j) mapped to [-1,1]
    val bitCols = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)),
          (x, j) => x * ((pmod(xxhash64(lit(seed), lit(p), j), lit(2000)) - 1000).cast("double") / 1000.0)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  def cosineNearDups(embeddings: DataFrame, dim: Int, threshold: Double = 0.95,
                     planes: Int = 12): DataFrame = {
    val emb = transform(col("embedding"), x => x.cast("double"))
    val sig = embeddings.select(col("vec_id"), emb.as("e"),
      hyperplaneSignature(emb, dim, planes, 42L).as("sig"))
    val a = sig.select(col("sig"), col("vec_id").as("a"), col("e").as("ea"))
    val b = sig.select(col("sig"), col("vec_id").as("b"), col("e").as("eb"))
    a.join(b, Seq("sig")).filter(col("a") < col("b"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (normArr(col("ea")) * normArr(col("eb"))))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  private def normArr(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  /** IVF-style bucketed ANN: coarse-quantize by hyperplane signature,
    * probe the query's bucket only (scale path: bucket key equi-join
    * replaces the all-pairs scan; recall tunable via planes count). */
  def annBucketed(embeddings: DataFrame, query: Array[Float], dim: Int, k: Int,
                  planes: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val emb = transform(col("embedding"), x => x.cast("double"))
    val bucketed = embeddings.select(col("vec_id"), col("label"), emb.as("e"),
      hyperplaneSignature(emb, dim, planes, 7L).as("sig"))
    val qSigRow = Seq(1).toDF("one")
      .select(hyperplaneSignature(q, dim, planes, 7L).as("qsig"))
    bucketed.join(broadcast(qSigRow), col("sig") === col("qsig"))
      .select(col("vec_id"), col("label"),
        (dot(col("e"), q) / (normArr(col("e")) * normArr(q))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }
}
