package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** Lloyd k-means (integer surrogate): equivalence with a sequential
  * reference implementation of the same pinned arithmetic, plus the
  * shuffle-order invariance the integer surrogate exists for. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Sequential reference of the exact pinned semantics: floor(x·2^20)
    * quantization, argmin of integer L2² with ties to the lowest cell,
    * floor(sum/count) centroid update, empty cell keeps its centroid. */
  private def refKmeans(vecs: Seq[(Long, Array[Double])], k: Int,
                        iters: Int): Map[Long, (Long, Long)] = {
    val q = vecs.map { case (id, e) =>
      id -> e.map(x => math.floor(x * (1L << 20).toDouble).toLong)
    }.sortBy(_._1)
    var cents: Array[Array[Long]] = q.take(k).map(_._2.map(identity)).toArray
    def assign(): Map[Long, (Long, Long)] = q.map { case (id, v) =>
      val ds = cents.map(c => c.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum)
      val best = ds.indices.minBy(i => (ds(i), i))
      id -> (best.toLong, ds(best))
    }.toMap
    var out = assign()
    for (_ <- 2 to iters) {
      val next = cents.map(_.clone())
      out.groupBy(_._2._1).foreach { case (cell, members) =>
        val ids = members.keys.toSeq
        val dim = cents(0).length
        for (p <- 0 until dim) {
          val s = ids.map(id => q.find(_._1 == id).get._2(p)).sum
          next(cell.toInt)(p) = math.floor(s.toDouble / ids.size).toLong
        }
      }
      cents = next
      out = assign()
    }
    out
  }

  private def randVecs(seed: Int, n: Int, dim: Int): Seq[(Long, Array[Double])] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Array.fill(dim)(r.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / nrm))
    }
  }

  test("kmeansFit == sequential reference (random unit vectors, 2 and 3 iters)") {
    import spark.implicits._
    for ((seed, iters) <- Seq((71, 2), (72, 3))) {
      val vecs = randVecs(seed, 120, 16)
      val df = vecs.toDF("vec_id", "emb")
      val got = VectorOps.kmeansFit(df, k = 5, iters = iters)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val want = refKmeans(vecs, k = 5, iters = iters)
      assert(got == want, s"seed=$seed iters=$iters")
    }
  }

  test("kmeansFit is partitioning-invariant (the integer surrogate's point)") {
    import spark.implicits._
    val vecs = randVecs(73, 90, 8)
    val a = VectorOps.kmeansFit(vecs.toDF("vec_id", "emb").repartition(1), k = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = VectorOps.kmeansFit(vecs.toDF("vec_id", "emb").repartition(17), k = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("empty cell keeps its previous centroid (duplicate seed corner)") {
    import spark.implicits._
    // two identical seed vectors: cell 1 never wins an assignment (ties
    // go to cell 0), so its centroid must survive the update unchanged —
    // the crash/NaN corner the COALESCE fallback exists for
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(1.0, 0.0)),
      (2L, Array(0.0, 1.0)), (3L, Array(0.9, 0.1)))
    val got = VectorOps.kmeansFit(vecs.toDF("vec_id", "emb"), k = 3, iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val want = refKmeans(vecs.map { case (i, a) => (i, a) }, k = 3, iters = 2)
      .map { case (id, (c, _)) => id -> c }
    assert(got == want)
  }
}
