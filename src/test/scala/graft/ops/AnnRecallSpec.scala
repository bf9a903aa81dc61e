package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** Measured recall of the multi-probe bucketed ANN against brute force on
  * the sf0.001 embeddings table (deterministic data + deterministic
  * hyperplanes => deterministic recall). Round 1's single-bucket probe
  * had unbounded-low recall (returned 8 of k=20 rows). */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("multi-probe ANN recalls most of the brute-force top-20") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = graft.SparkEntry.annQuery
    val exact = VectorOps.topKCosine(emb, q, 20).select("vec_id").as[Long].collect().toSet
    val approx = VectorOps.annBucketed(emb, q, k = 20).select("vec_id").as[Long].collect().toSet
    assert(approx.size == 20, s"ANN must fill k: got ${approx.size}")
    val recall = (exact & approx).size / 20.0
    info(s"measured recall = $recall")
    assert(recall >= 0.6, s"multi-probe recall too low: $recall")
  }
}
