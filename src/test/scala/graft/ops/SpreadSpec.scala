package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** The scan-parallelism floor (optimization r6 batch 4): a compact input
  * is repartitioned up to the session's shuffle parallelism, an already-
  * parallel input passes through untouched (the production multi-file
  * shape must not pay an exchange), and row content is preserved either
  * way. */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("narrow input is spread to the session parallelism, content intact") {
    import spark.implicits._
    val target = spark.sessionState.conf.numShufflePartitions
    val in = (1L to 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      .coalesce(1)
    assert(in.rdd.getNumPartitions == 1)
    val out = Spread.minParallel(in, "doc_id")
    assert(out.rdd.getNumPartitions == target)
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      === (1L to 100L).map(i => (i, s"doc$i")))
  }

  test("already-parallel input is returned untouched (no exchange added)") {
    import spark.implicits._
    val target = spark.sessionState.conf.numShufflePartitions
    val in = (1L to 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      .repartition(target + 1)
    val out = Spread.minParallel(in, "doc_id")
    assert(out eq in, "a sufficiently-parallel frame must pass through as-is")
  }
}
