package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.pipeline.SparkTestBase
import scala.util.Random

/** Incremental component maintenance must equal a from-scratch rebuild
  * over the union edge set — on random graphs, on merges of large
  * components, across unlabeled newcomers, and on empty deltas. */
class IncrementalComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def pairsDf(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toDF("a", "b")
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental == rebuild on random edge splits") {
    val rnd = new Random(37)
    for (trial <- 1 to 4) {
      val n = 24
      val all = (1 to 40).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.distinct.filter(p => p._1 != p._2)
      val (old, delta) = all.partition(_ => rnd.nextBoolean())
      if (old.nonEmpty) {
        val oldLabels = DedupOps.dedupComponents(pairsDf(old))
        val got = labelsOf(
          DedupOps.incrementalComponents(oldLabels, pairsDf(delta)))
        val want = labelsOf(DedupOps.dedupComponents(pairsDf(all)))
        assert(got == want, s"trial $trial (old=${old.size} delta=${delta.size})")
      }
    }
  }

  test("one new edge merges two chains; every member is relabeled") {
    // two disjoint chains 1-2-3-4 and 10-11-12-13
    val old = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (12L, 13L))
    val oldLabels = DedupOps.dedupComponents(pairsDf(old))
    assert(labelsOf(oldLabels)(13L) == 10L)
    // a single bridging edge deep inside both chains
    val got = labelsOf(DedupOps.incrementalComponents(
      oldLabels, pairsDf(Seq((4L, 13L)))))
    assert(got == (1L to 4L).map(_ -> 1L).toMap ++
      Seq(10L, 11L, 12L, 13L).map(_ -> 1L).toMap)
  }

  test("unlabeled newcomers bridge components and join the label table") {
    val old = Seq((1L, 2L), (10L, 11L))
    val oldLabels = DedupOps.dedupComponents(pairsDf(old))
    // 50 is new and connects both components through another newcomer 51
    val got = labelsOf(DedupOps.incrementalComponents(
      oldLabels, pairsDf(Seq((2L, 50L), (50L, 51L), (51L, 10L)))))
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      50L -> 1L, 51L -> 1L))
  }

  test("chained batches: three successive deltas equal one full rebuild") {
    val rnd = new Random(41)
    val n = 20
    val all = (1 to 36).map { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.distinct.filter(p => p._1 != p._2)
    val batches = all.grouped((all.size + 3) / 4).toSeq // 4 batches
    var labels = DedupOps.dedupComponents(pairsDf(batches.head))
    for (delta <- batches.tail)
      labels = DedupOps.incrementalComponents(labels, pairsDf(delta))
    assert(labelsOf(labels) == labelsOf(DedupOps.dedupComponents(pairsDf(all))))
  }

  test("an empty or already-known delta leaves the labels bit-identical") {
    val old = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val oldLabels = DedupOps.dedupComponents(pairsDf(old))
    val want = labelsOf(oldLabels)
    assert(labelsOf(DedupOps.incrementalComponents(
      oldLabels, pairsDf(Seq.empty))) == want)
    assert(labelsOf(DedupOps.incrementalComponents(
      oldLabels, pairsDf(Seq((2L, 3L))))) == want)
  }
}
