package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** Leakage-safe splitting: component co-assignment, singleton identity,
  * rate bounds, and exact parity with a sequential reference. */
class LeakproofSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(ids: Seq[Long], pairs: Seq[(Long, Long)],
      vpm: Long = 100, tpm: Long = 100): Seq[(Long, Long, Long, String)] = {
    import spark.implicits._
    CurationOps.leakproofSplit(
      ids.map(i => (i, s"d$i")).toDF("doc_id", "text"),
      pairs.toDF("a", "b"), vpm, tpm)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
  }

  /** Sequential reference: union-find components, min-id rep, MINSTD. */
  private def ref(ids: Seq[Long], pairs: Seq[(Long, Long)],
      vpm: Long, tpm: Long): Seq[(Long, Long, Long, String)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    ids.map { id =>
      val rep = if (members(id)) find(id) else id
      val u = Math.floorMod(rep * 48271L + 17L, 1000L)
      val split = if (u < tpm) "test" else if (u < tpm + vpm) "val" else "train"
      (id, rep, u, split)
    }
  }

  test("matches the reference; components share one split; singletons self-represent") {
    val ids = (1L to 30L).toSeq
    // two clusters (1,2,3,4 via chain) and (10,11), rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val got = run(ids, pairs)
    assert(got == ref(ids, pairs, 100, 100))
    val byDoc = got.map(r => r._1 -> r._4).toMap
    assert(Set(byDoc(1L), byDoc(2L), byDoc(3L), byDoc(4L)).size == 1)
    assert(byDoc(10L) == byDoc(11L))
    val reps = got.map(r => r._1 -> r._2).toMap
    assert(reps(4L) == 1L && reps(11L) == 10L && reps(20L) == 20L)
  }

  test("adding a near-dup never moves an existing cluster's split") {
    val ids = (1L to 6L).toSeq
    val before = run(ids, Seq((1L, 2L))).map(r => r._1 -> r._4).toMap
    // 7 joins cluster {1,2} via 2; min-id rep (1) is unchanged
    val after = run(ids :+ 7L, Seq((1L, 2L), (2L, 7L))).map(r => r._1 -> r._4).toMap
    assert(after(1L) == before(1L) && after(2L) == before(2L))
    assert(after(7L) == after(1L)) // and the newcomer follows the cluster
  }

  test("zero rates put everything in train; rates are validated") {
    val got = run(Seq(1L, 2L, 3L), Seq.empty, vpm = 0, tpm = 0)
    assert(got.forall(_._4 == "train"))
    intercept[IllegalArgumentException] {
      CurationOps.leakproofSplit(null, null, 600, 600)
    }
  }
}
