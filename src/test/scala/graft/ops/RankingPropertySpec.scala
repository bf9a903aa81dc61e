package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase
import scala.util.Random

/** Randomized invariants for the per-group ranking operators (survivor
  * selection, tf-idf salient terms): the distributed member-only argmax /
  * threshold-window plans must reproduce a straight-line sequential
  * reference exactly, including boundary-tie behavior. */
class RankingPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("dedupSurvivors: one keeper per component, content argmax, full corpus labeled") {
    import spark.implicits._
    for (seed <- Seq(31, 32, 33)) {
      val r = new Random(seed)
      val n = 50
      val docs = (0 until n).map(i => (i.toLong, r.nextInt(8).toLong * 100L))
      val pairs = Seq.fill(25)((r.nextInt(n).toLong, r.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val got = DedupOps.dedupSurvivors(
        docs.toDF("doc_id", "n_chars"), pairs.toDF("a", "b"))
        .select("doc_id", "comp", "survivor", "keep")
        .as[(Long, Long, Long, Boolean)].collect()

      // reference: union-find components, argmax(n_chars, -id) per comp
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val rt = find(p); parent(x) = rt; rt }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nchars = docs.toMap
      val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val comp = members.map(m => m -> members.filter(x => find(x) == find(m)).min).toMap
      val survivor = members.groupBy(comp).map { case (c, ms) =>
        c -> ms.minBy(m => (-nchars(m), m))
      }
      val expect = docs.map { case (id, _) =>
        val c = comp.getOrElse(id, id)
        val s = survivor.getOrElse(c, id)
        (id, c, s, id == s)
      }.toSet
      assert(got.toSet == expect, s"seed=$seed")
      // invariants: every doc labeled once; exactly one keeper per comp
      assert(got.length == n, s"seed=$seed row count")
      got.groupBy(_._2).foreach { case (c, rows) =>
        assert(rows.count(_._4) == 1, s"seed=$seed comp $c keeper count")
      }
    }
  }

  test("topTermsTfIdf: threshold semantics with boundary ties == sequential reference") {
    import spark.implicits._
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    for (seed <- Seq(41, 42)) {
      val r = new Random(seed)
      val docs = (0 until 30).map { i =>
        val words = Seq.fill(r.nextInt(20) + 1)(vocab(r.nextInt(vocab.size)))
        (i.toLong, words.mkString(" "))
      }
      val k = 3
      val got = TextOps.topTermsTfIdf(docs.toDF("doc_id", "text"), k)
        .as[(Long, String, Long, Long, Long)].collect().toSet

      val tf = docs.flatMap { case (id, t) =>
        t.split("\\s+").filter(_.nonEmpty).groupBy(identity)
          .map { case (w, ws) => (id, w, ws.length.toLong) }
      }
      val dfreq = tf.groupBy(_._2).map { case (w, rs) => w -> rs.size.toLong }
      val scored = tf.map { case (id, w, f) => (id, w, f, dfreq(w), f * 1000000L / dfreq(w)) }
      val expect = scored.groupBy(_._1).flatMap { case (_, rows) =>
        val kth = rows.map(_._5).sorted(Ordering[Long].reverse).take(k).min
        rows.filter(_._5 >= kth)
      }.toSet
      assert(got == expect, s"seed=$seed")
      // invariant: per doc, at least min(k, distinct terms) rows survive
      got.groupBy(_._1).foreach { case (id, rows) =>
        val distinctTerms = scored.count(_._1 == id)
        assert(rows.size >= math.min(k, distinctTerms), s"seed=$seed doc $id too few rows")
      }
    }
  }
}
