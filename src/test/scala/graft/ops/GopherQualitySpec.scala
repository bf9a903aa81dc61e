package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** Gopher quality rules on hand-built documents: each rule flips the
  * verdict independently; metrics are exact integers. */
class GopherQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(docs: Seq[(Long, String)], minWords: Int = 5):
      Map[Long, (Long, Long, Long, Long, Long, Long, Long, Long, Long, Boolean)] = {
    import spark.implicits._
    CurationOps.gopherQualityFilter(docs.toDF("doc_id", "text"), minWords)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9), r.getBoolean(10))))
      .toMap
  }

  // a healthy base document: 12 words, 2 stop words, all alphabetic
  private val base = "the quick brown fox jumps over lazy dogs and cats every day"

  test("the base document passes; metrics are exact") {
    val m = run(Seq((1L, base)))(1L)
    val (nW, nC, nH, nE, nL, nB, nEl, nA, nS, keep) = m
    assert(nW == 12 && nC == base.count(_ != ' ') && nH == 0 && nE == 0)
    assert(nL == 1 && nB == 0 && nEl == 0 && nA == 12 && nS == 2 && keep)
  }

  test("each rule flips the verdict on its own") {
    val docs = Seq(
      2L -> "too short.",                                     // word floor
      3L -> (base + " aa1 " + Seq.fill(4)("99 12 44").mkString(" ")), // <80% alpha
      4L -> (base + " ## # ###"),                             // hash ratio
      5L -> (base + " ... ... ... ..."),                      // ellipsis ratio
      6L -> ((1 to 10).map(i => s"- bullet line $i").mkString("\n") + "\n" + base),
      7L -> ((1 to 4).map(i => s"line that trails off $i...").mkString("\n") + "\n" + base + "\n" + base),
      8L -> "alpha bravo charlie delta echo foxtrot golf hotel india juliet", // 0 stop words
      9L -> (base.split(" ").map(w => w + w + w).mkString(" ")) // mean len > 10
    )
    val got = run(docs)
    assert(got.values.forall(!_._10), s"all must drop: $got")
    // and the specific metric that kills each one
    assert(got(2L)._1 < 5)
    assert(got(3L)._8 * 5 < got(3L)._1 * 4)
    assert(got(4L)._3 * 10 > got(4L)._1)
    assert(got(5L)._4 * 10 > got(5L)._1)
    assert(got(6L)._6 * 10 > got(6L)._5 * 9)
    assert(got(7L)._7 * 10 > got(7L)._5 * 3)
    assert(got(8L)._9 == 0)
    assert(got(9L)._2 > got(9L)._1 * 10)
  }

  test("unicode ellipsis lines and bullet dots count") {
    val text = base + "\n• a bullet with the dot char\nit trails off with unicode…"
    val m = run(Seq((1L, text)))(1L)
    assert(m._6 == 1 && m._7 == 1)
  }
}
