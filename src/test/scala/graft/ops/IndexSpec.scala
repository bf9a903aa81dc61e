package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
import scala.util.Random

/** Inverted-index and BM25-search semantics: handcrafted corpora for the
  * df band / posting-list / tie-break contracts, then randomized corpora
  * against straight-line sequential references replaying the identical
  * integer arithmetic (the repo's bit-exact rule — no approximate
  * agreement, the distributed plan must equal the reference EXACTLY). */
class IndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def seqToks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def seqGrams(text: String, n: Int): Seq[String] = {
    val w = seqToks(text)
    if (w.size < n) Seq.empty else w.sliding(n).map(_.mkString(" ")).toSeq
  }

  /** Sequential inverted index: (term, df, tf_total, postings). */
  private def seqIndex(docs: Seq[(Long, String)], n: Int, minDf: Long,
                       maxDfMilli: Long): Set[(String, Long, Long, String)] = {
    val maxDf = math.max(minDf, docs.size.toLong * maxDfMilli / 1000L)
    val tf = docs.flatMap { case (id, t) =>
      seqGrams(t, n).groupBy(identity).map { case (g, xs) => (g, id, xs.size.toLong) }
    }
    tf.groupBy(_._1).collect {
      case (g, rows) if rows.size >= minDf && rows.size <= maxDf =>
        (g, rows.size.toLong, rows.map(_._3).sum,
          rows.map(_._2).sorted.mkString(","))
    }.toSet
  }

  test("invertedIndex: df band, postings, totals on a handcrafted corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat"),          // grams: "the cat", "cat sat"
      (1L, "the cat ran"),          // "the cat", "cat ran"
      (2L, "the cat sat"),          // repeats doc 0's grams
      (3L, "The  Cat sat  "),       // case/whitespace-normalizes to doc 0
      (4L, "a dog"),                // "a dog" is hapax -> excluded by minDf
      (5L, "x"),                    // < 2 tokens -> no grams at all
      (6L, "cat sat cat sat")       // in-doc repeat: tf=2 for "cat sat", plus "sat cat"
    ).toDF("doc_id", "text")
    val got = IndexOps.invertedIndex(docs, n = 2, minDf = 2L, maxDfMilli = 800L)
      .as[(String, Long, Long, String)].collect().toSet
    // 7 docs, maxDf = 7*800/1000 = 5: "the cat" has df 4 (kept),
    // "cat sat" df 4 with tf_total 5 (kept), "cat ran"/"sat cat"/"a dog" hapax
    assert(got == Set(
      ("the cat", 4L, 4L, "0,1,2,3"),
      ("cat sat", 4L, 5L, "0,2,3,6")), got)
  }

  test("invertedIndex: the maxDf band drops the stopword gram") {
    import spark.implicits._
    val docs = ((0L until 10L).map(i => (i, s"common pair uniq$i tail")))
      .toDF("doc_id", "text")
    // "common pair" df=10 > maxDf floor(10*500/1000)=5 -> dropped;
    // "pair uniqN"/"uniqN tail" hapax -> dropped; nothing survives
    assert(IndexOps.invertedIndex(docs, n = 2, minDf = 2L, maxDfMilli = 500L)
      .count() == 0L)
  }

  test("invertedIndex: random corpora == sequential reference") {
    import spark.implicits._
    val vocab = Vector("ant", "bee", "cow", "dog", "elk", "fox")
    for (seed <- Seq(71, 72, 73)) {
      val r = new Random(seed)
      val docs = (0L until 40L).map { i =>
        (i, Seq.fill(2 + r.nextInt(12))(vocab(r.nextInt(vocab.size))).mkString(" "))
      }
      val got = IndexOps.invertedIndex(docs.toDF("doc_id", "text"),
          n = 2, minDf = 2L, maxDfMilli = 300L)
        .as[(String, Long, Long, String)].collect().toSet
      assert(got == seqIndex(docs, 2, 2L, 300L), s"seed=$seed")
    }
  }

  /** Sequential BM25 surrogate — the exact integer formula from
    * [[IndexOps.bm25Search]]'s scaladoc, replayed with Long math. */
  private def seqBm25(docs: Seq[(Long, String)], terms: Seq[String],
                      k: Int): Seq[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => (id, seqToks(t)) }
    val n = docs.size.toLong
    val tt = toks.map(_._2.size.toLong).sum
    val q = terms.map(_.toLowerCase).distinct.toSet
    val tf = toks.flatMap { case (id, w) =>
      w.filter(q).groupBy(identity).map { case (t, xs) =>
        (id, w.size.toLong, t, xs.size.toLong)
      }
    }
    val df = tf.groupBy(_._3).map { case (t, rows) => t -> rows.size.toLong }
    val scored = tf.groupBy(_._1).map { case (id, rows) =>
      val s = rows.map { case (_, dl, t, f) =>
        val dlr = dl * 1000L * n / tt
        val denom = f * 1000000L + (IndexOps.BmK1Milli * (250000L + IndexOps.BmBMilli * dlr)) / 1000L
        val tfn = f * 2200L * 1000000L / denom
        val idf = (n - df(t)) * 1000L / (df(t) + 1L)
        idf * tfn
      }.sum
      (id, s, rows.size.toLong)
    }
    scored.toSeq.sortBy { case (id, s, _) => (-s, id) }.take(k)
  }

  test("bm25Search: handcrafted ranking — tf, idf rarity, and length norm all bite") {
    import spark.implicits._
    val docs = Seq(
      (0L, "dup dup dup filler"),                 // highest tf for the rare term
      (1L, "dup merge"),                          // one rare + one common hit, short
      (2L, "merge merge merge merge"),            // common term only
      (3L, "vector merge " + Seq.fill(40)("pad").mkString(" ")), // long doc: length-normalized down
      (4L, "nothing relevant here")               // no hits -> absent
    ).toDF("doc_id", "text")
    val got = IndexOps.bm25Search(docs, Seq("dup", "vector", "merge"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val want = seqBm25(Seq(
      (0L, "dup dup dup filler"), (1L, "dup merge"),
      (2L, "merge merge merge merge"),
      (3L, "vector merge " + Seq.fill(40)("pad").mkString(" ")),
      (4L, "nothing relevant here")), Seq("dup", "vector", "merge"), 10)
    assert(got == want, s"got=$got want=$want")
    assert(!got.exists(_._1 == 4L), "a no-hit doc must not appear")
    // the doc with the most rare-term mass outranks the common-term doc
    assert(got.map(_._1).indexOf(0L) < got.map(_._1).indexOf(2L))
  }

  test("bm25Search: random corpora == sequential reference, bit-exact") {
    import spark.implicits._
    val vocab = Vector("ant", "bee", "cow", "dog", "elk", "fox", "gnu", "hen")
    for (seed <- Seq(81, 82, 83)) {
      val r = new Random(seed)
      val docs = (0L until 50L).map { i =>
        (i, Seq.fill(3 + r.nextInt(20))(vocab(r.nextInt(vocab.size))).mkString(" "))
      }
      val terms = Seq("ant", "fox", "HEN") // mixed case: query lowercases
      val got = IndexOps.bm25Search(docs.toDF("doc_id", "text"), terms, k = 15)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == seqBm25(docs, terms, 15), s"seed=$seed")
    }
  }
}
