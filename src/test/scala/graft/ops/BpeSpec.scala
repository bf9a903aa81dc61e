package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
import scala.collection.mutable

/** BPE merge training vs a sequential Sennrich reference: the distributed
  * trainer must reproduce the exact merge sequence (pair, rank, count) of
  * the textbook algorithm — positional pair statistics over the
  * word-frequency table, (count desc, w1, w2) argmax, leftmost
  * non-overlapping application — including overlapping-run counting and
  * early exhaustion. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Sequential Sennrich reference over the same lowercased
    * whitespace-token word-frequency table. */
  private def refMerges(texts: Seq[String], n: Int): Seq[(Int, String, String, String, Long)] = {
    val wf = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- texts; w <- t.toLowerCase.split("\\s+") if w.nonEmpty) wf(w) += 1L
    var vocab: Seq[(Vector[String], Long)] =
      wf.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= n && !done) {
      val stats = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        stats((syms(i), syms(i + 1))) += f
      if (stats.isEmpty) done = true
      else {
        val ((w1, w2), cnt) =
          stats.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, w1, w2, w1 + w2, cnt))
        vocab = vocab.map { case (syms, f) =>
          val nv = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == w1 && syms(i + 1) == w2) {
              nv += (w1 + w2); i += 2
            } else { nv += syms(i); i += 1 }
          }
          (nv.result(), f)
        }
        rank += 1
      }
    }
    out.toSeq
  }

  private def run(texts: Seq[String], n: Int): Seq[(Int, String, String, String, Long)] = {
    import spark.implicits._
    BpeOps.trainMerges(texts.zipWithIndex.map(_._1).toDF("text"), n)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
  }

  test("matches the sequential reference on a mixed corpus") {
    val texts = Seq(
      "low lower newest widest low low",
      "the newest of the new lowered the bar",
      "wide wider widest widest newest",
      "lower low lowest the the the")
    val got = run(texts, 15)
    val want = refMerges(texts, 15)
    assert(got == want)
    assert(got.size == 15)
  }

  test("overlapping runs: 'aaa' counts (a,a) twice but merges to [aa, a]") {
    // freq(aaa)=1: stats (a,a)=2; after merge 1 the word is [aa, a] so
    // merge 2 must be (aa, a) with count 1 — the leftmost rule decides.
    val got = run(Seq("aaa"), 2)
    assert(got == Seq((1, "a", "a", "aa", 2L), (2, "aa", "a", "aaa", 1L)))
  }

  test("exhaustion stops early with fewer rows") {
    // single 2-char word: exactly one merge possible
    val got = run(Seq("ab"), 10)
    assert(got == Seq((1, "a", "b", "ab", 1L)))
  }

  test("tie-break is (count desc, w1, w2) ascending") {
    // "ba" and "ab" each once: counts tie at 1; (a,b) < (b,a)
    val got = run(Seq("ab ba"), 1)
    assert(got == Seq((1, "a", "b", "ab", 1L)))
  }

  test("distributed fallback (vocab over the driver bound) matches the driver loop") {
    // maxDriverVocab = 0 forces every vocabulary over the bound, so this
    // exercises the distributed per-merge loop the production path takes
    // past 2^25 words — without it the fallback would be dead code under
    // test and a future divergence would ship undetected
    import spark.implicits._
    val texts = Seq(
      "low lower newest widest low low",
      "the newest of the new lowered the bar",
      "wide wider widest widest newest",
      "lower low lowest the the the")
    val docs = texts.toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    val driver = rows(BpeOps.trainMerges(docs, 10))
    val fallback = rows(BpeOps.trainMerges(docs, 10, maxDriverVocab = 0L))
    assert(fallback == driver)
    assert(driver == refMerges(texts, 10))
  }

  /** Sequential leftmost non-overlapping application of `merges` in rank
    * order to one word's symbol sequence; returns the piece count. */
  private def refApply(word: String, merges: Seq[(String, String)]): Long = {
    var syms = word.map(_.toString).toVector
    for ((w1, w2) <- merges) {
      val nv = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == w1 && syms(i + 1) == w2) {
          nv += (w1 + w2); i += 2
        } else { nv += syms(i); i += 1 }
      }
      syms = nv.result()
    }
    syms.length.toLong
  }

  test("applyMerges reproduces sequential application on trained merges") {
    import spark.implicits._
    val texts = Seq(
      "low lower newest widest low low",
      "the newest of the new lowered the bar",
      "wide wider widest widest newest",
      "lower low lowest the the the",
      "") // empty doc: 0 tokens, 0 pieces
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeOps.trainMerges(docs, 10).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = BpeOps.applyMerges(docs, merges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      (i.toLong, ws.size.toLong, ws.map(refApply(_, merges)).sum)
    }
    assert(got == want)
    // the trained merges actually compress: fewer pieces than chars
    val chars = texts.map(_.replaceAll("\\s+", "").length.toLong).sum
    assert(got.map(_._3).sum < chars)
  }

  test("applyMerges honors rank order on chained merges") {
    // merges [(a,a),(aa,a)] on "aaaa": pass 1 -> [aa, aa]; pass 2 finds
    // no (aa, a) adjacency -> 2 pieces (NOT the 1-piece greedy-recursive
    // answer; order semantics are per-merge passes, like Sennrich)
    val got = BpeOps.applyMerges(
      { import spark.implicits._; Seq((1L, "aaaa")).toDF("doc_id", "text") },
      Seq(("a", "a"), ("aa", "a"))).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 2L)))
  }
}
