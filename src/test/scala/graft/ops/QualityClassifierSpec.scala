package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** Naive Bayes quality classifier vs a sequential reference: the
  * distributed trainer+scorer must reproduce the exact integer lg1024
  * class weights, unseen-token floor, doc-count prior, per-document
  * score, and zero-threshold verdict — and the verdicts must actually
  * separate a planted quality signal. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def toks(t: String): Seq[String] = t.split("\\s+").filter(_.nonEmpty).toSeq

  /** Sequential twin of CurationOps.qualityClassifier over raw strings. */
  private def ref(corpus: Seq[(Long, String)], pos: Seq[String], neg: Seq[String])
      : Seq[(Long, Long, Long, Boolean)] = {
    val pf = mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nf = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- pos; w <- toks(t)) pf(w) += 1L
    for (t <- neg; w <- toks(t)) nf(w) += 1L
    val vocab = (pf.keySet ++ nf.keySet).toSeq
    val (totP, totN, totV) = (pf.values.sum, nf.values.sum, vocab.size.toLong)
    val lg = CurationOps.lgL _
    val bias = lg(totN + totV) - lg(totP + totV)
    val prior = lg(pos.size.toLong) - lg(neg.size.toLong)
    val w = vocab.map(t => t -> (lg(pf(t) + 1) - lg(nf(t) + 1) + bias)).toMap
    corpus.map { case (id, text) =>
      val ts = toks(text)
      val s = ts.map(t => w.getOrElse(t, bias)).sum + prior
      (id, ts.size.toLong, s, s > 0)
    }
  }

  private def run(corpus: Seq[(Long, String)], pos: Seq[String], neg: Seq[String])
      : Seq[(Long, Long, Long, Boolean)] = {
    import spark.implicits._
    CurationOps.qualityClassifier(
      corpus.toDF("doc_id", "text"),
      pos.map(Tuple1(_)).toDF("text"),
      neg.map(Tuple1(_)).toDF("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
  }

  private val pos = Seq(
    "the study describes a detailed method and careful analysis of results",
    "an encyclopedia article with citations references and a thorough survey",
    "the detailed survey presents method analysis results and references")
  private val neg = Seq(
    "buy cheap pills now click here free offer",
    "click now free casino offer win money now now",
    "cheap cheap free free click here buy now")

  test("matches the sequential reference exactly, verdicts included") {
    val corpus = Seq[(Long, String)](
      1L -> "a detailed analysis with careful method and references",
      2L -> "click here free free offer buy cheap now",
      3L -> "the survey presents results click here",
      4L -> "zzz unknown tokens only qqq www", // all-unseen: floor + prior
      5L -> "", // empty: prior alone decides
      6L -> "the the the the")
    val got = run(corpus, pos, neg)
    val want = ref(corpus, pos, neg).sortBy(_._1)
    assert(got == want)
  }

  test("planted signal separates: curated-like kept, spam-like dropped") {
    val corpus = Seq[(Long, String)](
      10L -> "detailed survey method analysis citations references study",
      11L -> "free casino pills click buy cheap offer win")
    val got = run(corpus, pos, neg).map(r => r._1 -> r._4).toMap
    assert(got(10L) === true)
    assert(got(11L) === false)
  }

  test("symmetric seeds make the prior the empty-doc verdict") {
    // equal-size seed sets: prior = 0, empty doc scores 0 -> NOT kept
    // (strict zero threshold)
    val got = run(Seq(1L -> ""), pos, neg)
    assert(got == Seq((1L, 0L, 0L, false)))
  }

  /** Sequential reference of the integer Pareto noisy-threshold rule. */
  private def refPareto(scores: Seq[(Long, Long)], alpha: Int): Seq[(Long, Long, Long, Boolean)] = {
    val mn = scores.map(_._2).min
    val span = math.max(scores.map(_._2).max - mn, 1L)
    val lg = CurationOps.lgL _
    scores.map { case (id, s) =>
      val sNorm = (s - mn) * 1048576L / span
      val u = Math.floorMod(id * 48271L + 13L, 1048576L) + 1L
      val keep = lg(u) - 20480L <= -alpha.toLong * (lg(1048576L + (1048576L - sNorm)) - 20480L)
      (id, s, u, keep)
    }
  }

  test("paretoSelect matches the sequential integer rule and keeps a heavy tail") {
    import spark.implicits._
    // 1000 docs with scores 0..999: top scores always kept, bottom kept
    // with probability ~2^-alpha — visible at alpha=2
    val scores = (0L until 1000L).map(i => (i, i))
    val got = CurationOps.paretoSelect(scores.toDF("doc_id", "score"), alpha = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == refPareto(scores, 2))
    val topKept = got.filter(_._2 >= 900).count(_._4)
    val botKept = got.filter(_._2 < 100).count(_._4)
    assert(got.find(_._2 == 999).exists(_._4)) // deficit exactly 0: kept
    assert(topKept >= 90)                   // near-zero deficit: almost all
    assert(botKept > 5 && botKept < 60)     // ~2^-2 tail, not 0, not all
  }

  test("paretoSelect keeps every perfect-score doc and is degenerate-span safe") {
    import spark.implicits._
    // all-equal scores: span clamps to 1, s_norm = 0 ... wait, equal
    // scores normalize to deficit 2^20? (score-mn)=0 -> s_norm=0 ->
    // worst deficit for ALL; the rule still evaluates exactly
    val got = CurationOps.paretoSelect(
      Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("doc_id", "score"), alpha = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    val want = refPareto(Seq((1L, 7L), (2L, 7L), (3L, 7L)), 1)
      .map(r => r._1 -> r._4).toMap
    assert(got == want)
  }

  test("empty or tokenless inputs fail loudly with the actual cause (ADVICE r5)") {
    import spark.implicits._
    val docs = Seq((1L, "some text"), (2L, "more text")).toDF("doc_id", "text")
    val empty = docs.filter(col("doc_id") < 0)
    // empty seed class: the require fires BEFORE any dictionary job
    val e1 = intercept[IllegalArgumentException] {
      CurationOps.qualityClassifier(docs, empty, docs)
    }
    assert(e1.getMessage.contains("seed samples must be non-empty"))
    // non-empty but tokenless seeds: the totals guard names the cause
    val blank = Seq((9L, "   ")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      CurationOps.qualityClassifier(docs, blank, blank)
    }
    assert(e2.getMessage.contains("no tokens"))
    // paretoSelect on an empty scored frame: loud, not an NPE
    val e3 = intercept[IllegalArgumentException] {
      CurationOps.paretoSelect(
        Seq((1L, 7L)).toDF("doc_id", "score").filter(col("score") < 0))
    }
    assert(e3.getMessage.contains("non-empty scored frame"))
  }
}
