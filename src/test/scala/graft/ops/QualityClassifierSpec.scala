package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
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
}
