package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
import scala.util.Random

/** Gopher A1.2 repetition rules: exact parity with a sequential
  * reference on random repetitive documents, plus targeted cases for
  * each rule family. */
class GopherRepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(docs: Seq[(Long, String)]): Map[Long, Map[String, Any]] = {
    import spark.implicits._
    val df = CurationOps.gopherRepetitionFilter(docs.toDF("doc_id", "text"))
    val cols = df.columns
    df.collect().map { r =>
      r.getLong(0) -> cols.zipWithIndex.collect {
        case (c, i) if c != "doc_id" => c -> r.get(i)
      }.toMap
    }.toMap
  }

  /** Sequential twin of every metric. */
  private def ref(text: String): Map[String, Any] = {
    val lines = text.split("\n", -1).toSeq
    val paras = text.split("\n\n", -1).toSeq
    val w = text.split("\\s+").filter(_.nonEmpty).take(5000).toSeq
    def dupCount(a: Seq[String]) = (a.size - a.distinct.size).toLong
    def chars(a: Seq[String]) = a.map(_.length.toLong).sum
    def dupChars(a: Seq[String]) =
      a.groupBy(identity).map { case (v, o) => (o.size - 1).toLong * v.length }.sum
    def grams(n: Int) =
      if (w.size >= n) w.sliding(n).map(_.mkString(" ")).toSeq else Seq.empty
    def top(n: Int) = {
      val g = grams(n)
      if (g.isEmpty) 0L
      else g.groupBy(identity).map { case (v, o) =>
        o.size.toLong * (v.length - (n - 1))
      }.max
    }
    def dupCov(n: Int) = {
      val g = grams(n)
      val counts = g.groupBy(identity).map { case (v, o) => v -> o.size }
      val covered = g.zipWithIndex.collect {
        case (v, i) if counts(v) >= 2 => i until (i + n)
      }.flatten.distinct
      covered.map(p => w(p).length.toLong).sum
    }
    val nChars = chars(w)
    val m = Map(
      "n_lines" -> lines.size.toLong, "dup_lines" -> dupCount(lines),
      "line_chars" -> chars(lines), "dup_line_chars" -> dupChars(lines),
      "n_paras" -> paras.size.toLong, "dup_paras" -> dupCount(paras),
      "para_chars" -> chars(paras), "dup_para_chars" -> dupChars(paras),
      "n_chars" -> nChars,
      "top2_chars" -> top(2), "top3_chars" -> top(3), "top4_chars" -> top(4),
      "dup5_chars" -> dupCov(5), "dup6_chars" -> dupCov(6),
      "dup7_chars" -> dupCov(7), "dup8_chars" -> dupCov(8),
      "dup9_chars" -> dupCov(9), "dup10_chars" -> dupCov(10))
    def L(k: String) = m(k).asInstanceOf[Long]
    m + ("keep" -> (
      10 * L("dup_lines") <= 3 * L("n_lines") &&
      5 * L("dup_line_chars") <= L("line_chars") &&
      10 * L("dup_paras") <= 3 * L("n_paras") &&
      5 * L("dup_para_chars") <= L("para_chars") &&
      5 * L("top2_chars") <= nChars && 50 * L("top3_chars") <= 9 * nChars &&
      25 * L("top4_chars") <= 4 * nChars &&
      20 * L("dup5_chars") <= 3 * nChars && 50 * L("dup6_chars") <= 7 * nChars &&
      100 * L("dup7_chars") <= 13 * nChars && 25 * L("dup8_chars") <= 3 * nChars &&
      100 * L("dup9_chars") <= 11 * nChars && 10 * L("dup10_chars") <= nChars))
  }

  test("matches the sequential reference on random repetitive docs") {
    val rnd = new Random(53)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 12L).map { id =>
      val nLines = 2 + rnd.nextInt(6)
      val lines = (0 until nLines).map { _ =>
        val n = 3 + rnd.nextInt(12)
        (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // half the docs: duplicate a line and repeat a phrase
      val planted =
        if (id % 2 == 0) lines ++ Seq(lines.head, lines.head + " " + lines.head)
        else lines
      val sep = if (id % 3 == 0) "\n\n" else "\n"
      (id, planted.mkString(sep))
    }
    val got = run(docs)
    for ((id, text) <- docs)
      assert(got(id) == ref(text),
        s"doc $id diff=${got(id).toSet.diff(ref(text).toSet)} vs ref=${ref(text).toSet.diff(got(id).toSet)} text=${text.replace("\n", "\\n")}")
  }

  test("a heavily repeated phrase drops the doc; a clean doc survives") {
    val phrase = "click here to subscribe now"
    val spam = (1 to 8).map(_ => phrase).mkString(" ")
    // long enough that no single n-gram's char mass nears the bounds
    // (a short all-unique doc legitimately fails top-4: 4 consecutive
    // words of a 26-word doc already hold > 16% of its characters)
    val clean = (('a' to 'z') ++ ('a' to 'z')).zipWithIndex
      .map { case (c, i) => s"$c${"xy".charAt(i / 26)}${"x" * (i % 3 + 2)}" }
      .mkString(" ")
    val got = run(Seq((1L, spam), (2L, clean)))
    assert(got(1L)("keep") == false)
    assert(got(1L)("dup5_chars").asInstanceOf[Long] > 0)
    assert(got(2L)("keep") == true)
    assert(got(2L) == ref(clean))
  }

  test("duplicate paragraphs are priced separately from lines") {
    val para = "one two three\nfour five six"
    val text = para + "\n\n" + para + "\n\n" + "seven eight nine\nten eleven twelve"
    val got = run(Seq((1L, text)))(1L)
    assert(got("dup_paras") == 1L)
    assert(got("keep") == false) // 1/3 dup paragraphs > 0.30
    assert(got == ref(text))
  }
}
