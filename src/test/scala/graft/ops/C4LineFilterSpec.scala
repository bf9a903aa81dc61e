package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** C4 line rules on a hand-built corpus: every rule branch, the page
  * verdict, order-preserving reassembly, and parameter bounds. */
class C4LineFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(docs: Seq[(Long, String)], minWords: Int = 5,
      minLines: Int = 3): Map[Long, (Int, Int, Boolean, String)] = {
    import spark.implicits._
    CurationOps.c4LineFilter(docs.toDF("doc_id", "text"), minWords, minLines)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3), r.getString(4))))
      .toMap
  }

  test("line rules: punctuation, word floor, javascript; order preserved") {
    val text = Seq(
      "this line has exactly six words.",   // kept
      "too few words here.",                // dropped: 4 words
      "no terminal punctuation on this line at all", // dropped
      "trailing spaces are fine after punctuation.   ", // kept (rtrim)
      "enable javascript to view this annoying page.", // dropped
      "is this a question with seven words?",  // kept
      "He said \"this ends with a quote\"",    // kept: quote terminal
      "ends with bang and has five words!"     // kept
    ).mkString("\n")
    val got = run(Seq((1L, text)))
    val (nLines, nKept, keep, clean) = got(1L)
    assert(nLines == 8 && nKept == 5 && keep)
    assert(clean == Seq(
      "this line has exactly six words.",
      "trailing spaces are fine after punctuation.   ",
      "is this a question with seven words?",
      "He said \"this ends with a quote\"",
      "ends with bang and has five words!").mkString("\n"))
  }

  test("page verdicts: lorem ipsum, braces, min kept lines") {
    val good = (1 to 3).map(i => s"a good line number $i stands here.").mkString("\n")
    val got = run(Seq(
      (1L, good),
      (2L, good + "\nsome Lorem Ipsum filler text appears right here."),
      (3L, good + "\nvar f = function() { return; } anyway."),
      (4L, "only two good lines survive here today.\nand this second one also survives fine.")))
    assert(got(1L)._3)
    assert(!got(2L)._3 && got(2L)._2 == 4) // line itself kept, page dropped
    assert(!got(3L)._3)
    assert(!got(4L)._3 && got(4L)._2 == 2) // under the 3-line floor
  }

  test("empty text and parameter validation") {
    val got = run(Seq((9L, "")), minWords = 1, minLines = 0)
    assert(got(9L) == ((1, 0, true, "")))
    intercept[IllegalArgumentException] {
      CurationOps.c4LineFilter(null, minWordsPerLine = 0)
    }
  }
}
