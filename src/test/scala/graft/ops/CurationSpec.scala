package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** Line-level dedup + decontamination semantics, and the multimodal
  * header parsers (pure-JVM, independent of the fixed generator layout). */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("lineDedup: globally-first occurrence wins, within-doc repeats drop") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x\nx"),                // within-doc repeat: keep first only
      (1L, "a\nb\nshared"),        // all first occurrences
      (2L, "shared\nc\nb"),        // 'shared' and 'b' owned by doc 1
      (3L, "a\na")                 // nothing survives
    ).toDF("doc_id", "text")
    val out = CurationOps.lineDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_lines"), r.getAs[Int]("n_kept"), r.getAs[String]("text_dedup")))
      .toMap
    assert(out(0L) == ((2, 1, "x")), out(0L))
    assert(out(1L) == ((3, 3, "a\nb\nshared")), out(1L))
    assert(out(2L) == ((3, 1, "c")), out(2L))
    assert(out(3L) == ((2, 0, "")), out(3L))
  }

  test("scrubPii: emails, IPs, and phones redact with correct counts; clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (0L, "reach me at alice.smith+spam@mail-host.example.org or bob@x.io thanks"),
      (1L, "server 192.168.1.77 and 10.0.0.1 responded"),
      (2L, "call 555-123-4567 or 555.987.6543 today"),
      (3L, "mixed: eve@corp.com from 172.16.254.3 dial 800-555-0199"),
      (4L, "no pii here, just words and the number 12345"),
      (5L, "version 1.2.3.4.5 is not an ip boundary test")
    ).toDF("doc_id", "text")
    val out = CurationOps.scrubPii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ips"), r.getAs[Int]("n_phones"),
          r.getAs[String]("text_scrubbed"))).toMap
    assert(out(0L) == ((2, 0, 0, "reach me at <EMAIL> or <EMAIL> thanks")), out(0L))
    assert(out(1L) == ((0, 2, 0, "server <IP> and <IP> responded")), out(1L))
    assert(out(2L) == ((0, 0, 2, "call <PHONE> or <PHONE> today")), out(2L))
    assert(out(3L) == ((1, 1, 1, "mixed: <EMAIL> from <IP> dial <PHONE>")), out(3L))
    assert(out(4L)._4 == "no pii here, just words and the number 12345", out(4L))
    // 1.2.3.4.5: the \b-bounded quad matches the leading 1.2.3.4 (the
    // trailing .5 is outside the match) — same verdict in RE2 and Java
    assert(out(5L)._2 == 1 && out(5L)._4 == "version <IP>.5 is not an ip boundary test",
      out(5L))
  }

  test("repetitionMetrics: dup-line and top word/bigram fractions") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b\na b\nc d"),          // 3 lines, 2 distinct; words a b a b c d
      (1L, "spam spam spam spam"),    // 1 line; top word 4/4, top bigram 3/3
      (2L, "all distinct words here") // no repetition at all
    ).toDF("doc_id", "text")
    val out = CurationOps.repetitionMetrics(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_lines"), r.getAs[Double]("dup_line_frac"),
          r.getAs[Int]("n_words"), r.getAs[Double]("top_word_frac"),
          r.getAs[Double]("top_bigram_frac"))).toMap
    assert(out(0L) == ((3, 0.3333, 6, 0.3333, 0.4)), out(0L))
    assert(out(1L) == ((1, 0.0, 4, 1.0, 1.0)), out(1L))
    assert(out(2L) == ((1, 0.0, 4, 0.25, 0.3333)), out(2L))
  }

  test("lineDedup: every distinct line survives exactly once corpus-wide") {
    import spark.implicits._
    val docs = Seq(
      (10L, "p q r\ns t u\np q r"),
      (11L, "s t u\nv w x"),
      (12L, "p q r")
    ).toDF("doc_id", "text")
    val out = CurationOps.lineDedup(docs)
    val kept = out.select(explode(split(col("text_dedup"), "\n")).as("line"))
      .filter(col("line") =!= "").collect().map(_.getString(0)).toSeq
    assert(kept.sorted == Seq("p q r", "s t u", "v w x"),
      s"each distinct line must survive exactly once: $kept")
  }

  test("decontaminate: planted eval window flags only the source doc") {
    import spark.implicits._
    val contaminatedText = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, contaminatedText),                       // 10 tokens, 6 distinct 5-grams
      (2L, "alpha beta gamma delta epsilon zeta"),  // clean, 2 distinct 5-grams
      (3L, "tiny doc")                              // < n tokens: no n-grams
    ).toDF("doc_id", "text")
    // eval doc = exact 7-token window of doc 1 -> shares 3 5-grams with it
    val eval = Seq((100L, "two three four five six seven eight")).toDF("eval_id", "text")
    val out = CurationOps.decontaminate(docs, eval, n = 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_ngrams"), r.getAs[Long]("n_overlap"),
          r.getAs[Boolean]("contaminated")))
      .toMap
    assert(out(1L) == ((6, 3L, true)), out(1L))
    assert(out(2L) == ((2, 0L, false)), out(2L))
    assert(out(3L) == ((0, 0L, false)), out(3L))
  }

  test("media headers: parsed width/height/sample_rate equal the metadata") {
    val rows = MultimodalOps.syntheticMedia(spark, 200).collect()
    assert(rows.count(_.kind == "image") > 30 && rows.count(_.kind == "audio") > 30)
    rows.foreach { m =>
      val (w, h, sr) = MultimodalOps.parseHeader(m.bytes)
      assert((w, h, sr) == ((m.width, m.height, m.sample_rate)),
        s"media ${m.media_id} (${m.kind}): parsed ($w,$h,$sr) != metadata")
    }
  }

  test("media headers: JPEG marker walk skips unknown APPn segments") {
    // SOI + APP1 (len 8, arbitrary payload) + SOF0 — the generator never
    // emits this layout, so passing proves the walk is real, not an
    // offset read
    val app1 = Array[Byte](0xFF.toByte, 0xE1.toByte, 0, 8) ++ Array.fill[Byte](6)(0x41)
    val sof0 = Array[Byte](0xFF.toByte, 0xC0.toByte, 0, 17, 8,
      1, 64, // height 320
      0, 48) ++ Array.fill[Byte](10)(1) // width 48
    val bytes = Array[Byte](0xFF.toByte, 0xD8.toByte) ++ app1 ++ sof0
    assert(MultimodalOps.parseHeader(bytes) == ((48, 320, 0)))
    // truncated garbage parses to zeros, never throws
    assert(MultimodalOps.parseHeader(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)) == ((0, 0, 0)))
    assert(MultimodalOps.parseHeader(Array.emptyByteArray) == ((0, 0, 0)))
  }
}
