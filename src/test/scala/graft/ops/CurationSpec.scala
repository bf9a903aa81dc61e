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

  test("hostBoilerplate: host-frequent lines strip everywhere, small hosts bypass") {
    import spark.implicits._
    val docs = Seq(
      // host A (4 docs): "nav" in 3/4 (750 >= 500 milli -> boilerplate),
      // "rare" in 1/4 (250 < 500 -> kept)
      (0L, "A", "nav\nalpha"),
      (1L, "A", "nav\nbeta\nrare"),
      (2L, "A", "nav"),
      (3L, "A", "gamma"),
      // host B (2 docs < minDocs=3): nothing removed even at 2/2
      (4L, "B", "nav\ndelta"),
      (5L, "B", "nav"),
      // host C (4 docs): boundary case, exactly 2/4 = 500 milli -> removed
      (6L, "C", "foot\neps"),
      (7L, "C", "foot"),
      (8L, "C", "zeta"),
      (9L, "C", "eta")
    ).toDF("doc_id", "host", "text")
    val out = CurationOps.hostBoilerplate(docs, minDocs = 3L, minDocFracMilli = 500L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_lines"), r.getAs[Int]("n_removed"),
          r.getAs[String]("text_clean"))))
      .toMap
    assert(out(0L) == ((2, 1, "alpha")), out(0L))
    assert(out(1L) == ((3, 1, "beta\nrare")), out(1L))
    assert(out(2L) == ((1, 1, "")), out(2L))
    assert(out(3L) == ((1, 0, "gamma")), out(3L))
    assert(out(4L) == ((2, 0, "nav\ndelta")), out(4L))
    assert(out(5L) == ((1, 0, "nav")), out(5L))
    assert(out(6L) == ((2, 1, "eps")), out(6L))
    assert(out(7L) == ((1, 1, "")), out(7L))
    assert(out(8L) == ((1, 0, "zeta")), out(8L))
    assert(out(9L) == ((1, 0, "eta")), out(9L))
  }

  test("hostBoilerplate: removal is host-scoped — the same line survives on a quiet host") {
    import spark.implicits._
    val docs = Seq(
      (0L, "X", "promo\na"), (1L, "X", "promo\nb"), (2L, "X", "promo\nc"),
      (3L, "Y", "promo\nd"), (4L, "Y", "e"), (5L, "Y", "f"), (6L, "Y", "g")
    ).toDF("doc_id", "host", "text")
    val out = CurationOps.hostBoilerplate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_clean")).toMap
    // promo is 3/3 on X (stripped) but 1/4 on Y (kept)
    assert(out(0L) == "a" && out(1L) == "b" && out(2L) == "c")
    assert(out(3L) == "promo\nd")
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

  test("packShards: bucketed prefix sum equals the sequential cumsum, shards split on budget") {
    import spark.implicits._
    // 10 docs of 5 tokens each, budget 12: shards hold docs by their
    // STARTING token offset — 0,5,10 -> shard 0; 15,20 -> 1; 25,30,35 -> 2...
    val docs = (0L until 10L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val out = CurationOps.packShards(docs, budget = 12L, bucketWidth = 3L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = (0L until 10L).map { i =>
      val cum = (i + 1) * 5
      (i, 5L, cum, (cum - 5) / 12)
    }
    assert(out.toSeq == expected, out.toSeq)
    // bucketWidth must not affect the answer (pure parallelism knob)
    val wide = CurationOps.packShards(docs, budget = 12L, bucketWidth = 1000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(wide.toSeq == expected, "bucketWidth changed the packing")
  }

  test("packShards: sparse doc_ids and uneven lengths still pack by global order") {
    import spark.implicits._
    val docs = Seq(
      (3L, "one two three"),           // 3 tokens, cum 3, shard 0
      (100L, "a b c d e f g"),         // 7 tokens, cum 10, starts at 3 -> shard 0
      (2000L, "x y"),                  // 2 tokens, cum 12, starts at 10 -> shard 1
      (2001L, "z")                     // 1 token, cum 13, starts at 12 -> shard 1
    ).toDF("doc_id", "text")
    val out = CurationOps.packShards(docs, budget = 10L, bucketWidth = 8L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((3L, 3L, 0L), (100L, 10L, 0L), (2000L, 12L, 1L), (2001L, 13L, 1L)), out)
  }

  test("the curation stack composes: line-dedup -> decontaminate -> scrub -> host quota -> pack") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://a.example/p/1", "alpha beta gamma\ncommon footer line"),
      (2L, "https://a.example/p/2", "delta epsilon zeta\ncommon footer line"),
      (3L, "https://a.example/p/3", "eta theta iota\ncommon footer line"),
      (4L, "https://b.example/p/1", "kappa lambda mu mail me at k@b.example"),
      (5L, "https://b.example/p/2", (0 until 20).map(i => s"eval$i").mkString(" "))
    ).toDF("doc_id", "url", "text")
    val evalDocs = Seq((900L, (0 until 20).map(i => s"eval$i").mkString(" ")))
      .toDF("eval_id", "text")
    // 1. line-dedup: the shared footer survives only in doc 1
    val deduped = CurationOps.lineDedup(docs.select("doc_id", "text"))
      .select(col("doc_id"), col("text_dedup").as("text"))
    // 2. decontamination (n=13): doc 5 holds a full eval window, flag it
    val contaminated = CurationOps.decontaminate(deduped, evalDocs, n = 13)
      .filter(col("contaminated")).select("doc_id")
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    // 3. PII scrub
    val scrubbed = CurationOps.scrubPii(clean)
      .select(col("doc_id"), col("text_scrubbed").as("text"))
    // 4. host quota (cap 2 on host a drops doc 3, the highest url)
    val kept = CurationOps.hostQuota(docs.select("url", "doc_id"), cap = 2)
    val keptDocs = scrubbed.join(
      docs.select("doc_id", "url").join(kept.filter(col("kept")).select("url"), Seq("url")),
      Seq("doc_id"))
    // 5. pack the survivors
    val packed = CurationOps.packShards(keptDocs.select("doc_id", "text"), budget = 8L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    // survivors: 1, 2 (footer deduped away), 4 (email scrubbed); 3 quota-dropped, 5 contaminated
    assert(packed.map(_._1) == Seq(1L, 2L, 4L), packed)
    // doc 1 keeps both lines (5 tokens incl. footer? 3 + 3... footer is 3 tokens: 6);
    // docs 2/3 lost the footer (3 tokens); doc 4's email became one <EMAIL> token
    val tok = packed.map(p => p._1 -> p._2).toMap
    assert(tok(1L) == 6L && tok(2L) == 3L && tok(4L) == 7L, tok)
    // shard assignment follows the running total over survivors only
    assert(packed.map(_._3) == Seq(0L, 0L, 1L), packed)
    // the scrubbed text replaced the address
    val t4 = scrubbed.filter(col("doc_id") === 4L).select("text").as[String].head()
    assert(t4.endsWith("mail me at <EMAIL>"), t4)
  }

  test("chunkDocuments: overlapping windows cover the stream, final chunk short") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                     // shorter than one chunk
      (3L, "")                                         // no tokens -> no chunks
    ).toDF("doc_id", "text")
    val out = CurationOps.chunkDocuments(docs, chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    // step 3: starts 0,3,6,9 -> windows [1..4],[4..7],[7..10],[10]
    assert(out == Seq(
      (1L, 0, 4, "t1 t2 t3 t4"),
      (1L, 1, 4, "t4 t5 t6 t7"),
      (1L, 2, 4, "t7 t8 t9 t10"),
      (1L, 3, 1, "t10"),
      (2L, 0, 2, "a b")), out)
    // overlap reconstruction: dropping the first `overlap` tokens of every
    // non-first chunk re-concatenates to the original token stream
    val rebuilt = out.filter(_._1 == 1L).zipWithIndex.flatMap { case ((_, _, _, txt), i) =>
      val ts = txt.split(" ").toSeq
      if (i == 0) ts else ts.drop(1)
    }
    assert(rebuilt == (1 to 10).map(i => s"t$i"), rebuilt)
    intercept[IllegalArgumentException] {
      CurationOps.chunkDocuments(docs, chunkTokens = 4, overlap = 4)
    }
  }

  test("edge cases: empty corpus and empty/whitespace texts never throw") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CurationOps.packShards(empty, budget = 100L).count() == 0)
    assert(CurationOps.repetitionMetrics(empty).count() == 0)
    assert(CurationOps.scrubPii(empty).count() == 0)
    assert(CurationOps.hostQuota(empty.select(col("doc_id").cast("string").as("url")),
      cap = 3).count() == 0)
    val blank = Seq((1L, ""), (2L, "   "), (3L, "\n\n")).toDF("doc_id", "text")
    val rm = CurationOps.repetitionMetrics(blank).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_words"), r.getAs[Double]("top_word_frac"),
          r.getAs[Double]("top_bigram_frac"))).toMap
    assert(rm(1L) == ((0, 0.0, 0.0)) && rm(2L) == ((0, 0.0, 0.0)), rm)
    val ps = CurationOps.packShards(blank, budget = 10L).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(ps == Seq((1L, 0L, 0L, 0L), (2L, 0L, 0L, 0L), (3L, 0L, 0L, 0L)), ps)
    val sc = CurationOps.scrubPii(blank).collect()
    assert(sc.forall(r => r.getAs[Int]("n_emails") == 0), sc.toSeq)
  }

  test("sampleStratified: strata by length band, verdict from the MINSTD residue") {
    import spark.implicits._
    val mkWords = (n: Int) => (0 until n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, mkWords(70)),  // long
      (1L, mkWords(30)),  // mid
      (2L, mkWords(5))    // short
    ).toDF("doc_id", "text")
    val rates = Map("long" -> 1.0, "mid" -> 0.5, "short" -> 0.0)
    val out = CurationOps.sampleStratified(docs, rates).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSeq
    def u(id: Long) = (id * CurationOps.SampleMult + 11L) % CurationOps.SampleMod
    assert(out == Seq(
      (0L, "long", u(0), true),                     // rate 1.0 keeps everything
      (1L, "mid", u(1), u(1) < 50001L),
      (2L, "short", u(2), false)), out)             // rate 0.0 drops everything
  }

  test("hostQuota: over-cap hosts keep the first cap urls, under-cap hosts bypass") {
    import spark.implicits._
    // host a: 6 pages over cap 3; host b: 2 pages (under cap, no ranking)
    val urls = ((1 to 6).map(i => s"https://a.example/page/$i") ++
      (1 to 2).map(i => s"https://b.example/page/$i")).toDF("url")
    val got = CurationOps.hostQuota(urls, cap = 3, salt = 4).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got.size == 8, got)
    (1 to 3).foreach(i => assert(got(s"https://a.example/page/$i") == (("a.example", true)), got))
    (4 to 6).foreach(i => assert(got(s"https://a.example/page/$i") == (("a.example", false)), got))
    (1 to 2).foreach(i => assert(got(s"https://b.example/page/$i") == (("b.example", true)), got))
    // two-phase result is salt-invariant (pure parallelism knob)
    val s1 = CurationOps.hostQuota(urls, cap = 3, salt = 1).collect()
      .map(r => (r.getString(0), r.getBoolean(2))).toSet
    val s16 = CurationOps.hostQuota(urls, cap = 3, salt = 16).collect()
      .map(r => (r.getString(0), r.getBoolean(2))).toSet
    assert(s1 == s16, "salt changed the verdict")
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

  test("exactQuantiles: pinned integer tie rule matches a sequential reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 2000).map(i => (s"g${i % 3}", (rnd.nextInt(50) * 10).toLong))
    val pcts = Seq(1, 50, 90, 99, 100)
    val got = CurationOps.exactQuantiles(
        rows.toDF("lang", "n_chars").repartition(7), "lang", "n_chars", pcts)
      .as[(String, Int, Long)].collect()
      .map { case (g, p, v) => (g, p) -> v }.toMap

    val expect = rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.size.toLong
      pcts.map { p =>
        val rank = (p * n + 99) / 100 // ceil(p*n/100), >= 1 for p >= 1
        (g, p) -> sorted((rank - 1).toInt)
      }
    }
    assert(got == expect.toMap)
    // boundary semantics: p=100 is the max, p=1 on n>=100 is the min bucket
    assert(got(("g0", 100)) == rows.filter(_._1 == "g0").map(_._2).max)
    // duplicates in the value column must not shift ranks
    val dup = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 7L))
    val d = CurationOps.exactQuantiles(dup.toDF("lang", "n_chars"), "lang", "n_chars", Seq(50, 75, 100))
      .as[(String, Int, Long)].collect().map { case (_, p, v) => p -> v }.toMap
    assert(d == Map(50 -> 5L, 75 -> 5L, 100 -> 7L))
  }

  test("curationVerdict: first failing rule wins, clean doc keeps") {
    import spark.implicits._
    val good = Seq.fill(10)("the cat and the dog of the house is big to see").mkString(" ")
    val docs = Seq(
      (1L, good),                                    // keep
      (2L, good.take(200)),                          // near-dup of 1, less content -> duplicate
      (3L, "zzz qqq yyy"),                           // passes quality, no stopwords -> no_lang
      (4L, Seq.fill(100)("the").mkString(" ")),      // top_word_frac 1.0 -> repetitive_words
      (5L, "...,,,;;;!!!???")                        // all punctuation -> low_quality
    ).map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val r = CurationOps.curationVerdict(docs, pairs)
      .select("doc_id", "reason", "keep")
      .as[(Long, String, Boolean)].collect()
      .map { case (id, re, k) => id -> ((re, k)) }.toMap
    assert(r(1L) == (("keep", true)), r)
    assert(r(2L) == (("duplicate", false)), r)
    assert(r(3L) == (("no_lang", false)), r)
    assert(r(4L) == (("repetitive_words", false)), r)
    assert(r(5L) == (("low_quality", false)), r)
  }

  test("spanDedup: cross-doc shared passages merge into maximal spans") {
    import spark.implicits._
    val docs = Seq(
      // 10 tokens; "the quick brown fox jumps high" shared with doc 1 at
      // positions 2..7 -> duplicated k=4 windows start at 2,3,4 -> ONE
      // merged span of 4-2+4 = 6 tokens
      (0L, "a1 a2 the quick brown fox jumps high a3 a4"),
      // 7 tokens; same passage at positions 1..6 -> span 6, frac 6/7
      (1L, "b1 the quick brown fox jumps high"),
      // within-doc repetition: "x y z w" at 0 and 6, gap 6 > k=4 -> TWO
      // separate 4-token spans
      (2L, "x y z w p q x y z w"),
      // under k tokens: no windows, zero spans
      (3L, "u v"),
      // 8 tokens fully shared with doc 5: windows 0..4 all duplicated ->
      // one island covering the whole doc
      (4L, "d1 d2 d3 d4 d5 d6 d7 d8"),
      (5L, "d1 d2 d3 d4 d5 d6 d7 d8")
    ).toDF("doc_id", "text")
    val out = CurationOps.spanDedup(docs, k = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_frac"))))
      .toMap
    assert(out(0L) == ((10, 1L, 6L, 0.6)), out(0L))
    assert(out(1L) == ((7, 1L, 6L, 0.8571)), out(1L))
    assert(out(2L) == ((10, 2L, 8L, 0.8)), out(2L))
    assert(out(3L) == ((2, 0L, 0L, 0.0)), out(3L))
    assert(out(4L) == ((8, 1L, 8L, 1.0)), out(4L))
    assert(out(5L) == ((8, 1L, 8L, 1.0)), out(5L))
  }
}
