package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase
import scala.util.Random

/** Randomized invariants for the curation operators, each checked against
  * a straight-line Scala reference over the same corpus — the distributed
  * plans (keys-only line ownership, bucketed prefix sum, two-phase host
  * top-k) must reproduce the sequential semantics exactly on corpora with
  * heavy duplication, skewed hosts, and degenerate documents. */
class CurationPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val r = new Random(seed)
    // small vocab + shared line pool => plenty of within- and cross-doc dups
    val linePool = Vector.tabulate(12)(i => s"line $i ${"w" * (i % 3 + 1)}")
    (0 until nDocs).map { d =>
      val nLines = r.nextInt(5) + 1
      val text = Seq.fill(nLines)(
        if (r.nextBoolean()) linePool(r.nextInt(linePool.size))
        else s"unique ${d} ${r.nextInt(1000)}").mkString("\n")
      (d.toLong, text)
    }
  }

  test("lineDedup: retained lines = distinct corpus lines, each exactly once, in-doc order kept") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val docs = corpus(seed, 40)
      val out = CurationOps.lineDedup(docs.toDF("doc_id", "text"))
        .select("doc_id", "text_dedup").as[(Long, String)].collect().toMap
      // reference: first (doc_id, pos) occurrence owns each line
      val owned = scala.collection.mutable.LinkedHashMap[String, (Long, Int)]()
      docs.foreach { case (id, text) =>
        text.split("\n", -1).zipWithIndex.foreach { case (l, p) =>
          if (!owned.contains(l)) owned(l) = (id, p)
        }
      }
      docs.foreach { case (id, text) =>
        val expect = text.split("\n", -1).zipWithIndex
          .filter { case (l, p) => owned(l) == ((id, p)) }.map(_._1).mkString("\n")
        assert(out(id) == expect, s"seed=$seed doc=$id")
      }
      val retainedAll = out.values.flatMap(t => if (t.isEmpty) Nil else t.split("\n", -1)).toSeq
      assert(retainedAll.sorted == owned.keys.toSeq.filter(_.nonEmpty).sorted ||
        retainedAll.sorted == owned.keys.toSeq.sorted, s"seed=$seed corpus-wide multiset")
    }
  }

  test("packShards: bucketed prefix sum == sequential cumsum for every bucketWidth") {
    import spark.implicits._
    for (seed <- Seq(7, 8)) {
      val r = new Random(seed)
      // sparse, shuffled-insertion doc_ids; some empty docs
      val docs = (0 until 60).map { i =>
        val id = i.toLong * (r.nextInt(50) + 1)
        (id, if (r.nextInt(10) == 0) "" else Seq.fill(r.nextInt(12) + 1)("t").mkString(" "))
      }.distinctBy(_._1)
      val ref = docs.sortBy(_._1).foldLeft((0L, Map.empty[Long, (Long, Long)])) {
        case ((acc, m), (id, text)) =>
          val n = text.split("\\s+").count(_.nonEmpty).toLong
          (acc + n, m + (id -> (n, acc + n)))
      }._2
      for (width <- Seq(1L, 7L, 64L, 100000L)) {
        val got = CurationOps.packShards(docs.toDF("doc_id", "text"), budget = 13L,
          bucketWidth = width).collect()
          .map(r0 => r0.getLong(0) -> ((r0.getLong(1), r0.getLong(2), r0.getLong(3)))).toMap
        docs.foreach { case (id, _) =>
          val (n, cum) = ref(id)
          assert(got(id) == ((n, cum, (cum - n) / 13L)), s"seed=$seed width=$width doc=$id")
        }
      }
    }
  }

  test("hostQuota: two-phase verdict == plain sequential row_number for skewed hosts") {
    import spark.implicits._
    for (seed <- Seq(11, 12)) {
      val r = new Random(seed)
      // Zipf-ish: host h gets ~60/(h+1) pages -> head hosts far over cap
      val urls = (0 until 8).flatMap { h =>
        (0 until (60 / (h + 1))).map(i => s"https://h$h.example/p/${r.nextInt(100000)}")
      }.distinct
      val cap = 5
      val got = CurationOps.hostQuota(urls.toDF("url"), cap = cap, salt = 4).collect()
        .map(r0 => r0.getString(0) -> r0.getBoolean(2)).toMap
      val ref = urls.groupBy(u => u.split("/")(2)).flatMap { case (_, us) =>
        us.sorted.zipWithIndex.map { case (u, i) => u -> (i < cap) }
      }
      assert(got.size == urls.size, s"seed=$seed row count")
      ref.foreach { case (u, kept) => assert(got(u) == kept, s"seed=$seed url=$u") }
    }
  }

  test("temperatureMix: quota pipeline + two-phase selection == sequential reference") {
    import spark.implicits._
    for ((seed, budget) <- Seq((21, 40L), (22, 15L), (23, 1000L))) {
      val r = new Random(seed)
      // Zipf-ish head/tail so sqrt flattening actually reorders shares
      val urls = (0 until 8).flatMap { h =>
        (0 until (60 / (h + 1))).map(i => s"https://h$h.example/p/${r.nextInt(100000)}")
      }.distinct
      val got = CurationOps.temperatureMix(urls.toDF("url"), budget = budget, salt = 4)
        .collect()
        .map(r0 => r0.getString(0) ->
          ((r0.getLong(2), r0.getLong(3), r0.getBoolean(4)))).toMap
      // sequential reference of the pinned integer semantics
      val byHost = urls.groupBy(u => u.split("/")(2))
      val w = byHost.view.mapValues(us =>
        math.floor(math.sqrt(us.size.toDouble) * (1L << 20).toDouble).toLong).toMap
      val totalW = w.values.sum
      val step = math.max(1L, (totalW + budget - 1L) / budget)
      val ref = byHost.flatMap { case (h, us) =>
        val quota = w(h) / step
        us.sorted.zipWithIndex.map { case (u, i) =>
          u -> ((us.size.toLong, quota, i < quota))
        }
      }
      assert(got.size == urls.size, s"seed=$seed row count")
      ref.foreach { case (u, v) => assert(got(u) == v, s"seed=$seed budget=$budget url=$u") }
      // the mix respects the budget up to quantization
      val nKept = got.values.count(_._3)
      assert(nKept <= budget, s"seed=$seed kept $nKept > budget $budget")
    }
  }

  test("importanceResample: integer DSIR weights + top-k == sequential reference") {
    import spark.implicits._
    def lgL(x: Long): Long = {
      val il = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val frac = if (il >= 10) x >> (il - 10) else x << (10 - il)
      il.toLong * 1024L + frac - 1024L
    }
    for (seed <- Seq(31, 32)) {
      val r = new Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
        "eta", "theta", "iota", "kappa")
      def doc(): String =
        (0 until (1 + r.nextInt(30))).map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
      val docs = (0L until 40L).map(i => (i, doc()))
      // target skewed to the first three vocab words
      val tgt = (0 until 6).map(_ =>
        (0 until 10).map(_ => vocab(r.nextInt(3))).mkString(" "))
      val budget = 12L
      val got = CurationOps.importanceResample(
        docs.toDF("doc_id", "text"), tgt.toDF("text"), budget = budget, salt = 4)
        .collect().map(x => x.getLong(0) ->
          ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
      // sequential reference
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      val rf = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tf = tgt.flatMap(_.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val totR = rf.values.sum; val totT = tf.values.sum
      val totV = (rf.keySet ++ tf.keySet).size.toLong
      val w = rf.map { case (k, rc) =>
        k -> (lgL(tf.getOrElse(k, 0L) + 1) - lgL(rc + 1) + lgL(totR + totV) - lgL(totT + totV))
      }
      val scores = toks.map { case (id, ts) =>
        (id, ts.size.toLong, ts.map(w).sum)
      }
      val keptIds = scores.sortBy { case (id, _, s) => (-s, id) }.take(budget.toInt)
        .map(_._1).toSet
      scores.foreach { case (id, n, s) =>
        assert(got(id) == ((n, s, keptIds(id))), s"seed=$seed doc=$id")
      }
      assert(got.values.count(_._3) == budget, s"seed=$seed kept count")
    }
  }

  test("perplexityBuckets: integer bigram LM + terciles == sequential reference") {
    import spark.implicits._
    def lgL(x: Long): Long = {
      val il = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val frac = if (il >= 10) x >> (il - 10) else x << (10 - il)
      il.toLong * 1024L + frac - 1024L
    }
    for (seed <- Seq(41, 42)) {
      val r = new Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      def doc(minLen: Int): String =
        (0 until (minLen + r.nextInt(25))).map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
      // include a one-token doc to exercise the 'short' bucket
      val docs = (0L until 30L).map(i => (i, if (i == 7L) "alpha" else doc(2)))
      val tgt = (0 until 5).map(_ => doc(8))
      val got = CurationOps.perplexityBuckets(docs.toDF("doc_id", "text"), tgt.toDF("text"))
        .collect().map(x => x.getLong(0) ->
          ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))).toMap
      // sequential reference
      def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
      val tBi = tgt.map(toks).flatMap(w => w.zip(w.drop(1)))
      val c2 = tBi.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = tBi.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val v = tgt.flatMap(toks).distinct.size.toLong
      val scored = docs.map { case (id, t) =>
        val w = toks(t); val bi = w.zip(w.drop(1))
        val nll = bi.map(b => lgL(c1.getOrElse(b._1, 0L) + v) - lgL(c2.getOrElse(b, 0L) + 1)).sum
        val ppl = if (bi.nonEmpty) nll / bi.size else 0L
        (id, bi.size.toLong, nll, ppl)
      }
      val ppls = scored.filter(_._2 >= 1).map(_._4).sorted
      val n = ppls.size.toLong
      def thr(p: Int): Long = ppls((((p * n + 99) / 100) - 1).toInt)
      val (t33, t67) = (thr(33), thr(67))
      scored.foreach { case (id, nb, nll, ppl) =>
        val bucket = if (nb == 0) "short"
          else if (ppl <= t33) "head" else if (ppl <= t67) "middle" else "tail"
        assert(got(id) == ((nb, nll, ppl, bucket)), s"seed=$seed doc=$id")
      }
      assert(got(7L)._4 == "short", s"seed=$seed short bucket")
    }
  }

  test("spanDedup: distributed spans == sequential window-count + island merge") {
    import spark.implicits._
    val k = 3
    for (seed <- Seq(31, 32, 33)) {
      val r = new Random(seed)
      // tiny vocab => dense window collisions, within- AND cross-doc
      val docs = (0 until 30).map { d =>
        val n = r.nextInt(20) + 1
        (d.toLong, Seq.fill(n)(s"t${r.nextInt(6)}").mkString(" "))
      }
      val got = CurationOps.spanDedup(docs.toDF("doc_id", "text"), k = k).collect()
        .map(r0 => r0.getAs[Long]("doc_id") ->
          ((r0.getAs[Int]("n_tokens"), r0.getAs[Long]("n_dup_spans"),
            r0.getAs[Long]("dup_tokens"), r0.getAs[Double]("dup_frac")))).toMap
      // sequential reference: count every k-window corpus-wide, then per
      // doc merge duplicated window starts with the gap<=k rule
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toVector }
      val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
      toks.foreach { case (_, w) =>
        (0 to w.size - k).foreach(i => counts(w.slice(i, i + k).mkString(" ")) += 1)
      }
      toks.foreach { case (id, w) =>
        val dupPos = (0 to w.size - k).filter(i => counts(w.slice(i, i + k).mkString(" ")) >= 2)
        var spans = List.empty[(Int, Int)] // (first, last) window starts
        dupPos.foreach { p =>
          spans = spans match {
            case (f, l) :: rest if p - l <= k => (f, p) :: rest
            case s => (p, p) :: s
          }
        }
        val dupTok = spans.map { case (f, l) => (l - f + k).toLong }.sum
        val frac = BigDecimal(dupTok.toDouble / math.max(w.size, 1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(id) == ((w.size, spans.size.toLong, dupTok, frac)), s"seed=$seed doc=$id")
      }
    }
  }

  test("sampleStratified: verdict is exactly the documented residue formula") {
    import spark.implicits._
    val r = new Random(21)
    val docs = (0 until 80).map { i =>
      (r.nextInt(1000000).toLong, Seq.fill(r.nextInt(100) + 1)(s"w${r.nextInt(9)}").mkString(" "))
    }.distinctBy(_._1)
    val rates = Map("long" -> 0.9, "mid" -> 0.4, "short" -> 0.05)
    val got = CurationOps.sampleStratified(docs.toDF("doc_id", "text"), rates).collect()
      .map(r0 => r0.getLong(0) -> ((r0.getString(1), r0.getBoolean(3)))).toMap
    docs.foreach { case (id, text) =>
      val nw = text.split("[^a-z0-9]+").count(_.nonEmpty)
      val stratum = if (nw >= 60) "long" else if (nw >= 20) "mid" else "short"
      val u = (id * CurationOps.SampleMult + 11L) % CurationOps.SampleMod
      val kept = u < (rates(stratum) * CurationOps.SampleMod).toLong
      assert(got(id) == ((stratum, kept)), s"doc=$id")
    }
  }
}
