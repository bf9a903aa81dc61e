package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
import scala.util.Random

/** Asymmetric containment join: brute-force parity when the df cap is
  * open, detection of the quote-inside-aggregator pairs Jaccard misses,
  * and the boilerplate guard (common shingles nominate nothing). */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** String-space twin of TextHash tokenization + 3-shingles (same as
    * PrefixSimJoinSpec). */
  private def shingleStrings(text: String, w: Int = 3): Set[String] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    if (toks.isEmpty) Set.empty
    else if (toks.size >= w) toks.sliding(w).map(_.mkString(" ")).toSet
    else Set(toks.mkString(" "))
  }

  private def run(docs: Seq[(Long, String)], tn: Int, td: Int,
      maxDf: Long): Map[(Long, Long), (Long, Long, Long)] = {
    import spark.implicits._
    DedupOps.containmentJoin(docs.toDF("doc_id", "text"), tn, td, 3, maxDf)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4))))
      .toMap
  }

  /** Brute-force reference with the SAME candidate rule: a pair is
    * nominated iff it shares a shingle whose document frequency is in
    * [2, maxDf]; verification is exact on the full sets. */
  private def ref(docs: Seq[(Long, String)], tn: Int, td: Int,
      maxDf: Long): Map[(Long, Long), (Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> shingleStrings(t) }.toMap
    val df = docs.flatMap(d => sets(d._1)).groupBy(identity).map {
      case (sh, occ) => sh -> occ.size.toLong
    }
    (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      shared = sets(a) & sets(b)
      if shared.exists(sh => df(sh) >= 2 && df(sh) <= maxDf)
      inter = shared.size.toLong
      (ma, mb) = (sets(a).size.toLong, sets(b).size.toLong)
      if inter * td >= math.min(ma, mb) * tn
    } yield (a, b) -> ((inter, ma, mb))).toMap
  }

  test("containmentJoin == brute-force under the same df cap, random corpora") {
    val vocab = Vector("red", "blue", "green", "ochre", "teal", "plum",
      "rust", "sage", "pearl", "onyx", "jade", "coral")
    for (seed <- Seq(71, 72); maxDf <- Seq(3L, 1000L)) {
      val r = new Random(seed)
      def doc(): String =
        (0 until (3 + r.nextInt(25))).map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
      val big = doc() + " " + doc() + " " + doc()
      val docs = (0L until 25L).map {
        case 0L => (0L, big)
        case 1L => (1L, big.split(" ").take(8).mkString(" ")) // contained head
        case i  => (i, doc())
      }
      val (got, want) = (run(docs, 4, 5, maxDf), ref(docs, 4, 5, maxDf))
      assert(got == want, s"seed=$seed maxDf=$maxDf")
    }
  }

  test("finds the quoted-paragraph pair symmetric Jaccard misses") {
    // quote = 10 distinct words inside a 100-word page: containment = 1,
    // Jaccard ~ 8/98 — far below any near-dup threshold
    val words = (1 to 100).map(i => s"w$i")
    val page = words.mkString(" ")
    val quote = words.slice(40, 50).mkString(" ")
    val docs = Seq((1L, page), (2L, quote),
      (3L, (1 to 30).map(i => s"z$i").mkString(" ")))
    val got = run(docs, 4, 5, maxDf = 64)
    assert(got.contains((1L, 2L)), "containment pair missed")
    val (inter, ma, mb) = got((1L, 2L))
    assert(inter == math.min(ma, mb)) // full containment
    // the same pair fails a Jaccard-1/2 test by a wide margin
    val j = inter.toDouble / (ma + mb - inter)
    assert(j < 0.1)
    assert(DedupOps.prefixSimJoin(
      { import spark.implicits._; docs.toDF("doc_id", "text") },
      tn = 1, td = 2).collect().isEmpty)
  }

  test("boilerplate shared by more than maxDf docs nominates nothing") {
    // one common sentence on every page, otherwise disjoint bodies
    val boiler = "subscribe to our newsletter today"
    val docs = (0L until 10L).map(i =>
      (i, s"$boiler body$i alpha$i beta$i gamma$i delta$i"))
    assert(run(docs, 1, 100, maxDf = 4).isEmpty) // df=10 > cap, tiny threshold
    // raising the cap re-admits the candidates (and the 1/100 threshold
    // then passes on the shared boilerplate shingles)
    assert(run(docs, 1, 100, maxDf = 16).nonEmpty)
  }
}
