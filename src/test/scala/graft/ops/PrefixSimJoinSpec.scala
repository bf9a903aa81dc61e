package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
import scala.util.Random

/** Randomized completeness + exactness for the prefix-filtered exact
  * set-similarity join: the distributed prefix-candidate plan must equal
  * a brute-force all-pairs sequential reference computed over raw shingle
  * STRINGS (so hash-set vs string-set parity is exercised too), for every
  * pair and both integer sizes, at several thresholds. */
class PrefixSimJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** String-space twin of TextHash tokenization + 3-shingles: letter/digit
    * runs lowercased; len>=3 -> sliding 3-shingles, else one joined
    * shingle; distinct. */
  private def shingleStrings(text: String, w: Int): Set[String] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    if (toks.isEmpty) Set.empty
    else if (toks.size >= w) toks.sliding(w).map(_.mkString(" ")).toSet
    else Set(toks.mkString(" "))
  }

  test("prefixSimJoin == brute-force all-pairs, several thresholds and seeds") {
    import spark.implicits._
    val vocab = Vector("red", "blue", "green", "ochre", "teal", "plum",
      "rust", "sage", "pearl", "onyx", "jade", "coral")
    for (seed <- Seq(61, 62); (tn, td) <- Seq((1, 2), (4, 5), (1, 4))) {
      val r = new Random(seed)
      def doc(): String =
        (0 until (3 + r.nextInt(25))).map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
      // plant a clone family (identical sets) and a near-clone
      val base = doc()
      val docs = (0L until 30L).map {
        case i if i < 3 => (i, base)
        case 3L         => (3L, base + " extra")
        case i          => (i, doc())
      }
      val got = DedupOps.prefixSimJoin(docs.toDF("doc_id", "text"), tn, td)
        .collect().map(x => (x.getLong(0), x.getLong(1)) -> ((x.getLong(2), x.getLong(3))))
        .toMap
      val sets = docs.map { case (id, t) => id -> shingleStrings(t, 3) }.toMap
      val want = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        inter = (sets(a) & sets(b)).size.toLong
        uni = (sets(a) | sets(b)).size.toLong
        if inter * td >= uni * tn
      } yield (a, b) -> ((inter, uni))).toMap
      assert(got == want, s"seed=$seed t=$tn/$td")
      // the planted clone family must appear as all 3 pairs
      assert(got.contains((0L, 1L)) && got.contains((0L, 2L)) && got.contains((1L, 2L)),
        s"seed=$seed t=$tn/$td clone family")
    }
  }
}
