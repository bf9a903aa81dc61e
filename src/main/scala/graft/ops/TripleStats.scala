package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Typed `Aggregator` — the UDAF surface of SURVEY.md §2.4 ("triple-count
  * /lineage metrics = Aggregator[Triple, Buf, Metrics]"): one-pass
  * per-group triple statistics with map-side partial aggregation exactly
  * like a built-in agg (reduce folds input rows into the buffer on the
  * map side, merge combines buffers after the exchange — the buffer, not
  * the rows, crosses the shuffle).
  *
  * Scale note: the buffer is four fixed-size fields, so per-group state
  * is O(1) regardless of group size — safe for hub predicates.
  */
object TripleStats {

  /** (count, literal count, lexicographic min/max object value). */
  final case class Stats(n: Long, literals: Long, min_obj: String, max_obj: String)

  private def minS(a: String, b: String): String =
    if (a == null) b else if (b == null) a else if (a <= b) a else b
  private def maxS(a: String, b: String): String =
    if (a == null) b else if (b == null) a else if (a >= b) a else b

  /** Input = (objKind, objValue). */
  class Agg extends Aggregator[(Byte, String), Stats, Stats] {
    override def zero: Stats = Stats(0L, 0L, null, null)
    override def reduce(b: Stats, r: (Byte, String)): Stats = Stats(
      b.n + 1L,
      b.literals + (if (r._1 == 2) 1L else 0L),
      minS(b.min_obj, r._2),
      maxS(b.max_obj, r._2))
    override def merge(a: Stats, b: Stats): Stats = Stats(
      a.n + b.n, a.literals + b.literals,
      minS(a.min_obj, b.min_obj), maxS(a.max_obj, b.max_obj))
    override def finish(s: Stats): Stats = s
    override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** Untyped column form: `predStats(col("objKind"), col("objValue"))`. */
  val predStats = functions.udaf(new Agg, Encoders.product[(Byte, String)])
}
