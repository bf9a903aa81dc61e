package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized invariants for the graph-analytics operators: the
  * distributed plans (checkpointed fixed-point iteration, degree-capped
  * self-join) must reproduce a straight-line sequential reference exactly
  * on random graphs with self-loops, literals, duplicate edges, and hub
  * nodes — the integer-arithmetic design claims BIT-exact equality, not
  * approximate agreement, so that is what these assert. */
class GraphPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Random triple table: IRIs n0..n{nodes-1}, ~20% literal objects,
    * self-loops and duplicate edges included (both must be ignored or
    * deduped by the operators). */
  private def randomTriples(seed: Int, nodes: Int, edges: Int): Seq[(String, String, Byte, String)] = {
    val r = new Random(seed)
    (0 until edges).map { _ =>
      val s = s"n${r.nextInt(nodes)}"
      if (r.nextInt(5) == 0) (s, "p", 2.toByte, s"lit ${r.nextInt(10)}")
      else (s, "p", 0.toByte, s"n${r.nextInt(nodes)}")
    }
  }

  test("hubScores: distributed fixed point == sequential reference, bit-exact") {
    import spark.implicits._
    for (seed <- Seq(11, 12, 13)) {
      val rows = randomTriples(seed, nodes = 30, edges = 150)
      val df = rows.toDF("subj", "pred", "objKind", "objValue")
      val iters = 4
      val got = GraphMaterialize.hubScores(df, iterations = iters)
        .as[(String, Long)].collect().toMap

      // sequential reference over the same edge multiset
      val edges = rows.collect { case (s, _, k, o) if k == 0 && s != o => (s, o) }.distinct
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      var score = nodes.map(_ -> 1000000000L).toMap
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        edges.foreach { case (s, d) => in(d) += score(s) / outDeg(s) }
        score = nodes.map(n => n -> (150000000L + 85L * in(n) / 100L)).toMap
      }
      assert(got == score, s"seed=$seed")
    }
  }

  test("entityCoOccurrence: degree-capped pair counts == sequential reference") {
    import spark.implicits._
    for (seed <- Seq(21, 22, 23)) {
      val rows = randomTriples(seed, nodes = 15, edges = 200)
      val df = rows.toDF("subj", "pred", "objKind", "objValue")
      val (cap, minS) = (6, 2L)
      val got = GraphMaterialize.entityCoOccurrence(df, maxDegree = cap, minSubjects = minS)
        .as[(String, String, Long)].collect().toSet

      val po = rows.collect { case (s, _, k, o) if k == 0 && s != o => (s, o) }.distinct
      val kept = po.groupBy(_._1).filter(_._2.size <= cap).values.flatten.toSeq
      val pairs = kept.groupBy(_._1).values.flatMap { es =>
        val objs = es.map(_._2).sorted
        for (i <- objs.indices; j <- (i + 1) until objs.size) yield (objs(i), objs(j))
      }.toSeq
      val expect = pairs.groupBy(identity).collect {
        case ((a, b), ps) if ps.size >= minS => (a, b, ps.size.toLong)
      }.toSet
      assert(got == expect, s"seed=$seed")
      // structural invariants: canonical order, count bounded by subjects
      got.foreach { case (a, b, n) =>
        assert(a < b, s"seed=$seed pair not canonical: $a,$b")
        assert(n <= kept.map(_._1).distinct.size, s"seed=$seed impossible count $n")
      }
    }
  }
}
