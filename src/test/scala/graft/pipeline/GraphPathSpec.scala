package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.pipeline.GraphQuery._
import graft.pipeline.GraphQuery.PathExpr._

/** Property-path algebra (atom / inverse / sequence / alternation /
  * bounded plus) vs a sequential set-algebra reference, plus hand cases
  * for each combinator and the hub guard. */
class GraphPathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def triplesOf(rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (s, p, o) =>
      Triple(s, p, 0: Byte, o, null, null, "@default")
    }.toDS().toDF()
  }

  /** Sequential reference evaluator over in-memory pair sets. */
  private def ref(rows: Seq[(String, String, String)], e: PathExpr): Set[(String, String)] = e match {
    case P(iri) => rows.collect { case (s, p, o) if p == iri => (s, o) }.toSet
    case Inv(p) => ref(rows, p).map(_.swap)
    case Seq2(a, b) =>
      val (ra, rb) = (ref(rows, a), ref(rows, b))
      for { (s, m) <- ra; (m2, t) <- rb if m == m2 } yield (s, t)
    case Alt(a, b) => ref(rows, a) ++ ref(rows, b)
    case Plus(p, maxDepth, maxDegree) =>
      val edges = ref(rows, p).filter { case (s, o) => s != o }
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val ext = edges.filter { case (s, _) => deg(s) <= maxDegree }
      var reach = edges
      var frontier = edges
      for (_ <- 2 to maxDepth) {
        val stepped = for { (s, m) <- frontier; (m2, t) <- ext if m == m2 } yield (s, t)
        frontier = stepped -- reach
        reach ++= frontier
      }
      reach
  }

  private def run(rows: Seq[(String, String, String)], e: PathExpr): Set[(String, String)] =
    evalPath(triplesOf(rows), e).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  private val g = Seq(
    ("a", "knows", "b"), ("b", "knows", "c"), ("c", "knows", "d"),
    ("b", "same", "e"), ("e", "knows", "f"),
    ("p", "child", "b"), ("q", "child", "f"), ("q", "child", "d"))

  test("atom, inverse, alternation, sequence match the reference") {
    for (e <- Seq[PathExpr](
        P("knows"),
        Inv(P("child")),
        Alt(P("knows"), P("same")),
        Seq2(P("knows"), P("knows")),
        Seq2(Inv(P("child")), P("knows")),
        Seq2(Alt(P("knows"), P("same")), Inv(P("child")))))
      assert(run(g, e) == ref(g, e), s"mismatch for $e")
  }

  test("bounded plus matches the reference at every depth") {
    for (d <- 1 to 4) {
      val e = Plus(Alt(P("knows"), P("same")), d)
      assert(run(g, e) == ref(g, e), s"mismatch at depth $d")
    }
    // full 4-hop reach from a through the alternation
    assert(run(g, Plus(Alt(P("knows"), P("same")), 4))
      .filter(_._1 == "a") ==
      Set("a" -> "b", "a" -> "c", "a" -> "d", "a" -> "e", "a" -> "f"))
  }

  test("the composed flagship expression matches the reference") {
    val e = Seq2(Plus(Alt(P("knows"), P("same")), 3), Inv(P("child")))
    val got = run(g, e)
    assert(got == ref(g, e))
    // a reaches b (child of p) and d, f (children of q) within 3 hops
    assert(got.filter(_._1 == "a") == Set("a" -> "p", "a" -> "q"))
  }

  test("plus hub guard: over-degree sources emit edges but are not extended through") {
    val hub = ("w", "knows", "h") +:
      (1 to 5).map(i => ("h", "knows", s"x$i")) :+ ("x1", "knows", "y")
    val e = Plus(P("knows"), 3, maxDegree = 2)
    assert(run(hub, e) == ref(hub, e))
    val got = run(hub, e)
    // h's own edges survive as length-1 pairs, and extension through an
    // UNDER-cap node still works (h knows x1 knows y)
    assert(got.contains("h" -> "x3") && got.contains("h" -> "y"))
    // but paths THROUGH the over-degree hub are cut: w -> h stops there
    assert(got.filter(_._1 == "w") == Set("w" -> "h"))
  }

  test("self-loops are trimmed inside plus") {
    val loops = Seq(("a", "p", "a"), ("a", "p", "b"), ("b", "p", "b"))
    assert(run(loops, Plus(P("p"), 3)) == Set("a" -> "b"))
    // ...but the raw atom keeps them (trimming is a closure property)
    assert(run(loops, P("p")) ==
      Set("a" -> "a", "a" -> "b", "b" -> "b"))
  }
}
