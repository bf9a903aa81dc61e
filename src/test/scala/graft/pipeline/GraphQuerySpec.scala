package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.pipeline.GraphQuery._

/** BGP matching and bounded path closure — hand-built cases plus
  * randomized brute-force invariants. */
class GraphQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def triplesOf(rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (s, p, o) =>
      Triple(s, p, 0: Byte, o, null, null, "@default")
    }.toDS().toDF()
  }

  private def litTriple(s: String, p: String, o: String): Triple =
    Triple(s, p, 2: Byte, o, "http://www.w3.org/2001/XMLSchema#string", null, "@default")

  test("BGP chain+star matches the hand-computed solutions") {
    import spark.implicits._
    val df = triplesOf(Seq(
      ("e1", "type", "Event"), ("e2", "type", "Event"), ("p1", "type", "Person"),
      ("e1", "loc", "h1"), ("e2", "loc", "h2"), ("p1", "loc", "h1"),
      ("h1", "parent", "h2"), ("h2", "parent", "h1")))
      .union(Seq(litTriple("h1", "name", "Hub One")).toDS().toDF())
    val out = matchBgp(df, Seq(
      TriplePattern(V("e"), C("type"), C("Event")),
      TriplePattern(V("e"), C("loc"), V("hub")),
      TriplePattern(V("hub"), C("parent"), V("par")),
      TriplePattern(V("hub"), C("name"), V("nm"), kind = Some(2))))
    val rows = out.collect().map(r =>
      (r.getAs[String]("e"), r.getAs[String]("hub"),
        r.getAs[String]("par"), r.getAs[String]("nm"))).toSet
    // only e1 -> h1 has both a parent and a literal name; p1 is not an Event
    assert(rows == Set(("e1", "h1", "h2", "Hub One")))
  }

  test("BGP result is invariant to pattern order") {
    val df = triplesOf(Seq(
      ("a", "p", "b"), ("b", "q", "c"), ("c", "r", "d"), ("x", "p", "b"),
      ("b", "q", "d"), ("d", "r", "d")))
    val patterns = Seq(
      TriplePattern(V("s"), C("p"), V("m")),
      TriplePattern(V("m"), C("q"), V("n")),
      TriplePattern(V("n"), C("r"), V("t")))
    val base = matchBgp(df, patterns)
      .select("s", "m", "n", "t").collect().map(_.toString).sorted.toSeq
    patterns.permutations.foreach { perm =>
      val got = matchBgp(df, perm)
        .select("s", "m", "n", "t").collect().map(_.toString).sorted.toSeq
      assert(got == base, s"order-dependent result for $perm")
    }
    assert(base.nonEmpty)
  }

  test("repeated variable inside one pattern constrains equality") {
    val df = triplesOf(Seq(("a", "p", "a"), ("a", "p", "b"), ("c", "p", "c")))
    val out = matchBgp(df, Seq(TriplePattern(V("x"), C("p"), V("x"))))
    assert(out.collect().map(_.getAs[String]("x")).sorted.toSeq == Seq("a", "c"))
  }

  test("disconnected BGP is a deliberate cross join") {
    val df = triplesOf(Seq(("a", "p", "b"), ("c", "q", "d"), ("e", "q", "f")))
    val out = matchBgp(df, Seq(
      TriplePattern(V("x"), C("p"), C("b")),
      TriplePattern(V("y"), C("q"), V("z"))))
    assert(out.count() == 2) // 1 x-binding times 2 (y,z)-bindings
  }

  test("BGP agrees with a brute-force evaluator on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val nodes = (0 until 12).map(i => s"n$i")
      val preds = Seq("p", "q", "r")
      val edges = (1 to 60).map { _ =>
        (nodes(rnd.nextInt(nodes.size)), preds(rnd.nextInt(preds.size)),
          nodes(rnd.nextInt(nodes.size)))
      }.distinct
      val df = triplesOf(edges)
      val patterns = Seq(
        TriplePattern(V("a"), C("p"), V("b")),
        TriplePattern(V("b"), C("q"), V("c")),
        TriplePattern(V("a"), C("r"), V("d")))
      // brute force: nested loops over the edge list
      val byPred = edges.groupBy(_._2)
      val expected = (for {
        (a, _, b) <- byPred.getOrElse("p", Seq())
        (b2, _, c) <- byPred.getOrElse("q", Seq()) if b2 == b
        (a2, _, d) <- byPred.getOrElse("r", Seq()) if a2 == a
      } yield (a, b, c, d)).toVector.sorted
      val got = matchBgp(df, patterns).collect()
        .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
          r.getAs[String]("c"), r.getAs[String]("d"))).toVector.sorted
      assert(got == expected, s"trial $trial mismatch")
    }
  }

  test("OPTIONAL groups left-join: matched rows bind, unmatched rows keep nulls") {
    val df = triplesOf(Seq(
      ("a", "knows", "h1"), ("b", "knows", "x"),
      ("h1", "parent", "h2")))
    val out = matchBgp(df,
      Seq(TriplePattern(V("p"), C("knows"), V("q"))),
      Seq(Seq(TriplePattern(V("q"), C("parent"), V("par")))))
    val rows = out.collect().map(r =>
      (r.getAs[String]("p"), r.getAs[String]("q"), r.getAs[String]("par"))).toSet
    assert(rows == Set(("a", "h1", "h2"), ("b", "x", null)))
  }

  test("two OPTIONAL groups attach independently; cross-group vars are rejected") {
    val df = triplesOf(Seq(
      ("a", "knows", "h1"), ("h1", "parent", "h2"), ("h1", "label", "L")))
    val out = matchBgp(df,
      Seq(TriplePattern(V("p"), C("knows"), V("q"))),
      Seq(
        Seq(TriplePattern(V("q"), C("parent"), V("par"))),
        Seq(TriplePattern(V("q"), C("label"), V("lab")))))
    val r = out.collect().head
    assert((r.getAs[String]("par"), r.getAs[String]("lab")) == ("h2", "L"))
    // a var bound only by two optional groups is ambiguous — rejected
    assertThrows[IllegalArgumentException] {
      matchBgp(df,
        Seq(TriplePattern(V("p"), C("knows"), V("q"))),
        Seq(
          Seq(TriplePattern(V("q"), C("parent"), V("z"))),
          Seq(TriplePattern(V("q"), C("label"), V("z")))))
    }
    // an optional group disconnected from the required patterns is rejected
    assertThrows[IllegalArgumentException] {
      matchBgp(df,
        Seq(TriplePattern(V("p"), C("knows"), V("q"))),
        Seq(Seq(TriplePattern(V("other"), C("label"), V("lab")))))
    }
  }

  test("constructEdges emits distinct derived IRI edges, full triple schema") {
    import spark.implicits._
    val df = triplesOf(Seq(
      ("e1", "loc", "h1"), ("e2", "loc", "h1"), ("h1", "parent", "p1"),
      ("e1", "loc", "h2"), ("h2", "parent", "p1"))) // e1 reaches p1 twice
    val out = constructEdges(df,
      Seq(TriplePattern(V("e"), C("loc"), V("h"), kind = Some(0)),
        TriplePattern(V("h"), C("parent"), V("p"), kind = Some(0))),
      subjVar = "e", predIri = "aff", objVar = "p")
    assert(out.columns.toSeq ==
      Seq("subj", "pred", "objKind", "objValue", "objDatatype", "objLang", "graph"))
    val rows = out.as[Triple].collect().map(t => (t.subj, t.pred, t.objValue)).toSet
    assert(rows == Set(("e1", "aff", "p1"), ("e2", "aff", "p1"))) // deduped
    // emitted rows union cleanly back into a Dataset[Triple]
    assert(df.as[Triple].unionByName(out.as[Triple]).count() == df.count() + 2)
  }

  test("pathClosure computes min depth, honors the bound, handles shortcuts") {
    // chain a->b->c->d->e plus shortcut a->c
    val df = triplesOf(Seq(
      ("a", "k", "b"), ("b", "k", "c"), ("c", "k", "d"), ("d", "k", "e"),
      ("a", "k", "c"), ("z", "other", "a")))
    val out = pathClosure(df, "k", maxDepth = 3)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        r.getAs[Int]("depth")).toMap
    assert(out(("a", "b")) == 1)
    assert(out(("a", "c")) == 1) // shortcut wins over depth-2 path
    assert(out(("a", "d")) == 2) // via the shortcut
    assert(out(("a", "e")) == 3)
    assert(out(("b", "e")) == 3)
    assert(!out.contains(("z", "a"))) // other predicate ignored
    assert(out.size == 4 + 3 + 2 + 1) // all pairs within depth 3 of the DAG
  }

  test("pathClosure emits self-pairs on cycles at the cycle length") {
    val df = triplesOf(Seq(("a", "k", "b"), ("b", "k", "c"), ("c", "k", "a")))
    val out = pathClosure(df, "k", maxDepth = 5)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        r.getAs[Int]("depth")).toMap
    assert(out(("a", "a")) == 3)
    assert(out(("a", "b")) == 1)
    assert(out(("a", "c")) == 2)
    assert(out.size == 9) // 3 sources x 3 reachable each
  }

  test("over-degree sources extend no paths but keep their depth-1 edges") {
    val fanout = (1 to 10).map(i => ("hub", "k", s"t$i"))
    val df = triplesOf(Seq(("x", "k", "hub")) ++ fanout)
    val out = pathClosure(df, "k", maxDepth = 3, maxDegree = 4)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst")))
      .toSet
    assert(out.contains(("x", "hub")))
    assert(out.contains(("hub", "t1"))) // depth-1 edge survives
    assert(!out.contains(("x", "t1"))) // but nothing routes THROUGH the hub
  }

  test("pathClosure agrees with brute-force BFS on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 10
      val edges = (1 to 25).map { _ =>
        (s"v${rnd.nextInt(n)}", "k", s"v${rnd.nextInt(n)}")
      }.distinct.filter { case (s, _, o) => s != o }
      val depth = 4
      // brute-force BFS per source
      val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3) }
      val expected = scala.collection.mutable.Map[(String, String), Int]()
      adj.keys.foreach { src =>
        var frontier = Set(src)
        var d = 0
        val seen = scala.collection.mutable.Set[String]()
        while (d < depth && frontier.nonEmpty) {
          d += 1
          frontier = frontier.flatMap(v => adj.getOrElse(v, Nil))
          val fresh = frontier -- seen
          fresh.foreach(dst => expected.getOrElseUpdate((src, dst), d))
          seen ++= fresh
          frontier = fresh
        }
      }
      val got = pathClosure(triplesOf(edges), "k", maxDepth = depth)
        .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
          r.getAs[Int]("depth")).toMap
      assert(got == expected.toMap, s"trial $trial mismatch")
    }
  }

  private def distancesOf(df: DataFrame, seeds: Seq[String], depth: Int,
      maxDegree: Int = 1024): Map[String, Int] =
    seededDistances(df, seeds, Seq("k"), depth, maxDegree)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Int]("dist")).toMap

  test("seededDistances: min hops from the seed set, seeds at 0, bound honored") {
    // a->b->c->d->e with shortcut a->c; second seed z->e
    val df = triplesOf(Seq(
      ("a", "k", "b"), ("b", "k", "c"), ("c", "k", "d"), ("d", "k", "e"),
      ("a", "k", "c"), ("z", "k", "e"), ("q", "other", "a")))
    val out = distancesOf(df, Seq("a", "z"), depth = 2)
    assert(out == Map("a" -> 0, "z" -> 0, "b" -> 1, "c" -> 1, "e" -> 1, "d" -> 2))
    // depth bound: d reached at 2, e already at 1 via z — nothing at 3
    val deep = distancesOf(df, Seq("a"), depth = 4)
    assert(deep == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2, "e" -> 3))
  }

  test("seededDistances: a seed reached again later keeps dist 0; cycles terminate") {
    val df = triplesOf(Seq(("a", "k", "b"), ("b", "k", "c"), ("c", "k", "a")))
    val out = distancesOf(df, Seq("a"), depth = 5)
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("seededDistances: hubs expand from a seed but never mid-path") {
    val fanout = (1 to 10).map(i => ("hub", "k", s"t$i"))
    val df = triplesOf(Seq(("x", "k", "hub")) ++ fanout)
    // hub reached at dist 1 is not extended through (degree 10 > 4)
    val viaX = distancesOf(df, Seq("x"), depth = 3, maxDegree = 4)
    assert(viaX == Map("x" -> 0, "hub" -> 1))
    // but the hub AS A SEED takes its first hop like closureOfEdges' level 1
    val viaHub = distancesOf(df, Seq("hub"), depth = 3, maxDegree = 4)
    assert(viaHub == (1 to 10).map(i => s"t$i" -> 1).toMap + ("hub" -> 0))
  }

  test("seededDistances agrees with brute-force BFS on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      val n = 10
      val edges = (1 to 25).map { _ =>
        (s"v${rnd.nextInt(n)}", "k", s"v${rnd.nextInt(n)}")
      }.distinct.filter { case (s, _, o) => s != o }
      val seeds = Seq(s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}").distinct
      val depth = 3
      val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3) }
      val expected = scala.collection.mutable.Map[String, Int]()
      seeds.foreach(expected.getOrElseUpdate(_, 0))
      var frontier = seeds.toSet
      var d = 0
      while (d < depth && frontier.nonEmpty) {
        d += 1
        val dd = d
        val fresh = frontier.flatMap(v => adj.getOrElse(v, Nil)) --
          expected.keySet
        fresh.foreach(expected.getOrElseUpdate(_, dd))
        frontier = fresh
      }
      val got = distancesOf(triplesOf(edges), seeds, depth)
      assert(got == expected.toMap, s"trial $trial mismatch (seeds=$seeds)")
    }
  }
}
