package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.pipeline.GraphInfer._
import graft.pipeline.GraphValidate.RdfType

/** RDFS-lite entailment — closure unit cases, hand-built rule firing,
  * a randomized brute-force invariant, and the corpus ontology. */
class GraphInferSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def df(rows: Seq[Triple]): DataFrame = {
    import spark.implicits._
    rows.toDS().toDF()
  }
  private def iri(s: String, p: String, o: String) =
    Triple(s, p, 0: Byte, o, null, null, "@default")
  private def lit(s: String, p: String, o: String) =
    Triple(s, p, 2: Byte, o, "http://www.w3.org/2001/XMLSchema#string", null, "@default")

  private def entailed(t: DataFrame, ont: Ontology): Set[(String, String)] =
    entailTypes(t, ont).collect()
      .map(r => (r.getAs[String]("subj"), r.getAs[String]("cls"))).toSet

  test("classClosure: chain, diamond, cycle") {
    val chain = classClosure(Seq("A" -> "B", "B" -> "C")).toSet
    assert(chain == Set("A" -> "A", "A" -> "B", "A" -> "C",
      "B" -> "B", "B" -> "C", "C" -> "C"))
    val diamond = classClosure(Seq("A" -> "B", "A" -> "C", "B" -> "D", "C" -> "D")).toSet
    assert(diamond("A" -> "D") && diamond("B" -> "D") && !diamond("B" -> "C"))
    val cycle = classClosure(Seq("A" -> "B", "B" -> "A")).toSet
    assert(cycle == Set("A" -> "A", "A" -> "B", "B" -> "A", "B" -> "B"))
  }

  test("rules fire: asserted propagation, domain, range, literal exclusion") {
    val ont = Ontology(
      subClassOf = Seq("Car" -> "Vehicle", "Vehicle" -> "Thing"),
      domain = Seq("drives" -> "Person"),
      range = Seq("drives" -> "Car"))
    val t = df(Seq(
      iri("c1", RdfType, "Car"),
      iri("alice", "drives", "c2"),
      lit("bob", "drives", "a string"), // literal object: no range typing
      iri("x", RdfType, "Alien"))) // class outside the ontology
    assert(entailed(t, ont) == Set(
      ("c1", "Car"), ("c1", "Vehicle"), ("c1", "Thing"), // rdfs9/11
      ("alice", "Person"), // rdfs2 (Person has no supertypes here)
      ("c2", "Car"), ("c2", "Vehicle"), ("c2", "Thing"), // rdfs3 + closure
      ("bob", "Person"), // domain applies even to literal-valued triples
      ("x", "Alien"))) // reflexive pass-through
  }

  test("entailment agrees with a brute-force evaluator on random data") {
    val rnd = new scala.util.Random(17)
    val classes = Vector("C1", "C2", "C3", "C4")
    val preds = Vector("p1", "p2")
    for (trial <- 1 to 5) {
      val sub = (1 to 3).map(_ =>
        classes(rnd.nextInt(4)) -> classes(rnd.nextInt(4)))
        .filter(e => e._1 != e._2).distinct
      val ont = Ontology(sub,
        domain = Seq(preds(rnd.nextInt(2)) -> classes(rnd.nextInt(4))),
        range = Seq(preds(rnd.nextInt(2)) -> classes(rnd.nextInt(4))))
      val rows = (1 to 30).map { _ =>
        val s = s"s${rnd.nextInt(6)}"
        rnd.nextInt(3) match {
          case 0 => iri(s, RdfType, classes(rnd.nextInt(4)))
          case 1 => iri(s, preds(rnd.nextInt(2)), s"s${rnd.nextInt(6)}")
          case _ => lit(s, preds(rnd.nextInt(2)), "v")
        }
      }.distinct
      // brute force
      val closure = classClosure(sub).groupBy(_._1)
        .map { case (c, ps) => c -> ps.map(_._2).toSet }
      def up(c: String): Set[String] = closure.getOrElse(c, Set(c))
      val base =
        rows.filter(r => r.pred == RdfType && r.objKind == 0)
          .map(r => (r.subj, r.objValue)) ++
        (for (r <- rows; (p, c) <- ont.domain if r.pred == p) yield (r.subj, c)) ++
        (for (r <- rows; (p, c) <- ont.range
              if r.pred == p && r.objKind != 2) yield (r.objValue, c))
      val expected = base.flatMap { case (s, c) => up(c).map(s -> _) }.toSet
      assert(entailed(df(rows), ont) == expected, s"trial $trial mismatch")
    }
  }

  test("corpus ontology types the untyped people and hub entities") {
    import org.apache.spark.sql.functions._
    val s = "http://schema.org/"
    val triples = TripleEmit.pipeline(PageGen.pages(spark, 120, 42L, partitions = 4)).toDF()
    val got = entailTypes(triples, CorpusOntology)
    // every hub entity (asserted nowhere) is entailed Organization->Agent->Thing
    val hubTypes = got.filter(col("subj") === PageGen.HubEntities.head)
      .collect().map(_.getAs[String]("cls")).toSet
    assert(hubTypes == Set(s + "Organization", s + "Agent", s + "Thing"))
    // every knows-subject is entailed Person -> Agent -> Thing
    val knower = triples.filter(col("pred") === "http://xmlns.com/foaf/0.1/knows")
      .select(col("subj")).first().getString(0)
    val knowerTypes = got.filter(col("subj") === knower)
      .collect().map(_.getAs[String]("cls")).toSet
    assert(Set(s + "Person", s + "Agent", s + "Thing").subsetOf(knowerTypes))
    // asserted Product instances climb their chain
    val prod = triples.filter(col("pred") === RdfType && col("objValue") === s + "Product")
      .select(col("subj")).first().getString(0)
    val prodTypes = got.filter(col("subj") === prod)
      .collect().map(_.getAs[String]("cls")).toSet
    assert(Set(s + "Product", s + "Offering", s + "Thing").subsetOf(prodTypes))
  }
}
