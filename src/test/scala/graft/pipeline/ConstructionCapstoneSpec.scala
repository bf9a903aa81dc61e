package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end KG-construction chain on ONE shared corpus: pages →
  * extraction spine → ER discovery → sameAs merge → canonical graph →
  * adjacency / BGP / validation / entailment, asserting CROSS-OPERATOR
  * consistencies the per-operator specs can't see (each op tested alone
  * could drift against its neighbors' expectations). */
class ConstructionCapstoneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val same = "http://schema.org/sameAs"

  test("pages to queried graph: one chain, consistent at every joint") {
    import spark.implicits._

    // 1. extraction spine (the byte-exact per-document core underneath)
    val pages = PageGen.pages(spark, 300, seed = 42L, partitions = 4)
    val triples = TripleEmit.pipeline(pages).toDF().localCheckpoint(true)
    val nTriples = triples.count()
    assert(nTriples > 1000, s"spine emitted only $nTriples triples")

    // 2. plant partial duplicates, discover them, merge them away
    val dups = triples.filter(col("objKind") === 2 &&
        length(col("subj")) % 3 === 0 && length(col("objValue")) % 4 =!= 0)
      .withColumn("subj", concat(col("subj"), lit("#dup")))
    val corpus = triples.unionByName(dups).localCheckpoint(true)
    val eq = EntityResolve.discoverEquivalences(corpus).localCheckpoint(true)
    assert(eq.count() > 0, "no equivalences discovered on the planted corpus")
    val eqTriples = eq.select(col("a").as("subj"), lit(same).as("pred"),
      lit(0.toByte).as("objKind"), col("b").as("objValue"),
      lit(null).cast("string").as("objDatatype"),
      lit(null).cast("string").as("objLang"), lit("@default").as("graph"))
    val merged = GraphMaterialize.sameAsMerge(corpus.unionByName(eqTriples))
      .localCheckpoint(true)

    // joint 1: the merge consumed every discovered equivalence — no
    // discovered duplicate id survives as a subject or IRI object
    val mergedIds = merged.filter(col("objKind") === 0)
      .select(col("objValue").as("id"))
      .unionByName(merged.select(col("subj").as("id")))
      .distinct().as[String].collect().toSet
    val dupIds = eq.select(col("b")).as[String].collect().toSet
      .filter(_.endsWith("#dup"))
    assert(dupIds.nonEmpty)
    dupIds.foreach(d => assert(!mergedIds.contains(d), s"$d survived"))

    // joint 2: adjacency degrees equal raw per-subject triple counts
    val adj = GraphMaterialize.adjacency(merged.as[Triple])
    val adjDeg = adj.select(col("subj"), col("degree")).as[(String, Long)]
      .collect().toMap
    val rawDeg = merged.groupBy(col("subj")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(adjDeg == rawDeg, "adjacency degrees drifted from triple counts")

    // joint 3: a BGP over the merged graph equals the manual join
    import GraphQuery._
    val bgp = matchBgp(merged, Seq(
      TriplePattern(V("e"), C(Rdf.Type), C("http://schema.org/Event")),
      TriplePattern(V("e"), C("http://schema.org/location"), V("loc"))))
      .as[(String, String)].collect().toSet
    val ev = merged.filter(col("pred") === Rdf.Type &&
        col("objValue") === "http://schema.org/Event")
      .select(col("subj").as("e"))
    val manual = ev.join(
        merged.filter(col("pred") === "http://schema.org/location")
          .select(col("subj").as("e"), col("objValue").as("loc")), Seq("e"))
      .distinct().as[(String, String)].collect().toSet
    assert(bgp == manual, "BGP bindings drifted from the manual join")

    // joint 4: validation runs over the merged graph and its focus set
    // is exactly the typed targets of the shape's class
    val shapes = Seq(GraphValidate.Shape(
      targetClass = "http://schema.org/Event",
      pred = "http://schema.org/startDate", minCount = 1))
    val violations = GraphValidate.validate(merged, shapes)
    val focuses = violations.select(col("focus")).distinct()
      .as[String].collect().toSet
    val targets = ev.distinct().as[String].collect().toSet
    assert(focuses.subsetOf(targets), "violation focus outside the target class")

    // joint 5: entailment's (subj, cls) pairs contain every asserted
    // type of the merged graph, and the subclass rule fires for every
    // typed Event — each gets Thing too
    val ont = GraphInfer.Ontology(
      subClassOf = Seq("http://schema.org/Event" -> "http://schema.org/Thing"),
      domain = Seq.empty, range = Seq.empty)
    val entailed = GraphInfer.entailTypes(merged, ont)
      .as[(String, String)].collect().toSet
    val asserted = merged.filter(col("pred") === Rdf.Type && col("objKind") === 0)
      .select(col("subj"), col("objValue")).as[(String, String)].collect().toSet
    assert(asserted.subsetOf(entailed), "entailment dropped asserted types")
    targets.foreach { e =>
      assert(entailed.contains((e, "http://schema.org/Thing")),
        s"$e typed Event but not entailed Thing")
    }
  }
}
