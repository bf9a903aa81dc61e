package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** RDFS-lite type entailment over the materialized triples table — the
  * inference pass a KG-construction pipeline runs to make implicit types
  * queryable (crawled markup rarely asserts the full class chain; hub
  * entities referenced only as objects are typically never typed at all).
  *
  * Supported entailment rules (the RDFS subset that is pure relational
  * algebra over a broadcast-sized ontology):
  *
  *  - rdfs9/11: `?s a C, C ⊑* D ⟹ ?s a D` (subClassOf transitivity
  *    folded into the closure);
  *  - rdfs2:  `?s p ?o, domain(p) = C ⟹ ?s a C`;
  *  - rdfs3:  `?s p ?o, range(p) = C, ?o is a resource ⟹ ?o a C`.
  *
  * Scale shape: the ontology is broadcast-sized BY CONSTRUCTION (a
  * curated schema — hundreds of classes, not data-scale), so its
  * transitive closure is computed on the DRIVER in microseconds and
  * shipped as a broadcast join table; distributing a fixpoint over a
  * KB-sized input would be pure overhead. The data-side work is three
  * constant-pruned scans (type slice, domain-predicate slice,
  * range-predicate slice) + broadcast hash joins + one distinct — no
  * shuffle carries anything wider than (subj, cls).
  */
object GraphInfer {

  /** A broadcast-sized ontology: subClassOf edges plus per-predicate
    * domain and range class assignments. */
  final case class Ontology(
      subClassOf: Seq[(String, String)],
      domain: Seq[(String, String)] = Nil,
      range: Seq[(String, String)] = Nil)

  /** Reflexive-transitive closure of the subClassOf graph, driver-side.
    * Cycle-safe (equivalent classes entail each other's supertypes). */
  private[pipeline] def classClosure(sub: Seq[(String, String)]): Seq[(String, String)] = {
    val up = sub.groupBy(_._1).map { case (c, es) => c -> es.map(_._2).toSet }
    val classes = (sub.map(_._1) ++ sub.map(_._2)).distinct
    classes.flatMap { c =>
      val reached = scala.collection.mutable.Set[String]()
      var frontier = Set(c)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(up.getOrElse(_, Set.empty)) -- reached - c
        reached ++= next
        frontier = next
      }
      (c +: reached.toSeq.sorted).map(c -> _)
    }
  }

  /** All entailed (subj, cls) pairs — asserted types plus rule-derived
    * ones, each propagated up the class hierarchy; classes outside the
    * ontology pass through unchanged (reflexivity). Distinct. */
  def entailTypes(triples: DataFrame, ont: Ontology): DataFrame = {
    val spark = triples.sparkSession

    def pairsDf(pairs: Seq[(String, String)], a: String, b: String): DataFrame =
      broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(pairs.map(p => Row(p._1, p._2)), 1),
        StructType(Seq(StructField(a, StringType, nullable = false),
          StructField(b, StringType, nullable = false)))))

    val asserted = triples
      .filter(col("pred") === Rdf.Type && col("objKind") === 0)
      .select(col("subj"), col("objValue").as("cls"))
    val domTyped = triples
      .join(pairsDf(ont.domain, "pred", "cls"), Seq("pred"))
      .select(col("subj"), col("cls"))
    val rngTyped = triples
      .filter(col("objKind") === 0 || col("objKind") === 1) // resources only
      .join(pairsDf(ont.range, "pred", "cls"), Seq("pred"))
      .select(col("objValue").as("subj"), col("cls"))

    val base = asserted.unionByName(domTyped).unionByName(rngTyped)
    val closure = classClosure(ont.subClassOf)
    // left join: classes absent from the ontology keep themselves
    base.join(pairsDf(closure, "cls", "sup"), Seq("cls"), "left")
      .select(col("subj"), coalesce(col("sup"), col("cls")).as("cls"))
      .distinct()
  }

  /** The corpus-facing ontology for the driver query: a two-level class
    * chain under Thing for each asserted corpus class, a domain rule
    * typing the (otherwise untyped) foaf:knows subjects as Person, and
    * range rules typing the never-asserted hub entities as Organization.
    * Mirrored in the DuckDB oracle as VALUES + a recursive closure CTE. */
  val CorpusOntology: Ontology = {
    val s = "http://schema.org/"
    Ontology(
      subClassOf = Seq(
        s + "Product" -> (s + "Offering"), s + "Offering" -> (s + "Thing"),
        s + "Event" -> (s + "Happening"), s + "Happening" -> (s + "Thing"),
        s + "Organization" -> (s + "Agent"), s + "Agent" -> (s + "Thing"),
        s + "Article" -> (s + "CreativeWork"), s + "CreativeWork" -> (s + "Thing"),
        s + "Person" -> (s + "Agent")),
      domain = Seq(
        "http://xmlns.com/foaf/0.1/knows" -> (s + "Person"),
        s + "location" -> (s + "Event")),
      range = Seq(
        s + "brand" -> (s + "Organization"),
        s + "parentOrganization" -> (s + "Organization")))
  }
}
