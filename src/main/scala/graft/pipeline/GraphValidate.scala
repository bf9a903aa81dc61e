package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SHACL-lite shape validation over the materialized triples table — the
  * quality gate a KG-construction pipeline runs before publishing a
  * snapshot (bad cardinalities / node kinds / datatypes are what broken
  * extractors and adversarial markup produce at crawl scale).
  *
  * A [[Shape]] is the subset of SHACL property-shape constraints whose
  * evaluation is a pure relational program: per (focus node of
  * `targetClass`, `pred`) — minCount, maxCount, objKind (SHACL nodeKind)
  * and literal datatype. That keeps every verdict ANSI-SQL-re-derivable,
  * so the driver's DuckDB oracle gates it like the other distributed
  * operators; richer SHACL (paths, sh:or, closed shapes) composes from
  * [[GraphQuery.matchBgp]] + these primitives.
  */
object GraphValidate {

  val RdfType = Rdf.Type

  /** One property shape. `nodeKind` constrains objKind (0 = IRI,
    * 1 = bnode, 2 = literal); `datatype` constrains objDatatype (only
    * meaningful with literal values). Unset bounds don't fire. */
  final case class Shape(
      targetClass: String,
      pred: String,
      minCount: Int = 0,
      maxCount: Int = Int.MaxValue,
      nodeKind: Option[Int] = None,
      datatype: Option[String] = None)

  /** Validate `triples` against `shapes`; returns one row per violation:
    * (focus, cls, pred, code) with code ∈ {minCount, maxCount, nodeKind,
    * datatype}. A focus violating several constraints of one shape emits
    * one row per violated constraint.
    *
    * Plan shape at 100 TB:
    *
    *  - the shape table is tiny BY CONSTRUCTION (a hand-curated schema,
    *    dozens of rows) → broadcast to both joins, no shuffle for it;
    *  - targets = one pass over the rdf:type slice of the table
    *    (predicate-partitioned at scale → one partition's files);
    *  - constrained property rows = one pass over the shapes' predicates
    *    (their IN-list is a pushed scan filter — rows of unconstrained
    *    predicates are never read, let alone shuffled);
    *  - the only real exchange is the groupBy (focus, cls, pred): counts
    *    and mismatch flags fold map-side, so state per group is O(1)
    *    no matter how many values a hub node has — a focus with 10^6
    *    values for one predicate costs a partial count, never a
    *    collected list;
    *  - minCount = 0-match detection comes from the LEFT join of the
    *    target×shape frame onto the counted rows — absent groups
    *    coalesce to count 0 (you cannot detect a MISSING property from
    *    the property rows alone).
    */
  def validate(triples: DataFrame, shapes: Seq[Shape]): DataFrame = {
    require(shapes.nonEmpty, "no shapes")
    val spark = triples.sparkSession
    val shapeRows = shapes.map(s => Row(
      s.targetClass, s.pred, s.minCount, s.maxCount,
      s.nodeKind.map(_.toInt).orNull, s.datatype.orNull))
    val shapeSchema = StructType(Seq(
      StructField("cls", StringType, nullable = false),
      StructField("pred", StringType, nullable = false),
      StructField("min_count", IntegerType, nullable = false),
      StructField("max_count", IntegerType, nullable = false),
      StructField("node_kind", IntegerType, nullable = true),
      StructField("dtype", StringType, nullable = true)))
    val shapesDf = broadcast(
      spark.createDataFrame(spark.sparkContext.parallelize(shapeRows, 1), shapeSchema))

    val targets = triples
      .filter(col("pred") === RdfType && col("objKind") === 0)
      .select(col("subj").as("focus"), col("objValue").as("cls"))
      .distinct()
      .join(shapesDf, Seq("cls"))

    // only the shapes' predicates matter — the IN-list is a pushed scan
    // filter, so the (focus, pred) exchange below carries the constrained
    // slice of the table, never every predicate's rows
    val shapePreds = shapes.map(_.pred).distinct
    val props = triples
      .filter(col("pred").isin(shapePreds: _*))
      .select(
        col("subj").as("focus"), col("pred"),
        col("objKind"), col("objDatatype"))

    val counted = targets.join(props, Seq("focus", "pred"), "left")
      .groupBy(col("focus"), col("cls"), col("pred"),
        col("min_count"), col("max_count"), col("node_kind"), col("dtype"))
      .agg(
        count(col("objKind")).as("cnt"),
        sum(when(col("node_kind").isNotNull &&
          col("objKind") =!= col("node_kind"), 1).otherwise(0)).as("bad_kind"),
        sum(when(col("dtype").isNotNull && col("objKind").isNotNull &&
          (col("objDatatype").isNull || col("objDatatype") =!= col("dtype")), 1)
          .otherwise(0)).as("bad_dtype"))

    // one pass over the counted frame: the four verdicts become an
    // in-row array + explode rather than a 4-way union of filters (a
    // union would re-run the whole join+agg subtree once per branch —
    // the multi-branch mistake this repo has paid for before)
    counted.select(col("focus"), col("cls"), col("pred"),
      array(
        when(col("cnt") < col("min_count"), lit("minCount")),
        when(col("cnt") > col("max_count"), lit("maxCount")),
        when(col("bad_kind") > 0, lit("nodeKind")),
        when(col("bad_dtype") > 0, lit("datatype"))).as("codes"))
      .select(col("focus"), col("cls"), col("pred"),
        explode(filter(col("codes"), c => c.isNotNull)).as("code"))
  }

  /** The corpus-facing shape catalog used by the driver query — a mix of
    * satisfied and naturally-violated constraints over the synthetic
    * schema.org corpus (PageGen): every product has exactly one name
    * (passes), no event has an endDate (minCount violations), every
    * organization has two bnode members (maxCount + nodeKind violations),
    * and ratingValue is a double where the shape demands integer
    * (datatype violations). Mirrored verbatim in the DuckDB oracle. */
  val CorpusShapes: Seq[Shape] = {
    val s = "http://schema.org/"
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    Seq(
      Shape(s + "Product", s + "name", minCount = 1, maxCount = 1,
        nodeKind = Some(2), datatype = Some(xsd + "string")),
      Shape(s + "Product", s + "ratingValue", minCount = 1,
        datatype = Some(xsd + "integer")),
      Shape(s + "Event", s + "endDate", minCount = 1),
      Shape(s + "Event", s + "location", minCount = 1, nodeKind = Some(0)),
      Shape(s + "Organization", s + "member", maxCount = 1,
        nodeKind = Some(0)))
  }
}
