package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.pipeline.GraphValidate._

/** SHACL-lite validation — hand-built shape cases, a randomized
  * brute-force invariant, and the corpus catalog over the live pipeline. */
class GraphValidateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"

  private def df(rows: Seq[Triple]): DataFrame = {
    import spark.implicits._
    rows.toDS().toDF()
  }

  private def iri(s: String, p: String, o: String) =
    Triple(s, p, 0: Byte, o, null, null, "@default")
  private def bnode(s: String, p: String, o: String) =
    Triple(s, p, 1: Byte, o, null, null, "@default")
  private def lit(s: String, p: String, o: String, dt: String = Xsd + "string") =
    Triple(s, p, 2: Byte, o, dt, null, "@default")

  private def violations(t: DataFrame, shapes: Seq[Shape]): Set[(String, String, String, String)] =
    validate(t, shapes).collect().map(r =>
      (r.getAs[String]("focus"), r.getAs[String]("cls"),
        r.getAs[String]("pred"), r.getAs[String]("code"))).toSet

  test("each constraint fires exactly on its hand-built offender") {
    val t = df(Seq(
      iri("ok", RdfType, "C"), lit("ok", "name", "fine"),
      iri("missing", RdfType, "C"),
      iri("dup", RdfType, "C"), lit("dup", "name", "x"), lit("dup", "name", "y"),
      iri("irival", RdfType, "C"), iri("irival", "name", "not-a-literal"),
      iri("badtype", RdfType, "C"), lit("badtype", "name", "3", Xsd + "integer"),
      // untyped subject: never a focus node
      lit("stray", "name", "ignored")))
    val got = violations(t, Seq(Shape("C", "name",
      minCount = 1, maxCount = 1, nodeKind = Some(2),
      datatype = Some(Xsd + "string"))))
    assert(got == Set(
      ("missing", "C", "name", "minCount"),
      ("dup", "C", "name", "maxCount"),
      ("irival", "C", "name", "nodeKind"),
      ("irival", "C", "name", "datatype"), // IRI value also fails the datatype
      ("badtype", "C", "name", "datatype")))
  }

  test("minCount 0 means absence is fine; unset bounds never fire") {
    val t = df(Seq(iri("a", RdfType, "C"),
      iri("b", RdfType, "C"), bnode("b", "member", "_:m1"), bnode("b", "member", "_:m2")))
    assert(violations(t, Seq(Shape("C", "member"))).isEmpty)
  }

  test("a subject typed twice is validated under each matching shape") {
    val t = df(Seq(
      iri("x", RdfType, "C1"), iri("x", RdfType, "C2")))
    val got = violations(t, Seq(
      Shape("C1", "name", minCount = 1), Shape("C2", "title", minCount = 1)))
    assert(got == Set(("x", "C1", "name", "minCount"), ("x", "C2", "title", "minCount")))
  }

  test("validate agrees with a brute-force evaluator on random data") {
    val rnd = new scala.util.Random(13)
    val classes = Seq("C1", "C2")
    val preds = Seq("p1", "p2")
    val dts = Seq(Xsd + "string", Xsd + "integer")
    for (trial <- 1 to 5) {
      val subs = (0 until 8).map(i => s"s$i")
      val rows = subs.flatMap { s =>
        val typed = if (rnd.nextBoolean()) Seq(iri(s, RdfType, classes(rnd.nextInt(2)))) else Nil
        val props = (0 until rnd.nextInt(4)).map { _ =>
          val p = preds(rnd.nextInt(2))
          rnd.nextInt(3) match {
            case 0 => iri(s, p, "o")
            case 1 => bnode(s, p, "_:o")
            case _ => lit(s, p, "v", dts(rnd.nextInt(2)))
          }
        }
        typed ++ props
      }
      val shapes = Seq(
        Shape(classes(rnd.nextInt(2)), preds(rnd.nextInt(2)),
          minCount = rnd.nextInt(2), maxCount = rnd.nextInt(3),
          nodeKind = if (rnd.nextBoolean()) Some(rnd.nextInt(3)) else None,
          datatype = if (rnd.nextBoolean()) Some(dts(rnd.nextInt(2))) else None))
      // brute force
      val typeOf = rows.filter(r => r.pred == RdfType && r.objKind == 0)
        .map(r => (r.subj, r.objValue)).distinct
      val expected = (for {
        (focus, cls) <- typeOf
        sh <- shapes if sh.targetClass == cls
        vals = rows.filter(r => r.subj == focus && r.pred == sh.pred)
        code <- Seq(
          if (vals.size < sh.minCount) Some("minCount") else None,
          if (vals.size > sh.maxCount) Some("maxCount") else None,
          if (sh.nodeKind.exists(k => vals.exists(_.objKind != k))) Some("nodeKind") else None,
          if (sh.datatype.exists(d => vals.exists(v =>
            v.objDatatype == null || v.objDatatype != d))) Some("datatype") else None
        ).flatten
      } yield (focus, cls, sh.pred, code)).toSet
      assert(violations(df(rows), shapes) == expected, s"trial $trial mismatch")
    }
  }

  test("corpus catalog: events lack endDate, orgs break member bounds, ratings are not integers") {
    val triples = TripleEmit.pipeline(PageGen.pages(spark, 120, 42L, partitions = 4)).toDF()
    val got = validate(triples, CorpusShapes)
      .groupBy("cls", "pred", "code").count()
      .collect().map(r => (r.getAs[String]("cls").stripPrefix("http://schema.org/"),
        r.getAs[String]("pred").stripPrefix("http://schema.org/"),
        r.getAs[String]("code")) -> r.getAs[Long]("count")).toMap
    import org.apache.spark.sql.functions._
    val nTyped = triples.filter(col("pred") === RdfType)
      .groupBy("objValue").count().collect()
      .map(r => r.getString(0).stripPrefix("http://schema.org/") -> r.getLong(1)).toMap
    // every typed Event violates endDate minCount; every Organization
    // violates member maxCount AND nodeKind; every Product's ratingValue
    // fails the integer-datatype shape; nothing else fires
    assert(got.keySet == Set(
      ("Event", "endDate", "minCount"),
      ("Organization", "member", "maxCount"),
      ("Organization", "member", "nodeKind"),
      ("Product", "ratingValue", "datatype")))
    assert(got(("Event", "endDate", "minCount")) == nTyped("Event"))
    assert(got(("Organization", "member", "maxCount")) == nTyped("Organization"))
    assert(got(("Product", "ratingValue", "datatype")) == nTyped("Product"))
  }
}
