package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Corpus-scale Turtle reader: distributed flatMap parse with quarantine,
  * and exact round-trip through the distributed writer. */
class TurtleIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("multi-doc corpus parses in one narrow pass; bad docs quarantine") {
    import spark.implicits._
    val docs = Seq(
      ("d1", "@prefix ex: <http://e/> .\nex:a ex:p ex:b .\nex:a ex:q \"v\" .\n"),
      ("d2", "<http://e/c> <http://e/p> \"x\"@en .\n<http://e/c> <http://e/n> _:b0 .\n_:b0 <http://e/q> \"y\" .\n"),
      ("d3", "this is not turtle at all {{{")
    ).toDS()
    val ts = TurtleIngest.triples(docs).collect()
    assert(ts.length == 5, s"got ${ts.toSeq}")
    // bnode labels are doc-key-prefixed (corpus-wide collision freedom)
    val bn = ts.filter(t => t.objKind == 1 || t.subj.startsWith("_:"))
    assert(bn.nonEmpty && bn.forall(t =>
      (if (t.objKind == 1) t.objValue else t.subj).startsWith("_:d")))
    val quarantined = TurtleIngest.quarantine(docs).collect()
    assert(quarantined.map(_.url).toSeq == Seq("d3"))
    assert(quarantined.head.errorCode == "turtle parse error")
  }

  test("writer/reader round-trip is exact on the corpus' bnode-free slice") {
    import spark.implicits._
    val triples = TripleEmit.pipeline(PageGen.pages(spark, 200, 42L, partitions = 4))
    val base = triples.toDF()
      .filter(col("graph") === "@default" && col("objKind") =!= 1 &&
        substring(col("subj"), 1, 2) =!= "_:")
    val expected = base.as[Triple].collect()
      .map(t => (t.subj, t.pred, t.objKind, t.objValue,
        Option(t.objDatatype).getOrElse(""), Option(t.objLang).getOrElse(""))).toSet
    val roundTripped = TurtleIngest.triples(TurtleIngest.serializeDocs(base, buckets = 8))
      .collect()
      .map(t => (t.subj, t.pred, t.objKind, t.objValue,
        Option(t.objDatatype).getOrElse(""), Option(t.objLang).getOrElse(""))).toSet
    assert(expected.nonEmpty)
    assert(roundTripped == expected,
      s"missing=${(expected diff roundTripped).take(3)} extra=${(roundTripped diff expected).take(3)}")
  }
}
