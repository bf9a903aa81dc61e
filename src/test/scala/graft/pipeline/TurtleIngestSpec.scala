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

  test("bnode writer round-trip is isomorphic (inlining + collections exercised)") {
    import spark.implicits._
    val triples = TripleEmit.pipeline(PageGen.pages(spark, 200, 42L, partitions = 4))
    val slice = triples.toDF()
      .filter(col("graph") === "@default" &&
        (substring(col("subj"), 1, 2) === "_:" || col("objKind") === 1))
    val docs = TurtleIngest.serializeDocsWithBnodes(slice, buckets = 8).collect()
    // the reference serializer's distinctive paths must actually fire
    assert(docs.exists(_._2.contains("[ ")), "no inlined bnode [...] emitted")
    assert(docs.exists(_._2.contains("( ")), "no rdf:List collection (...) emitted")
    val reparsed = TurtleIngest.triples(spark.createDataset(docs.toIndexedSeq)).collect()
    val original = slice.as[Triple].collect()
    assert(reparsed.length == original.length,
      s"triple count changed: ${original.length} -> ${reparsed.length}")

    // structural isomorphism: canonicalize both sides' bnode labels with
    // the engine's own normalization — isomorphic graphs normalize to
    // byte-identical N-Quads (labels are fresh per side, so only an
    // isomorphism-preserving writer passes this)
    def canonical(ts: Array[Triple]): String = {
      val ds = new graft.jsonld.RdfDataset
      ts.foreach { t =>
        if (t.objKind == 2)
          ds.addTriple(t.subj, t.pred, t.objValue,
            Option(t.objDatatype).getOrElse(
              "http://www.w3.org/2001/XMLSchema#string"), t.objLang)
        else ds.addTriple(t.subj, t.pred, t.objValue)
      }
      val opts = graft.jsonld.JsonLdOptions(base = "")
      opts.format = "application/nquads"
      new graft.jsonld.JsonLdApi(opts).normalize(ds) match {
        case Left(nq) => nq
        case Right(_) => fail("expected nquads string")
      }
    }
    assert(canonical(original) == canonical(reparsed),
      "round-trip changed graph structure (normalized forms differ)")
  }
}
