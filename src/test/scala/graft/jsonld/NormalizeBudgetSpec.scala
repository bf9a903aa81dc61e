package graft.jsonld

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{ExtractedDoc, TripleEmit}

/** The normalization blow-up guard (SURVEY.md §4.3, §7.4 risk 3; VERDICT
  * r3 #2): the reference's permutation search
  * (Core/NormalizeUtils.cs:242-458) is exponential on symmetric blank-node
  * cliques — a crawl document shaped like one would wedge an executor task
  * for hours. The guard counts SJT steps and raises a coded JsonLdError
  * past JsonLdOptions.normalizeBudget, which the pipeline's quarantine
  * routing catches per document. */
class NormalizeBudgetSpec extends AnyFunSuite {

  /** A K_n blank-node clique: n bnodes, each "knows" all the others —
    * every node's quad neighborhood is identical, so first-round hashes
    * all collide and the duplicate-group path search permutes the full
    * clique. */
  private def cliqueDoc(n: Int): String = {
    val nodes = (0 until n).map { i =>
      val others = (0 until n).filter(_ != i)
        .map(j => "\"_:b" + j + "\"").mkString("[", ",", "]")
      s"""{"@id":"_:b$i","knows":$others}"""
    }.mkString("[", ",", "]")
    s"""{"@context":{"knows":{"@id":"http://x/knows","@type":"@id"}},"@graph":$nodes}"""
  }

  test("symmetric bnode clique exceeds the budget with a coded error") {
    val opts = JsonLdOptions(base = "http://t/")
    opts.normalizeBudget = 5000L
    opts.format = "application/nquads"
    val err = intercept[JsonLdError] {
      JsonLdProcessor.normalize(Json.parse(cliqueDoc(9)), opts)
    }
    assert(err.errorType == JsonLdError.NormalizeBudgetExceeded, err.getMessage)
  }

  test("asymmetric bnode chains still normalize under a tight budget") {
    // same size, no symmetry: distinct literals break the hash ties, so
    // no permutation search is needed at all
    val nodes = (0 until 9).map { i =>
      s"""{"@id":"_:b$i","http://x/n":"v$i","knows":["_:b${(i + 1) % 9}"]}"""
    }.mkString("[", ",", "]")
    val doc = s"""{"@context":{"knows":{"@id":"http://x/knows","@type":"@id"}},"@graph":$nodes}"""
    val opts = JsonLdOptions(base = "http://t/")
    opts.normalizeBudget = 5000L
    opts.format = "application/nquads"
    val out = JsonLdProcessor.normalize(Json.parse(doc), opts)
    assert(out.isLeft && out.left.exists(_.contains("_:c14n")))
  }

  test("the pipeline quarantines an over-budget document instead of hanging") {
    val doc = ExtractedDoc("https://evil.example/clique", 0, cliqueDoc(10), "jsonld")
    val res = TripleEmit.docToTriples(doc, normalizeBNodes = true, baseUri = null)
    res match {
      case Left(q) =>
        assert(q.errorCode == JsonLdError.NormalizeBudgetExceeded.text,
          s"unexpected quarantine code: ${q.errorCode} (${q.errorDetail})")
      case Right(ts) => fail(s"expected quarantine, got ${ts.size} triples")
    }
  }
}
