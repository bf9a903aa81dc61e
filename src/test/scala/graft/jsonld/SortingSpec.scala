package graft.jsonld

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Port of the reference's vendor-specific fromRdf output-sorting matrix
  * (test/json-ld.net.tests/ExtendedFunctionalityTests.cs:15-141):
  * sortGraphsFromRdf × sortGraphNodesFromRdf against golden outputs,
  * order-SENSITIVE DeepCompare. */
class SortingSpec extends AnyFunSuite {
  private val root = {
    val c = Seq("src/test/resources/sorting", "/root/repo/src/test/resources/sorting")
    c.map(Paths.get(_)).find(Files.isDirectory(_)).get
  }
  private def readJson(name: String): JV =
    Json.parse(new String(Files.readAllBytes(root.resolve(name)),
      java.nio.charset.StandardCharsets.UTF_8))

  private def buildDataset(input: JV): RdfDataset = {
    val rdf = new RdfDataset
    val quads = input.asInstanceOf[JObj]("quads").asInstanceOf[JArr]
    quads.items.foreach { q =>
      val o = q.asInstanceOf[JObj]
      def s(k: String) = JsonLdUtils.asString(o(k))
      // AddQuad(s, p, value, graph) — the o is an IRI/bnode string
      val objNode: RdfNode =
        if (s("value").startsWith("_:")) new RdfBlank(s("value")) else new RdfIri(s("value"))
      rdf.addQuad(s("subject"), s("predicate"), objNode, s("graph"))
    }
    rdf
  }

  test("fromRdf sorting option matrix matches golden outputs (order-sensitive)") {
    val manifest = readJson("fromRdf-manifest.jsonld").asInstanceOf[JObj]
    val input = readJson(JsonLdUtils.asString(manifest("input")))
    manifest("sequence").asInstanceOf[JArr].items.foreach { tc0 =>
      val tc = tc0.asInstanceOf[JObj]
      val id = JsonLdUtils.asString(tc("@id"))
      val expect = readJson(JsonLdUtils.asString(tc("expect")))
      val options = JsonLdOptions(base = "")
      JsonLdUtils.asString(tc("sort-type")) match {
        case "jld:GraphsAndNodes" => options.sortGraphsFromRdf = true; options.sortGraphNodesFromRdf = true
        case "jld:Graphs"         => options.sortGraphsFromRdf = true; options.sortGraphNodesFromRdf = false
        case "jld:Nodes"          => options.sortGraphsFromRdf = false; options.sortGraphNodesFromRdf = true
        case "jld:None"           => options.sortGraphsFromRdf = false; options.sortGraphNodesFromRdf = false
        case other                => fail(s"unknown sort-type $other")
      }
      val result = new JsonLdApi(options).fromRDF(buildDataset(input))
      assert(JsonLdUtils.deepCompare(result, expect, listOrderMatters = true),
        s"$id mismatch:\n${Json.write(result)}\nvs\n${Json.write(expect)}")
    }
  }
}
