package graft.jsonld

/** Manual drive of the public API surface (not a test): expand → toRDF →
  * normalize on a realistic schema.org-style document, plus edge probes. */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val doc = Json.parse("""
      {
        "@context": {
          "name": "http://schema.org/name",
          "author": {"@id": "http://schema.org/author", "@type": "@id"},
          "rating": "http://schema.org/ratingValue",
          "tags": {"@id": "http://schema.org/keywords", "@container": "@list"}
        },
        "@id": "https://shop.example/product/42",
        "@type": "http://schema.org/Product",
        "name": "Kaffeemühle",
        "rating": 4.5,
        "author": "https://people.example/alice",
        "tags": ["kitchen", "coffee"]
      }""")

    println("=== toRDF (N-Quads) ===")
    val opts = JsonLdOptions(base = "https://shop.example/product/42")
    opts.format = "application/nquads"
    println(JsonLdProcessor.toRDF(doc, opts).swap.toOption.get)

    println("=== normalize (bnode doc) ===")
    val bdoc = Json.parse("""
      {"@context": {"knows": {"@id": "http://xmlns.com/foaf/0.1/knows", "@type": "@id"}},
       "@graph": [
         {"@id": "_:a", "knows": "_:b"},
         {"@id": "_:b", "knows": "_:a"}
       ]}""")
    val nopts = JsonLdOptions(base = "")
    nopts.format = "application/nquads"
    JsonLdProcessor.normalize(bdoc, nopts) match {
      case Left(s)   => println(s)
      case Right(ds) => println(NQuads.toNQuads(ds))
    }

    println("=== probe: relative @id triple dropped ===")
    val rel = Json.parse("""{"@id": "not-absolute-after-empty-base", "http://schema.org/name": "x"}""")
    val ropts = JsonLdOptions(base = "")
    ropts.format = "application/nquads"
    println("[" + JsonLdProcessor.toRDF(rel, ropts).swap.toOption.get + "]")

    println("=== probe: list of lists error ===")
    try {
      val bad = Json.parse("""{"@context": {"t": {"@id": "http://e/t", "@container": "@list"}}, "t": [["x"]]}""")
      JsonLdProcessor.expand(bad, JsonLdOptions(base = ""))
      println("NO ERROR (bad)")
    } catch { case e: JsonLdError => println("JsonLdError: " + e.getMessage) }

    println("=== probe: remote context without loader ===")
    try {
      val r = Json.parse("""{"@context": "https://nonexistent.example/ctx.jsonld", "http://e/p": 1}""")
      JsonLdProcessor.expand(r, JsonLdOptions(base = ""))
      println("NO ERROR (bad)")
    } catch { case e: JsonLdError => println("JsonLdError: " + e.getMessage) }

    println("=== probe: double + integer canonical forms ===")
    val nums = Json.parse("""{"@id": "http://e/n", "http://e/d": [1.1, {"@value": 30, "@type": "http://www.w3.org/2001/XMLSchema#double"}, 7]}""")
    val numOpts = JsonLdOptions(base = "")
    numOpts.format = "application/nquads"
    println(JsonLdProcessor.toRDF(nums, numOpts).swap.toOption.get)
  }
}
