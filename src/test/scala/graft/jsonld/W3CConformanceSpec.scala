package graft.jsonld

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, Path}

/** Port of the reference's manifest-driven conformance harness
  * (test/json-ld.net.tests/ConformanceTests.cs). Same comparison
  * semantics: DeepCompare (order-insensitive arrays + http:->https:
  * rewrite) for JSON outputs; newline-stripped string compare for
  * toRdf/normalize; error-message prefix match for negative tests.
  *
  * The remote-doc manifest — which the reference's own CI skips (it
  * fetches json-ld.org live) — runs HERE against a fixture transport
  * that simulates exactly the HTTP surface each case's manifest options
  * describe (contentType, httpLink, redirectTo/httpStatus, 404), driving
  * the REAL ported loader algorithm (graft.jsonld.DocumentLoader) end to
  * end with zero egress.
  */
object W3CHarness {
  val root: Path = {
    val candidates = Seq("src/test/resources/w3c", "/root/repo/src/test/resources/w3c")
    candidates.map(Paths.get(_)).find(Files.isDirectory(_)).get
  }

  def readFile(name: String): String =
    new String(Files.readAllBytes(root.resolve(name)), java.nio.charset.StandardCharsets.UTF_8)

  def readJson(name: String): JV = Json.parse(readFile(name))

  final case class Case(id: String, manifest: String, types: Set[String],
                        input: String, expect: String, context: String,
                        frame: String, option: JObj) {
    def isNegative: Boolean = types.contains("jld:NegativeEvaluationTest")
  }

  val manifests = Seq(
    "compact-manifest.jsonld", "expand-manifest.jsonld", "flatten-manifest.jsonld",
    "frame-manifest.jsonld", "toRdf-manifest.jsonld", "fromRdf-manifest.jsonld",
    "normalize-manifest.jsonld", "error-manifest.jsonld", "remote-doc-manifest.jsonld")

  private val TestSuitePrefix = "http://json-ld.org/test-suite/tests/"

  /** Simulated HTTP surface for one remote-doc case: the case's manifest
    * options apply to its INPUT url (content type override, Link headers,
    * redirect status+target); every other url under the suite prefix is
    * served from the fixture directory with its extension's media type;
    * missing files are 404 — the same behaviors json-ld.org's live suite
    * exhibits for these cases. */
  final class FixtureTransport(c: Case) extends HttpTransport {
    private def optStr(key: String): Option[String] =
      Option(c.option).flatMap(o => o(key) match { case JStr(s) => Some(s); case _ => None })
    private def ctypeByExt(name: String): String =
      if (name.endsWith(".jsonld")) "application/ld+json"
      else if (name.endsWith(".json")) "application/json"
      else "application/octet-stream"
    def get(url: String): RawResponse = {
      val name = url.stripPrefix(TestSuitePrefix)
      val isInput = name == c.input
      val redirectTo = if (isInput) optStr("redirectTo") else None
      redirectTo match {
        case Some(target) =>
          val status = Option(c.option).map(o => o("httpStatus") match {
            case JLong(v) => v.toInt
            case _        => 301
          }).getOrElse(301)
          RawResponse(status, Some(TestSuitePrefix + target), null, Nil, None)
        case None =>
          if (!Files.exists(root.resolve(name)))
            RawResponse(404, None, "text/html", Nil, None)
          else {
            val ctype = (if (isInput) optStr("contentType") else None)
              .getOrElse(ctypeByExt(name))
            val links: Seq[String] =
              if (!isInput) Nil
              else Option(c.option).map(o => o("httpLink") match {
                case JStr(s)  => Seq(s)
                case a: JArr  => a.items.map(JsonLdUtils.asString).toSeq
                case _        => Nil
              }).getOrElse(Nil)
            RawResponse(200, None, ctype, links, Some(readFile(name)))
          }
      }
    }
  }

  def cases: Seq[Case] = manifests.flatMap { manifest =>
    val mj = readJson(manifest).asInstanceOf[JObj]
    mj("sequence").asInstanceOf[JArr].items.map { tc0 =>
      val tc = tc0.asInstanceOf[JObj]
      def s(k: String): String = JsonLdUtils.asString(tc(k))
      val types = tc("@type").asInstanceOf[JArr].items.map(JsonLdUtils.asString).toSet
      Case(s("@id"), manifest, types, s("input"), s("expect"), s("context"), s("frame"),
        tc("option") match { case o: JObj => o; case _ => null })
    }
  }

  /** Runs one case; returns (passed, detail). */
  def run(c: Case): (Boolean, String) = {
    val options = JsonLdOptions(base = "http://json-ld.org/test-suite/tests/" + c.input)
    // fixture-backed "remote" loader: the test suite serves the W3C dir at
    // this URL prefix (same contract the reference's live harness relies on)
    options.documentLoader = { url =>
      val prefix = "http://json-ld.org/test-suite/tests/"
      if (url.startsWith(prefix) && Files.exists(root.resolve(url.stripPrefix(prefix))))
        readJson(url.stripPrefix(prefix))
      else throw new JsonLdError(JsonLdError.LoadingDocumentFailed, url)
    }
    var contextTok: JV = if (c.context != null) readJson(c.context) else null
    val frameTok: JV = if (c.frame != null) readJson(c.frame) else null
    if (c.option != null) {
      val o = c.option
      o("compactArrays") match { case JBool(b) => options.compactArrays = b; case _ => () }
      o("base") match { case JStr(b) => options.base = b; case _ => () }
      if (o.containsKey("expandContext")) {
        contextTok = readJson(JsonLdUtils.asString(o("expandContext")))
        options.expandContext = contextTok
      }
      o("produceGeneralizedRdf") match { case JBool(b) => options.produceGeneralizedRdf = b; case _ => () }
      o("useNativeTypes") match { case JBool(b) => options.useNativeTypes = b; case _ => () }
      o("useRdfType") match { case JBool(b) => options.useRdfType = b; case _ => () }
    }

    def runPositive(): JV = {
      if (c.manifest == "remote-doc-manifest.jsonld") {
        // the reference harness' remote wrapper (ConformanceTests.cs:197-208):
        // load through the document loader, then base = final document url,
        // expand context = the Link-header-discovered context document
        val loader = new DocumentLoader(new FixtureTransport(c))
        val rd = loader.loadDocument(TestSuitePrefix + c.input)
        options.base = rd.documentUrl
        options.expandContext = rd.context
        JsonLdProcessor.expand(rd.document, options)
      } else if (c.types.contains("jld:CompactTest"))
        JsonLdProcessor.compact(readJson(c.input), contextTok, options)
      else if (c.types.contains("jld:ExpandTest"))
        JsonLdProcessor.expand(readJson(c.input), options)
      else if (c.types.contains("jld:FlattenTest"))
        JsonLdProcessor.flatten(readJson(c.input), contextTok, options)
      else if (c.types.contains("jld:FrameTest"))
        JsonLdProcessor.frame(readJson(c.input), readJson(c.frame), options)
      else if (c.types.contains("jld:NormalizeTest")) {
        val ds = JsonLdProcessor.normalize(readJson(c.input), options) match {
          case Right(d) => d
          case Left(s)  => NQuads.parseNQuads(s)
        }
        JStr(NQuads.toNQuads(ds))
      } else if (c.types.contains("jld:ToRDFTest")) {
        options.format = "application/nquads"
        JStr(JsonLdProcessor.toRDF(readJson(c.input), options).swap.toOption.get)
      } else if (c.types.contains("jld:FromRDFTest")) {
        options.format = "application/nquads"
        JsonLdProcessor.fromRDF(JStr(readFile(c.input)), options)
      } else throw new RuntimeException("unknown test type: " + c.types)
    }

    if (c.isNegative) {
      try {
        runPositive()
        (false, "expected error '" + c.expect + "' but none was thrown")
      } catch {
        case e: JsonLdError =>
          val ok = e.getMessage.startsWith(c.expect)
          (ok, if (ok) "" else s"error '${e.getMessage}' !startsWith '${c.expect}'")
        case e: Throwable =>
          (false, s"non-JsonLdError ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    } else {
      try {
        val result = runPositive()
        val expected: JV =
          if (c.types.contains("jld:ToRDFTest") || c.types.contains("jld:NormalizeTest"))
            JStr(readFile(c.expect))
          else readJson(c.expect)
        val ok = JsonLdUtils.deepCompare(result, expected)
        (ok, if (ok) "" else s"mismatch:\nACTUAL: ${render(result)}\nEXPECT: ${render(expected)}")
      } catch {
        case e: Throwable => (false, s"threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }

  private def render(v: JV): String = v match {
    case JStr(s) => s.take(2000)
    case other   => Json.write(other).take(2000)
  }

  /** Cases the reference itself does not pass (environment-pinned quirks we
    * deliberately did not replicate, e.g. the broken escape kernel) or that
    * depend on .NET Uri minutiae. Kept explicit so the pass set is auditable.
    * See CONFORMANCE.md for per-case notes. */
  val knownFailures: Set[String] = KnownFailures.ids
}

class W3CConformanceSpec extends AnyFunSuite {
  import W3CHarness._

  private val all = cases

  test("conformance: all cases outside the known-failure list pass") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var passed = 0
    var knownFailed = 0
    all.foreach { c =>
      val key = c.manifest + c.id
      val (ok, detail) = W3CHarness.run(c)
      if (ok) {
        passed += 1
        if (knownFailures.contains(key))
          info(s"UNEXPECTED PASS (remove from known failures): $key")
      } else if (knownFailures.contains(key)) knownFailed += 1
      else failures += s"$key: $detail"
    }
    info(s"passed=$passed knownFailed=$knownFailed unexpected=${failures.size} total=${all.size}")
    if (failures.nonEmpty) {
      fail(s"${failures.size} unexpected failures:\n" + failures.take(25).mkString("\n---\n"))
    }
  }
}
