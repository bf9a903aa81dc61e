package graft.jsonld

/** Remote-document loading (SURVEY.md §2.1 S1), ported from the reference:
  *
  *  - loader algorithm: /root/reference/src/json-ld.net/Core/DocumentLoader.cs:49-113
  *    (status gate, content-type classification, Link-header context
  *    discovery for plain JSON, error taxonomy)
  *  - redirect following: /root/reference/src/json-ld.net/Util/LDHttpClient.cs:23-48
  *    (manual loop, Location taken verbatim, max 20 redirects)
  *  - document carrier: /root/reference/src/json-ld.net/Core/RemoteDocument.cs
  *
  * The TRANSPORT is a seam ([[HttpTransport]]): the W3C remote-doc
  * conformance manifest drives the full algorithm through a fixture
  * transport (W3CConformanceSpec), and [[JdkHttpTransport]] is the
  * production implementation over `java.net.http` — never constructed by
  * the library itself (this build stays zero-egress; CI drives it against
  * a loopback fixture only, JdkHttpTransportSpec). On a
  * Spark pipeline the loader runs inside the per-document flatMap only
  * when a context cache misses; crawl workloads should keep the offline
  * [[ContextCache]] in front of it.
  */
final class RemoteDocument(var documentUrl: String, var document: JV,
                           var contextUrl: String = null, var context: JV = null)

/** One HTTP exchange as the loader consumes it — status, Location (for
  * 3xx), Content-Type media type, raw Link header values, body. Redirect
  * following is NOT the transport's job (LDHttpClient.cs follows
  * manually; the loader replicates that). */
final case class RawResponse(status: Int, location: Option[String],
                             contentType: String, linkHeaders: Seq[String],
                             body: Option[String])

trait HttpTransport {
  def get(url: String): RawResponse
}

object DocumentLoader {
  /** LDHttpClient.cs:14. */
  val MaxRedirects = 20

  private val ContextRel = "rel=\"http://www.w3.org/ns/json-ld#context\""

  private sealed trait CType
  private case object JsonLD extends CType
  private case object PlainJson extends CType
  private case object Other extends CType

  /** GetJsonLDContentType (DocumentLoader.cs:25-45): exact ld+json is
    * JSON-LD; application/json and any "+json" subtype suffix (RFC 6839)
    * are plain JSON; everything else refuses to load. */
  private def classify(ct: String): CType = ct match {
    case "application/ld+json"                  => JsonLD
    case "application/json"                     => PlainJson
    case t if t != null && t.endsWith("+json")  => PlainJson
    case _                                      => Other
  }
}

final class DocumentLoader(transport: HttpTransport) {
  import DocumentLoader._

  /** LDHttpClient.FetchAsync (LDHttpClient.cs:23-48): follow 3xx
    * Location chains manually, up to [[DocumentLoader.MaxRedirects]];
    * the final requested URL becomes the document URL. */
  private def fetch(url: String): (RawResponse, String) = {
    var redirects = 0
    var cur = url
    var resp = transport.get(cur)
    while (redirects < MaxRedirects && resp.status >= 300 && resp.status < 400) {
      cur = resp.location.getOrElse(
        throw new IllegalStateException(s"redirect without Location from $cur"))
      resp = transport.get(cur)
      redirects += 1
    }
    // Preserved reference quirk (LDHttpClient.cs:44-47): the budget check
    // tests the redirect COUNTER, not whether the final response is still
    // a redirect, so a chain that consumes the whole budget throws even
    // when it ends in a success (the reference's post-incremented counter
    // does the same one hop earlier).
    if (redirects >= MaxRedirects)
      throw new IllegalStateException(s"too many redirects: $url")
    (resp, cur)
  }

  /** DocumentLoader.LoadDocumentAsync (DocumentLoader.cs:55-113). Every
    * non-JsonLdError failure — transport, parse, missing Location, the
    * reference's own `.First()` on an empty context-link filter (a
    * plain-JSON response whose only Link headers are unrelated) — rewraps
    * as `loading document failed`, exactly like the reference's catch-all. */
  def loadDocument(url: String): RemoteDocument = {
    val doc = new RemoteDocument(url, null)
    try {
      val (resp, finalUrl) = fetch(url)
      if (resp.status >= 400)
        throw new JsonLdError(JsonLdError.LoadingDocumentFailed, s"HTTP ${resp.status} $url")
      val ctype = classify(resp.contentType)
      if (ctype == Other)
        throw new JsonLdError(JsonLdError.LoadingDocumentFailed, url)
      if (ctype == PlainJson && resp.linkHeaders.nonEmpty) {
        val headers = resp.linkHeaders.flatMap(_.split(',')).map(_.trim)
        val linked = headers.filter(_.endsWith(ContextRel))
        if (linked.size > 1)
          throw new JsonLdError(JsonLdError.MultipleContextLinkHeaders)
        // reference quirk (DocumentLoader.cs:89): .First() on an empty
        // filter throws, rewrapped below as loading-document-failed
        val header = linked.headOption.getOrElse(
          throw new IllegalStateException("Link present but no context rel"))
        val linkedUrl = header.substring(1, header.indexOf(">"))
        val resolved = UrlUtil.resolve(finalUrl, linkedUrl)
        val remoteContext = loadDocument(resolved)
        doc.contextUrl = remoteContext.documentUrl
        doc.context = remoteContext.document
      }
      doc.documentUrl = finalUrl
      doc.document = Json.parse(resp.body.getOrElse(
        throw new IllegalStateException(s"no body from $url")))
      doc
    } catch {
      case e: JsonLdError => throw e
      case e: Exception =>
        // keep the root cause on the chain like the reference's
        // innerException (DocumentLoader.cs:109-112) — a production
        // caller must be able to tell a TLS failure from a parse failure
        val err = new JsonLdError(JsonLdError.LoadingDocumentFailed, url)
        err.initCause(e)
        throw err
    }
  }
}
