package graft.jsonld

/** Bundled remote-context cache — the zero-egress production stand-in for
  * the reference's HTTP DocumentLoader (SURVEY.md §2.1 S1;
  * /root/reference/src/json-ld.net/Core/DocumentLoader.cs:49-113). The
  * well-known context documents a web corpus actually references
  * (schema.org, activitystreams, ...) are a handful of small JSON files:
  * ship them as a `Map[url -> raw JSON]`, broadcast it (the map rides the
  * task closure; on a real cluster wrap it in `sparkContext.broadcast`),
  * and every remote `@context` resolves locally with zero I/O. URLs
  * outside the bundle fail exactly like a network error and quarantine
  * the document rather than the job.
  */
object ContextCache {

  /** A documentLoader backed by a url -> raw-JSON map. The text is parsed
    * per call: context processing may retain references into the parsed
    * tree, and the mutable JSON nodes must not be shared across documents
    * processed by different tasks. */
  def loader(cache: Map[String, String]): String => JV = { url =>
    cache.get(url) match {
      case Some(text) =>
        try Json.parse(text)
        catch {
          case _: Exception =>
            throw new JsonLdError(JsonLdError.LoadingDocumentFailed, url)
        }
      case None =>
        throw new JsonLdError(JsonLdError.LoadingDocumentFailed, url)
    }
  }
}
