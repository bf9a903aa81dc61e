package graft.jsonld

import scala.collection.mutable.ArrayBuffer

/** node.js-style URL kernel.
  *
  * Behavioral port of /root/reference/src/json-ld.net/Util/URL.cs. The
  * reference's deliberately lax 13-group regex parser shapes which IRIs
  * are emitted (SURVEY.md §2.3 U10) — do NOT substitute java.net.URI for
  * the parse/removeBase paths. `resolve` mirrors the .NET `System.Uri`
  * flavored Resolve at Util/URL.cs:304-346.
  */
final class UrlRec {
  var href = ""
  var protocol = ""
  var host = ""
  var auth = ""
  var user = ""
  var password = ""
  var hostname = ""
  var port = ""
  var relative = ""
  var path = ""
  var directory = ""
  var file = ""
  var query = ""
  var hash = ""
  var pathname: String = null
  var normalizedPath: String = null
  var authority: String = null
}

object UrlUtil {
  private val parser = java.util.regex.Pattern.compile(
    "^(?:([^:\\/?#]+):)?(?:\\/\\/((?:(([^:@]*)(?::([^:@]*))?)?@)?([^:\\/?#]*)(?::(\\d*))?))?((((?:[^?#\\/]*\\/)*)([^?#]*))(?:\\?([^#]*))?(?:#(.*))?)")

  def parse(url: String): UrlRec = {
    val rval = new UrlRec
    rval.href = url
    val m = parser.matcher(url)
    if (m.find()) {
      def g(i: Int): String = { val v = m.group(i); if (v == null) "" else v }
      rval.protocol = g(1)
      rval.host = g(2)
      rval.auth = g(3)
      rval.user = g(4)
      rval.password = g(5)
      rval.hostname = g(6)
      rval.port = g(7)
      rval.relative = g(8)
      rval.path = g(9)
      rval.directory = g(10)
      rval.file = g(11)
      rval.query = g(12)
      rval.hash = g(13)
      // normalize to node.js API
      if (rval.host.nonEmpty && rval.path.isEmpty) rval.path = "/"
      rval.pathname = rval.path
      parseAuthority(rval)
      rval.normalizedPath = removeDotSegments(rval.pathname, rval.authority.nonEmpty)
      if (rval.query.nonEmpty) rval.path += "?" + rval.query
      if (rval.protocol.nonEmpty) rval.protocol += ":"
      if (rval.hash.nonEmpty) rval.hash = "#" + rval.hash
    }
    rval
  }

  private def parseAuthority(parsed: UrlRec): Unit = {
    if (!parsed.href.contains(":") && parsed.href.startsWith("//") && parsed.host.isEmpty) {
      parsed.pathname = parsed.pathname.substring(2)
      val idx = parsed.pathname.indexOf("/")
      if (idx == -1) { parsed.authority = parsed.pathname; parsed.pathname = "" }
      else {
        parsed.authority = parsed.pathname.substring(0, idx)
        parsed.pathname = parsed.pathname.substring(idx)
      }
    } else {
      parsed.authority = parsed.host
      if (parsed.auth.nonEmpty) parsed.authority = parsed.auth + "@" + parsed.authority
    }
  }

  /** RFC 3986 5.2.4 with the reference's javascript-split semantics
    * (Util/URL.cs:139-194). */
  def removeDotSegments(path: String, hasAuthority: Boolean): String = {
    var rval = if (path.startsWith("/")) "/" else ""
    val input = ArrayBuffer.from(jsSplit(path, '/'))
    val output = new ArrayBuffer[String]
    var i = 0
    while (i < input.length) {
      val seg = input(i)
      if (seg == "." || (seg.isEmpty && input.length - i > 1)) ()
      else if (seg == "..") {
        if (hasAuthority || (output.nonEmpty && output.last != "..")) {
          if (output.nonEmpty) output.remove(output.length - 1)
        } else output += ".."
      } else output += seg
      i += 1
    }
    if (output.nonEmpty) {
      rval += output.head
      output.drop(1).foreach(s => rval += "/" + s)
    }
    rval
  }

  /** javascript String.split keeps a trailing empty segment (Util/URL.cs:147-154). */
  private def jsSplit(s: String, delim: Char): Vector[String] = {
    val parts = Vector.from(s.split(delim.toString, -1)) // -1 keeps trailing empties like JS
    parts
  }

  /** Util/URL.cs:196-302 — base-relativization with ../ generation. */
  def removeBase(baseobj: String, iri: String): String = {
    if (baseobj == null) return iri
    val base = parse(baseobj)
    var root = ""
    if (base.href.nonEmpty) root += base.protocol + "//" + base.authority
    else if (!iri.startsWith("//")) root += "//"
    if (!iri.startsWith(root)) return iri
    val rel = parse(iri.substring(root.length))
    val baseSegments = ArrayBuffer.from(jsSplit(base.normalizedPath, '/').filter(_ != ""))
    if (base.normalizedPath.endsWith("/")) baseSegments += ""
    val iriSegments = ArrayBuffer.from(jsSplit(rel.normalizedPath, '/').filter(_ != ""))
    if (rel.normalizedPath.endsWith("/")) iriSegments += ""
    while (baseSegments.nonEmpty && iriSegments.nonEmpty && baseSegments.head == iriSegments.head) {
      baseSegments.remove(0)
      iriSegments.remove(0)
    }
    var rval = ""
    if (baseSegments.nonEmpty) {
      if (!base.normalizedPath.endsWith("/") || baseSegments.head.isEmpty)
        baseSegments.remove(baseSegments.length - 1)
      for (_ <- baseSegments.indices) rval += "../"
    }
    if (iriSegments.nonEmpty) {
      rval += iriSegments.head
      iriSegments.drop(1).foreach(s => rval += "/" + s)
    }
    if (rel.query.nonEmpty) rval += "?" + rel.query
    if (rel.hash.nonEmpty) rval += rel.hash
    if (rval.isEmpty) rval = "./"
    rval
  }

  /** Mirror of the .NET System.Uri based Resolve (Util/URL.cs:304-346):
    * resolve against base, strip unnecessary dot segments, rebuild as
    * scheme://authority + path + query + fragment. Falls back to the
    * unresolved path on any parse failure (as the reference's catch does). */
  def resolve(baseUri: String, pathToResolve: String): String = {
    if (baseUri == null) return pathToResolve
    if (pathToResolve == null || pathToResolve.trim.isEmpty) return baseUri
    try {
      var uri = new java.net.URI(baseUri)
      if (!uri.isAbsolute) return pathToResolve // .NET `new Uri(relative)` throws
      if (pathToResolve.startsWith("?")) {
        // drop fragment + query from base, append query manually
        val rebuilt = uri.getScheme + "://" + authorityOf(uri) + rawPathOf(uri)
        return rebuilt + pathToResolve
      }
      uri = uri.resolve(pathToResolve)
      var path = rawPathOf(uri)
      if (path != null) path = removeDotSegments(path, hasAuthority = true)
      val q = if (uri.getRawQuery != null) "?" + uri.getRawQuery else ""
      val f = if (uri.getRawFragment != null) "#" + uri.getRawFragment else ""
      schemeLower(uri) + "://" + authorityOf(uri) + path + q + f
    } catch {
      case _: Exception => pathToResolve
    }
  }

  private def schemeLower(uri: java.net.URI): String = {
    val s = uri.getScheme
    if (s == null) "" else s.toLowerCase(java.util.Locale.ROOT)
  }

  private def rawPathOf(uri: java.net.URI): String = {
    val p = uri.getRawPath
    if (p == null || p.isEmpty) {
      // non-hierarchical (urn:...) — .NET exposes the opaque part as path
      val ssp = uri.getRawSchemeSpecificPart
      if (ssp != null && uri.getRawAuthority == null) ssp else ""
    } else p
  }

  /** .NET Uri.Authority: lowercased host, default port dropped. */
  private def authorityOf(uri: java.net.URI): String = {
    val a = uri.getRawAuthority
    if (a == null) return ""
    val scheme = schemeLower(uri)
    val lower = a.toLowerCase(java.util.Locale.ROOT)
    if ((scheme == "http" && lower.endsWith(":80")) ) lower.dropRight(3)
    else if (scheme == "https" && lower.endsWith(":443")) lower.dropRight(4)
    else lower
  }
}
