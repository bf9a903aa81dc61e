package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.jsonld.{NQuads, Turtle}

/** Corpus-scale Turtle ingestion (SURVEY.md §2 S4's corpus mapping; round-2
  * verdict #7): the same `Dataset[doc] -> flatMap(parse) -> Dataset[Triple]`
  * spine as the N-Quads/JSON-LD paths, with per-document quarantine and
  * doc-keyed blank-node prefixing so a corpus-wide union never collides
  * (reference parser: /root/reference/src/json-ld.net/Core/RDFDatasetUtils.cs
  * and the Turtle grammar in Core/Regex.cs — re-expressed in
  * graft/jsonld/Turtle.scala).
  *
  * Scale shape: parsing is one narrow flatMap (no shuffle); a document is
  * decoded from Tungsten exactly once; bad documents become quarantine
  * rows, never task failures.
  */
object TurtleIngest {

  /** One Turtle document → triples (Left = quarantine). Bnode labels are
    * prefixed with the doc key exactly like the JSON-LD path
    * (TripleEmit.docKey) so labels are reproducible and collision-free
    * across the corpus. */
  def docToTriples(docId: String, turtle: String): Either[QuarantineRow, Vector[Triple]] = {
    try {
      val ds = Turtle.parse(turtle)
      val key = TripleEmit.docKey(docId, 0)
      def pfx(v: String): String = TripleEmit.prefixBnode(v, key)
      val out = Vector.newBuilder[Triple]
      ds.getQuads("@default").foreach { q =>
        val okind: Byte =
          if (q.obj.isIRI) 0 else if (q.obj.isBlankNode) 1 else 2
        out += Triple(
          subj = pfx(q.subject.value),
          pred = q.predicate.value,
          objKind = okind,
          objValue = if (okind == 1) pfx(q.obj.value) else q.obj.value,
          objDatatype = if (okind == 2) q.obj.datatype else null,
          objLang = if (okind == 2) q.obj.language else null,
          graph = "@default")
      }
      Right(out.result())
    } catch {
      case e: Exception =>
        Left(QuarantineRow(docId, 0, "turtle parse error",
          s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  /** The distributed spine: (doc_id, turtle) corpus → triples. */
  def triples(docs: Dataset[(String, String)]): Dataset[Triple] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (id, ttl) =>
      docToTriples(id, ttl) match {
        case Right(ts) => ts
        case Left(_)   => Vector.empty[Triple]
      }
    }
  }

  def quarantine(docs: Dataset[(String, String)]): Dataset[QuarantineRow] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (id, ttl) =>
      docToTriples(id, ttl) match {
        case Left(q) => Some(q)
        case _       => None
      }
    }
  }

  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  private val RdfLangString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
  private val SchemaOrg = "http://schema.org/"
  private val PnLocal = "^[A-Za-z][A-Za-z0-9]*$".r

  /** Distributed Turtle corpus WRITER for bnode-free triples: buckets the
    * triples by subject hash into `buckets` documents, each a valid Turtle
    * doc with a schema.org @prefix (so re-parsing exercises prefixed-name
    * resolution, not just IRI lines). Round-trips exactly through
    * [[triples]]: literal lexical forms are quoted verbatim (no numeric
    * shorthand), plain strings omit ^^xsd:string, language literals use
    * @lang — matching the parser's datatype conventions. */
  def serializeDocs(bnodeFreeTriples: DataFrame, buckets: Int = 32): Dataset[(String, String)] = {
    import bnodeFreeTriples.sparkSession.implicits._
    bnodeFreeTriples
      .withColumn("bucket", pmod(xxhash64(col("subj")), lit(buckets)))
      .select(col("bucket"), col("subj"), col("pred"), col("objKind"),
        col("objValue"), col("objDatatype"), col("objLang"))
      .as[(Long, String, String, Byte, String, String, String)]
      .groupByKey(_._1)
      .mapGroups { (bucket, rows) =>
        val sb = new StringBuilder
        sb.append("@prefix s: <").append(SchemaOrg).append("> .\n\n")
        def term(iri: String): String =
          if (iri.startsWith(SchemaOrg) && PnLocal.matches(iri.substring(SchemaOrg.length)))
            "s:" + iri.substring(SchemaOrg.length)
          else "<" + iri + ">"
        rows.foreach { case (_, subj, pred, okind, ov, dt, lg) =>
          sb.append(term(subj)).append(' ').append(term(pred)).append(' ')
          if (okind == 0) sb.append(term(ov))
          else {
            sb.append('"').append(NQuads.escape(ov)).append('"')
            if (lg != null && lg.nonEmpty) sb.append('@').append(lg)
            else if (dt != null && dt.nonEmpty && dt != XsdString && dt != RdfLangString)
              sb.append("^^<").append(dt).append('>')
          }
          sb.append(" .\n")
        }
        (s"ttl-bucket-$bucket", sb.toString)
      }
  }
}
